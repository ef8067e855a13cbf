"""Interleaved A/B: old window-argmin + SMJ-update kmeans vs the new
row-local argmin + broadcast-update form (VERDICT r03 #4). Interleave the
two configs per CLAUDE.md bursty-host protocol; report MEDIAN-of-N walls
and the ratio. Run on the idle host."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from html_parser_spark.functions import clustering as C
from html_parser_spark.functions.dedup import _unpersist_with
from html_parser_spark.session import apply_scale_confs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session():
    from pyspark.sql import SparkSession

    spark = (
        apply_scale_confs(
            SparkSession.builder.master("local[32]")
            .appName("ab-kmeans")
            .config("spark.sql.shuffle.partitions", "32")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _assign_old(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    pairs = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "dist", F.expr(C.SQDIST.format(a="codes", b="cent"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select("vec_id", "codes", "cid", "dist")
    )


def _update_old(assigned: DataFrame, seeds: DataFrame, dim: int) -> DataFrame:
    sums = assigned.groupBy("cid").agg(
        F.count("*").alias("n"),
        *[F.sum(F.element_at("codes", d + 1)).alias(f"s{d}") for d in range(dim)],
    )
    new_cent = sums.select(
        "cid",
        F.array(
            *[F.col(f"s{d}") / F.col("n").cast("double") for d in range(dim)]
        ).alias("new_cent"),
    )
    return seeds.join(new_cent, on="cid", how="left").select(
        "cid", F.coalesce("new_cent", "cent").alias("cent")
    )


def kmeans_old(embs: DataFrame, k=8, n_iter=2, dim=64) -> DataFrame:
    vecs = C.quantized_vectors(embs).persist()
    cents = vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("codes").alias("cent")
    )
    for _ in range(n_iter):
        assigned = _assign_old(vecs, cents)
        cents = _update_old(assigned, cents, dim)
    final = _assign_old(vecs, cents)
    return _unpersist_with(
        final.select("vec_id", F.col("cid").alias("cluster"), "dist"), vecs
    )


def main():
    spark = get_session()
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    variants = {"old": kmeans_old, "new": C.kmeans_assign}

    # hash both outputs once to pin identical results
    sigs = {}
    for name, fn in variants.items():
        rows = sorted(fn(embs).collect())
        sigs[name] = hash(tuple((r[0], r[1], repr(r[2])) for r in rows))
    assert sigs["old"] == sigs["new"], f"output mismatch: {sigs}"
    print(f"outputs identical ({len(rows)} rows)")

    walls: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(2):  # warm-up both
        for fn in variants.values():
            fn(embs).count()
    for rep in range(5):  # interleaved
        for name, fn in variants.items():
            t0 = time.monotonic()
            fn(embs).count()
            walls[name].append(time.monotonic() - t0)
    med = {k: statistics.median(v) for k, v in walls.items()}
    print({k: [round(x, 3) for x in v] for k, v in walls.items()})
    print(
        f"median old={med['old']:.3f}s new={med['new']:.3f}s "
        f"speedup={med['old'] / med['new']:.2f}x "
        f"improvement={(1 - med['new'] / med['old']) * 100:.1f}%"
    )


if __name__ == "__main__":
    main()

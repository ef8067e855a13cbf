"""Interleaved A/B: old bloom decontaminate shape (posexplode probe +
separate exact semi-join branch + double join-back) vs the new single-pass
row-local form (VERDICT r03 #4). Median-of-N walls per CLAUDE.md."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import __spark_entry__ as E
from html_parser_spark.functions import dedup as DD
from html_parser_spark.functions import sketch as SK
from html_parser_spark.session import apply_scale_confs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bloom_probe_old(df: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    positions = (
        f"posexplode(transform(sequence(0, {SK.BLOOM_K - 1}), "
        f"i -> {SK._bloom_pos(key_col, 'i')})) as (hrow, pos)"
    )
    p = df.selectExpr(*df.columns, positions).selectExpr(
        *df.columns,
        f"cast(pos div {SK.BLOOM_BITS} as int) as word_idx",
        f"pos % {SK.BLOOM_BITS} as bit",
    )
    joined = p.join(F.broadcast(bloom), on="word_idx", how="left")
    hit = (
        "case when bits is not null and (shiftright(bits, bit) % 2) != 0 "
        "then 1 else 0 end"
    )
    return (
        joined.selectExpr(*df.columns, f"{hit} as _h")
        .groupBy(*df.columns)
        .agg(
            F.expr(
                f"cast(case when sum(_h) = {SK.BLOOM_K} then 1 else 0 end as int)"
            ).alias("bloom_hit")
        )
    )


def q_old(spark, sf_dir):
    docs = E._docs(spark, sf_dir)
    tri = docs.selectExpr(
        "doc_id", f"explode(array_distinct({E._BLOOM_TRIGRAMS})) as g"
    ).persist()
    bench = tri.where("doc_id % 200 = 0").select("g").distinct()
    bloom = SK.bloom_build(bench, "g")
    probed = bloom_probe_old(tri, "g", bloom)
    per_doc = probed.groupBy("doc_id").agg(
        F.expr("cast(count(*) as int)").alias("n_shingles"),
        F.expr("cast(sum(bloom_hit) as int)").alias("n_bloom_hits"),
    )
    exact = (
        tri.join(bench, on="g", how="left_semi")
        .groupBy("doc_id")
        .agg(F.expr("cast(count(*) as int)").alias("n_exact"))
    )
    out = (
        docs.select("doc_id")
        .join(per_doc, on="doc_id", how="left")
        .join(exact, on="doc_id", how="left")
        .na.fill({"n_shingles": 0, "n_bloom_hits": 0, "n_exact": 0})
    )
    return DD._unpersist_with(out, tri)


def main():
    from pyspark.sql import SparkSession

    spark = (
        apply_scale_confs(
            SparkSession.builder.master("local[32]")
            .appName("ab-bloom")
            .config("spark.sql.shuffle.partitions", "32")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    q_new = E.queries()["sketch_bloom_decontaminate"]
    variants = {"old": lambda: q_old(spark, SF_DIR), "new": lambda: q_new(spark, SF_DIR)}

    sigs = {}
    for name, fn in variants.items():
        rows = sorted(map(tuple, fn().collect()))
        sigs[name] = hash(tuple(rows))
    assert sigs["old"] == sigs["new"], f"output mismatch: {sigs}"
    print(f"outputs identical ({len(rows)} rows)")

    walls = {k: [] for k in variants}
    for _ in range(2):
        for fn in variants.values():
            fn().count()
    for _ in range(5):
        for name, fn in variants.items():
            t0 = time.monotonic()
            fn().count()
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

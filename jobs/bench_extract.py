"""spark-submit benchmark payload: time one operator pass over an input
parquet, print one JSON line. Used by tools/scaling_bench.py at two
parallelism levels (the sandbox stand-in for N vs 4N executors).

--op selects the measured operator:
  extract  (default) extraction kernel over the interleaved table
  parse    full-tree parse_nodes over the wrap html (derived by a narrow
           JVM projection from the same interleaved table)
  minhash  MinHash+LSH near-dup pair pipeline over a documents-shaped
           (doc_id, text, source) table — the shuffle-heavy scaling case,
           vs the two shuffle-free kernels above
  spans    repeated-span mining (Lee et al. sub-doc dedup) over the same
           documents-shaped table — the window-heavy 2-exchange class the
           events analytics queries share
  importance  DSIR-shaped importance resampling over the same table — the
           two-pass class (one map-side-combinable count shuffle, then a
           row-local broadcast-map scoring pass + TakeOrdered)

A warm-up pass runs first (JVM JIT + Python worker pool spin-up), then the
measured passes. Partitioning is pinned (--partitions, extract only) so both
cluster sizes execute identical work units and only execution parallelism
varies — exactly the N vs 4N comparison the north_rule asks for.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--op",
        choices=("extract", "parse", "minhash", "spans", "importance"),
        default="extract",
    )
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from html_parser_spark.session import apply_scale_confs

    spark = apply_scale_confs(
        SparkSession.builder.appName(f"{args.op}-bench")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build_out():
        df = spark.read.parquet(args.input)
        if args.op == "extract":
            from html_parser_spark.operators.extract import extract_spans

            return extract_spans(df, salt_partitions=args.partitions or None)
        if args.op == "parse":
            from html_parser_spark.operators.parse import parse_nodes

            return parse_nodes(
                df.select("doc_id", F.expr("spans[0].text").alias("html"))
            )
        if args.op == "spans":
            from html_parser_spark.functions.dedup import repeated_spans

            return repeated_spans(df)
        if args.op == "importance":
            from html_parser_spark.functions.sampling import importance_resample

            # target = 2/7 of sources; the md5-soup texts give ~63 distinct
            # bigrams per doc, so the count pass dominates — the operator's
            # real cost profile
            return importance_resample(df, "source in ('s0', 's1')", top_k=10_000)
        from html_parser_spark.functions.dedup import minhash_lsh_pairs

        # scaling protocol opts into the eager auto verify-path (library
        # default is the lazy shuffle path — ADVICE r04)
        return minhash_lsh_pairs(df, broadcast_verify=None)

    def one_pass() -> float:
        # t0 BEFORE build: minhash's auto verify-path selection runs bounded
        # stats actions at plan-construction time that materialize the
        # candidate caches — timing only the final write would exclude the
        # candidate pipeline (the bulk of the LSH work) from the wall
        t0 = time.time()
        out = build_out()
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    n_docs = spark.read.parquet(args.input).count()
    one_pass(); one_pass()  # warm-up (JIT + worker pool + page cache)
    walls = [one_pass() for _ in range(args.trials)]
    wall = min(walls)  # min-of-N: the sandbox host has noisy neighbors
    print(
        json.dumps(
            {
                "op": args.op,
                "wall_sec": round(wall, 3),
                "walls": [round(w, 3) for w in walls],
                "n_docs": n_docs,
                "docs_per_sec": round(n_docs / wall, 1),
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

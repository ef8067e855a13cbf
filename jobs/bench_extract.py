"""spark-submit benchmark payload: time the extraction pass over an input
parquet, print one JSON line. Used by tools/scaling_bench.py at two
parallelism levels (the sandbox stand-in for N vs 4N executors).

A warm-up pass runs first (JVM JIT + Python worker pool spin-up), then the
measured pass. Partitioning is pinned (--partitions) so both cluster sizes
execute identical work units and only the execution parallelism varies —
exactly the N vs 4N comparison the north_rule asks for.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from html_parser_spark.operators.extract import extract_spans

    spark = SparkSession.builder.appName("extract-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def one_pass() -> float:
        df = spark.read.parquet(args.input)
        out = extract_spans(df, salt_partitions=args.partitions or None)
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    n_docs = spark.read.parquet(args.input).count()
    one_pass(); one_pass()  # warm-up (JIT + worker pool + page cache)
    walls = [one_pass() for _ in range(args.trials)]
    wall = min(walls)  # min-of-N: the sandbox host has noisy neighbors
    print(
        json.dumps(
            {
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

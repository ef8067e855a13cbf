"""spark-submit entry point for the extraction pipeline.

    spark-submit --master <cluster> --py-files engine.zip jobs/extract.py \
        --input  <parquet dir of (doc_id, spans[])>  \
        --output <dir: data/ + lineage/>             \
        [--n-groups 16] [--salt-partitions P | --salt-by bytes]
        [--mode strict|main] [--resume]

Build engine.zip with tools/make_pyfiles.sh (zips html_parser_spark/).
Without --input, a deterministic synthetic corpus is generated from
--synth-docs (pipeline demos / smoke tests).

The job is checkpointed (sources/checkpoint.py): re-running with the same
--output resumes from the last committed lineage group.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, spark=None) -> int:
    """CLI entry. Tests may inject an existing `spark` session — the job
    then neither builds nor stops one."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with (doc_id, spans[]) rows")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-groups", type=int, default=16)
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--salt-by", choices=["hash", "bytes"], default="hash",
                    help="bytes = size-weighted AQE rebalance (mega-doc isolation)")
    ap.add_argument("--mode", choices=["strict", "main"], default="strict")
    ap.add_argument("--synth-docs", type=int, default=10_000)
    ap.add_argument("--synth-seed", type=int, default=42)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from html_parser_spark.kernels.extract import ExtractOptions
    from html_parser_spark.operators.extract import INPUT_SCHEMA
    from html_parser_spark.sources.checkpoint import ExtractCheckpointJob
    from html_parser_spark.sources.fixtures import synth_docs

    from html_parser_spark.session import apply_scale_confs

    owns_session = spark is None
    if owns_session:
        spark = apply_scale_confs(
            SparkSession.builder.appName("html-parser-spark-extract")
        ).getOrCreate()
        spark.sparkContext.setLogLevel("WARN")

    if args.input:
        def factory():
            return spark.read.parquet(args.input)
    else:
        rows = [
            (d, [dict(kind=k, text=t, media_ref=m, offset=o) for k, t, m, o in sp])
            for d, sp in synth_docs(args.synth_docs, seed=args.synth_seed)
        ]

        def factory():
            return spark.createDataFrame(rows, schema=INPUT_SCHEMA)

    job = ExtractCheckpointJob(
        spark,
        args.output,
        n_groups=args.n_groups,
        options=ExtractOptions(mode=args.mode),
        salt_partitions=args.salt_partitions,
        salt_by=args.salt_by,
    )
    results = job.run(factory)
    summary = {
        "groups_total": args.n_groups,
        "groups_processed": sum(1 for r in results if not r.skipped),
        "groups_skipped": sum(1 for r in results if r.skipped),
        "doc_count": sum(r.doc_count for r in results),
        "span_count": sum(r.span_count for r in results),
        "error_count": sum(r.error_count for r in results),
        "divergent_count": sum(r.divergent_count for r in results),
        "wall_sec": round(sum(r.duration_sec for r in results), 3),
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

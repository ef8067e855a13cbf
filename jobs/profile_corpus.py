"""spark-submit entry point: corpus profiling in one pass of fixed-state
sketches.

    spark-submit --master <cluster> --py-files engine.zip jobs/profile_corpus.py \
        --docs <parquet dir of (doc_id, text, source)> \
        --output <dir>  [--group-col source]

Writes four parquet tables under --output:
  distinct/   HLL distinct-doc and distinct-fingerprint counts per group
              (functions/sketch.hll_distinct — O(256) state per group)
  terms/      Count-Min cells over word occurrences + top-20 probe
              estimates vs exact (countmin_cells/estimate)
  lengths/    histogram-quantile doc lengths per group
              (histogram_quantiles — additive $-bins, merge-able)
  quality/    per-group means of the quality scores (functions/text)

Every table is the product of map-side-combinable aggregation — the whole
profile is one scan of the corpus plus O(cells) shuffles, which is the
only shape that profiles 10^12 docs. Without --docs, a deterministic
synthetic corpus is generated (smoke tests / demos).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", help="parquet dir with (doc_id, text, source)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--group-col", default="source")
    ap.add_argument("--synth-docs", type=int, default=2_000)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from html_parser_spark.functions import sketch as SK
    from html_parser_spark.functions import text as TXT
    from html_parser_spark.session import apply_scale_confs

    spark = apply_scale_confs(
        SparkSession.builder.appName("html-parser-spark-profile")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        docs = spark.range(args.synth_docs).selectExpr(
            "id as doc_id",
            "array_join(transform(sequence(0, cast(id % 40 + 3 as int)), "
            "i -> substr(md5(concat(id, '-', i)), 1, 4)), ' ') as text",
            "concat('src', cast(id % 8 as string)) as source",
        )
    g = args.group_col

    distinct = SK.hll_distinct(
        docs, "cast(doc_id as string)", [g], with_exact=False
    )
    distinct.write.mode("overwrite").parquet(f"{args.output}/distinct")

    terms = docs.selectExpr(f"explode(split(text, ' ')) as term").where(
        "term <> ''"
    )
    cells = SK.countmin_cells(terms, "term", hex_chars=2)
    exact = terms.groupBy("term").agg(
        F.expr("cast(count(*) as bigint)").alias("exact")
    )
    probes = exact.orderBy(F.desc("exact"), "term").limit(20)
    SK.countmin_estimate(cells, probes, hex_chars=2).write.mode("overwrite").parquet(
        f"{args.output}/terms"
    )

    SK.histogram_quantiles(docs, "length(text)", [g]).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/lengths")

    TXT.quality(docs).groupBy().agg(
        F.count("*").alias("n_docs"),
        F.avg("n_words").alias("mean_words"),
    ).write.mode("overwrite").parquet(f"{args.output}/quality")

    summary = {
        "groups": distinct.count(),
        "probe_terms": 20,
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

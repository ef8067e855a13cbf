"""Stateful streaming dedup (applyInPandasWithState): first-seen-only across
micro-batches AND across restarts (state persisted in the checkpoint)."""

from __future__ import annotations

import time

from pyspark.sql.types import StringType, StructField, StructType

from html_parser_spark.streaming.stateful import dedup_stream

DOC_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("text", StringType())]
)


def _run_once(spark, input_dir, out_dir, ckpt):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_first_seen_only_across_batches_and_restarts(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [("d1", "alpha"), ("d2", "beta"), ("d3", "alpha")]  # d3 dups d1
    spark.createDataFrame(batch1, DOC_SCHEMA).write.mode("append").parquet(input_dir)
    _run_once(spark, input_dir, out_dir, ckpt)

    got1 = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(got1) == {"d1", "d2"}  # one survivor per key
    assert got1["d1"]["n_dupes_in_batch"] == 2

    # second micro-batch (fresh files): old keys suppressed by state
    time.sleep(1.1)  # distinct mtime so the file source sees new files
    batch2 = [("d4", "alpha"), ("d5", "gamma")]
    spark.createDataFrame(batch2, DOC_SCHEMA).write.mode("append").parquet(input_dir)
    _run_once(spark, input_dir, out_dir, ckpt)

    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {"d1", "d2", "d5"}  # d4 (dup of alpha) suppressed


def test_near_dup_streaming_via_simhash_key(spark, tmp_path):
    """dedup_stream with a SimHash key_expr (functions/dedup.simhash_expr):
    docs with the same distinct-word SET — e.g. reordered or word-repeated
    variants — collapse onto one survivor, which exact-content md5 keying
    would keep separately."""
    from html_parser_spark.functions.dedup import simhash_expr

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = [
        ("d1", "alpha beta gamma delta"),
        ("d2", "delta gamma beta alpha"),       # reordered -> same word set
        ("d3", "alpha alpha beta gamma delta"),  # repeated -> same distinct set
        ("d4", "completely different words here"),
    ]
    spark.createDataFrame(batch, DOC_SCHEMA).write.mode("append").parquet(input_dir)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    q = (
        dedup_stream(stream, key_expr=f"cast(({simhash_expr('text')}) as string)")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"]: r["n_dupes_in_batch"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {"d1": 3, "d4": 1}  # d2/d3 suppressed as near-dups of d1


def test_numeric_ids_survivor_is_numeric_min(spark, tmp_path):
    """The canonical survivor for numeric doc_ids is the NUMERIC min (9, not
    the lexicographic '10'), matching functions/dedup.exact_groups — doc_id
    keeps its input type through the groupBy and is stringified only in the
    output row."""
    from pyspark.sql.types import LongType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(10, "alpha"), (9, "alpha"), (100, "alpha"), (20, "beta")], schema
    ).write.mode("append").parquet(input_dir)

    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["content_key"]: r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert sorted(got.values()) == ["20", "9"]  # 9 < 10 < 100 numerically

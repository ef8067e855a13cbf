"""Structured Streaming extraction: availableNow micro-batch over a parquet
feed must equal the batch pipeline, and the sink checkpoint must make a
second run a no-op (exactly-once)."""

from __future__ import annotations

from html_parser_spark.operators.extract import INPUT_SCHEMA, extract_spans
from html_parser_spark.sources.fixtures import synth_docs
from html_parser_spark.streaming.extract_stream import (
    extract_stream,
    read_doc_stream,
    start_extract_sink,
)


def _write_input(spark, path, n=120, seed=5):
    rows = [
        (d, [dict(kind=k, text=t, media_ref=m, offset=o) for k, t, m, o in sp])
        for d, sp in synth_docs(n, seed=seed)
    ]
    spark.createDataFrame(rows, schema=INPUT_SCHEMA).write.parquet(path)
    return rows


def test_stream_equals_batch_and_is_exactly_once(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, input_dir)

    stream = extract_stream(read_doc_stream(spark, input_dir))
    assert stream.isStreaming
    q = start_extract_sink(stream, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == 120
    batch = extract_spans(spark.read.parquet(input_dir))
    key = lambda r: (  # noqa: E731
        r["doc_id"],
        tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
        r["status"],
    )
    assert {key(r) for r in got.collect()} == {key(r) for r in batch.collect()}

    # re-run with the same checkpoint: no new data -> no duplicate rows
    q2 = start_extract_sink(
        extract_stream(read_doc_stream(spark, input_dir)), out_dir, ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 120

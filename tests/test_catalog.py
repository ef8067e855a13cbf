"""TableIO facade (sources/catalog.py): parquet fallback semantics; Iceberg
detection is honest about this container (no runtime jar)."""

from __future__ import annotations

import pytest

from html_parser_spark.sources.catalog import TableIO, iceberg_available


def test_iceberg_not_on_classpath_here(spark):
    assert iceberg_available(spark) is False


def test_parquet_fallback_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert io.iceberg is False
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert not io.exists("t1")
    io.save(df, "t1")
    assert io.exists("t1")
    assert io.load("t1").count() == 2
    io.append(df, "t1")
    assert io.load("t1").count() == 4
    io.save(df, "t1")  # overwrite resets
    assert io.load("t1").count() == 2


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the same key must sort-merge-join with ZERO
    Exchange on either side (the co-location contract save_bucketed
    documents) — and reading them back via load() must keep the bucket
    spec (a bare path read would drop it)."""
    import io as _io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    tio = TableIO(spark, str(tmp_path))
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("x")
    )
    metrics = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("m")
    )
    tio.save_bucketed(docs, "bdocs", 8)
    tio.save_bucketed(metrics, "bmetrics", 8)
    a, b = tio.load("bdocs"), tio.load("bmetrics")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id")
        buf = _io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_snapshot_reads_require_iceberg(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    io.save(spark.range(1), "t2")
    with pytest.raises(ValueError):
        io.load("t2", snapshot_id=123)

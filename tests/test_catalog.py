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


def test_snapshot_reads_require_iceberg(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    io.save(spark.range(1), "t2")
    with pytest.raises(ValueError):
        io.load("t2", snapshot_id=123)

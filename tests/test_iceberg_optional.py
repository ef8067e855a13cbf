"""TableIO's Iceberg branch, exercised for real WHEN the runtime jar is on
the classpath (skipped cleanly otherwise — this sandbox has no jar).

The catalog is a runtime-configured hadoop-type Iceberg catalog over a tmp
warehouse; Iceberg initializes catalogs lazily on first use, so
spark.conf.set works without rebuilding the session. Covers: save/load
round-trip, append, snapshot-pinned reads (the resume contract), bucketed
writes via the bucket(N, col) partition transform, and exists()."""

from __future__ import annotations

import pytest

from html_parser_spark.sources.catalog import TableIO, iceberg_available


@pytest.fixture()
def ice(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on classpath")
    spark.conf.set("spark.sql.catalog.icetest", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.icetest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.icetest.warehouse", str(tmp_path / "wh"))
    return TableIO(spark, "icetest.db", use_iceberg=True)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"text-{i}") for i in range(lo, hi)], "doc_id long, text string"
    )


def test_iceberg_round_trip_and_snapshot_pin(spark, ice):
    ice.save(_df(spark, 0, 10), "t1")
    assert ice.exists("t1")
    assert ice.load("t1").count() == 10

    ice.append(_df(spark, 10, 15), "t1")
    assert ice.load("t1").count() == 15

    # snapshot-pinned read: the first snapshot still sees only the first 10
    snaps = (
        spark.sql("SELECT snapshot_id FROM icetest.db.t1.snapshots ORDER BY committed_at")
        .collect()
    )
    assert len(snaps) == 2
    assert ice.load("t1", snapshot_id=snaps[0]["snapshot_id"]).count() == 10


def test_iceberg_bucketed_write(spark, ice):
    ice.save_bucketed(_df(spark, 0, 40), "tb", buckets=4)
    got = ice.load("tb")
    assert got.count() == 40
    # the bucket transform is recorded as the table's partition spec
    parts = spark.sql("DESCRIBE TABLE EXTENDED icetest.db.tb").collect()
    text = "\n".join(str(r) for r in parts)
    assert "bucket" in text

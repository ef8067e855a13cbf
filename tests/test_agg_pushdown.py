"""Parquet footer aggregate pushdown: COUNT/MIN/MAX answered from file
metadata (PushedAggregation in the v2 scan), no row groups decoded — at
100 TB the difference between a metadata sweep and a full table read for
corpus-stat queries. Session confs are restored afterwards so the shared
fixture session keeps its default v1 reads."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def v2_parquet(spark):
    keys = ("spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushdown")
    old = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set(keys[0], "avro,csv,json,kafka,orc,text")
    spark.conf.set(keys[1], "true")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_count_min_max_pushed_to_footers(v2_parquet):
    spark = v2_parquet
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = df.selectExpr(
        "count(*) as n", "min(event_id) as mn", "max(event_id) as mx"
    )
    p = _plan(q)
    assert "PushedAggregation: [COUNT(*), MIN(event_id), MAX(event_id)]" in p
    row = q.first()
    exact = df.selectExpr("count(*)", "min(event_id)", "max(event_id)").first()
    assert (row.n, row.mn, row.mx) == tuple(exact)


def test_filtered_aggregate_does_not_push(v2_parquet):
    # a row-level filter forces real reads — the pushdown must NOT claim
    # footer stats it cannot use
    spark = v2_parquet
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = df.where("event_type = 'click'").selectExpr("count(*) as n")
    assert "PushedAggregation: []" in _plan(q) or "PushedAggregation" not in _plan(q)
    assert q.first().n == df.where("event_type = 'click'").count()

"""Stream-stream interval join (streaming/joins.py): watermark-bounded
state, exactly-once appends, and equality with the batch inequality join
over the union of all micro-batches."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from html_parser_spark.streaming.joins import interval_join_stream

SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
    ]
)


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def _run_once(spark, l_dir, r_dir, out_dir, ckpt):
    l_stream = spark.readStream.schema(SCHEMA).parquet(l_dir)
    r_stream = spark.readStream.schema(SCHEMA).parquet(r_dir)
    q = (
        interval_join_stream(l_stream, r_stream, on="user", window_secs=120)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_interval_join_equals_batch(spark, tmp_path):
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # batch 1: purchases (left) at minute 10; clicks (right) before them
    lb1 = [("u1", _t(10), 1), ("u2", _t(10), 2)]
    rb1 = [
        ("u1", _t(9), 100),   # inside 120 s window -> match
        ("u1", _t(5), 101),   # 5 min before -> outside window
        ("u2", _t(10), 102),  # equal ts -> match
        ("u3", _t(9), 103),   # no left row
    ]
    spark.createDataFrame(lb1, SCHEMA).write.mode("append").parquet(l_dir)
    spark.createDataFrame(rb1, SCHEMA).write.mode("append").parquet(r_dir)
    _run_once(spark, l_dir, r_dir, out_dir, ckpt)

    # batch 2: more events later; u1's minute-12 purchase matches the
    # minute-11 click arriving in the SAME batch and nothing from batch 1
    time.sleep(1.1)
    lb2 = [("u1", _t(12), 3)]
    rb2 = [("u1", _t(11), 104)]
    spark.createDataFrame(lb2, SCHEMA).write.mode("append").parquet(l_dir)
    spark.createDataFrame(rb2, SCHEMA).write.mode("append").parquet(r_dir)
    _run_once(spark, l_dir, r_dir, out_dir, ckpt)

    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch twin: plain inequality join over the union
    lall = spark.createDataFrame(lb1 + lb2, SCHEMA)
    rall = spark.createDataFrame(rb1 + rb2, SCHEMA)
    want = {
        (l.event_id, r.event_id)
        for l in lall.collect()
        for r in rall.collect()
        if l.user == r.user
        and dt.timedelta(0) <= l.ts - r.ts <= dt.timedelta(seconds=120)
    }
    assert got == want
    assert (3, 104) in got  # cross-reference inside batch 2
    assert (1, 101) not in got  # outside the interval


def test_stream_interval_join_state_is_bounded(spark, tmp_path):
    # smoke the watermark wiring: the query plan must carry event-time
    # watermarks on both sides (otherwise state grows forever)
    for d in ("lx", "rx"):
        spark.createDataFrame([("u", _t(0), 0)], SCHEMA).write.parquet(
            str(tmp_path / d)
        )
    l = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "lx"))
    r = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "rx"))
    joined = interval_join_stream(l, r, on="user", window_secs=60)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join — the dimension-enrichment pattern: a static
    (broadcastable) dim joined into each micro-batch; unmatched stream
    rows survive with nulls (left join), and the closed stream equals the
    batch join."""
    import pyspark.sql.functions as F

    s_dir, d_dir = str(tmp_path / "s"), str(tmp_path / "dim")
    out_dir, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    rows = [("u1", _t(1), 1), ("u2", _t(2), 2), ("ux", _t(3), 3)]
    spark.createDataFrame(rows, SCHEMA).write.parquet(s_dir)
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "basic"), ("u9", "gold")], "user string, tier string"
    )
    dim.write.parquet(d_dir)

    static = F.broadcast(spark.read.parquet(d_dir))
    stream = spark.readStream.schema(SCHEMA).parquet(s_dir)
    q = (
        stream.join(static, "user", "left")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user, r.event_id): r.tier
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {("u1", 1): "gold", ("u2", 2): "basic", ("ux", 3): None}

"""Streaming sessionization via native session_window.

The property that matters: sessions MERGE ACROSS MICRO-BATCHES (an event in
a later batch within the gap extends the open session) and each session is
emitted exactly once when the watermark passes its end — then the closed
streaming output equals running the same function over the full input in
batch mode.
"""

from __future__ import annotations

import datetime as dt

from html_parser_spark.streaming.rollup import (
    EVENTS_SCHEMA,
    events_sessionize_stream,
    read_events_stream,
    start_rollup_sink,
)


def _t(hh: int, mm: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hh, mm, 0)


def _feed(spark, input_dir: str, rows) -> None:
    data = [
        (i, ts, uid, "click", float(val), None)
        for i, (ts, uid, val) in enumerate(rows)
    ]
    spark.createDataFrame(data, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def _run(spark, input_dir: str, out_dir: str, ckpt: str) -> None:
    stream = events_sessionize_stream(read_events_stream(spark, input_dir))
    q = start_rollup_sink(stream, out_dir, ckpt)
    q.awaitTermination(120)


def test_sessions_merge_across_batches_and_close_once(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: user 1 opens a session (00:00, 00:10); user 2 opens one (00:05)
    _feed(
        spark,
        input_dir,
        [(_t(0, 0), 1, 1.00), (_t(0, 10), 1, 2.00), (_t(0, 5), 2, 4.00)],
    )
    _run(spark, input_dir, out_dir, ckpt)
    # watermark is still behind every session end: nothing emitted yet
    assert spark.read.parquet(out_dir).count() == 0

    # run 2: 00:20 EXTENDS user 1's session from the earlier batch (cross-
    # batch merge through the state store); 06:00 advances the watermark to
    # 04:00, closing both sessions in the trailing no-data batch
    _feed(spark, input_dir, [(_t(0, 20), 1, 8.00), (_t(6, 0), 3, 16.00)])
    _run(spark, input_dir, out_dir, ckpt)
    got = {
        r.user_id: (r.sess_start, r.sess_end, r.n_events, r.value_cents)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        1: (_t(0, 0), _t(0, 50), 3, 1100),  # one MERGED session, end = last+gap
        2: (_t(0, 5), _t(0, 35), 1, 400),
    }

    # run 3: a late event behind the watermark (00:30 < wm 04:00, and its
    # session closed) must NOT resurrect user 1's session; the on-time event
    # advances the watermark past user 3's session and closes it
    _feed(spark, input_dir, [(_t(0, 30), 1, 32.00), (_t(9, 0), 4, 0.50)])
    _run(spark, input_dir, out_dir, ckpt)
    rows = spark.read.parquet(out_dir).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 1 and per_user[1][0].value_cents == 1100
    assert per_user[3][0].n_events == 1 and per_user[3][0].value_cents == 1600

    # closed streaming output == the SAME function run in batch over all
    # input (restricted to sessions the watermark has closed)
    batch = {
        (r.user_id, r.sess_start): (r.sess_end, r.n_events, r.value_cents)
        for r in events_sessionize_stream(spark.read.parquet(input_dir))
        .where("sess_end <= timestamp'2024-01-01 07:00:00'")
        .collect()
    }
    stream = {
        (r.user_id, r.sess_start): (r.sess_end, r.n_events, r.value_cents)
        for r in rows
    }
    # the dropped late row is the one divergence batch mode keeps: it adds
    # an event, 3200 cents, and stretches the session end to 00:30 + gap
    batch_minus_late = {
        k: (_t(0, 50) if k == (1, _t(0, 0)) else e,
            n - (1 if k == (1, _t(0, 0)) else 0),
            c - (3200 if k == (1, _t(0, 0)) else 0))
        for k, (e, n, c) in batch.items()
    }
    assert stream == batch_minus_late

    # exactly-once: re-run with no new data adds nothing
    n = spark.read.parquet(out_dir).count()
    _run(spark, input_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n

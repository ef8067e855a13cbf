"""Event-time windowed rollup: watermark semantics with late data.

Three availableNow triggers over one checkpoint, feeding files between runs.
Watermark = 2h, window = 1h. Three Spark rules make this deterministic:
  - late-row filtering uses the watermark computed at the end of the PREVIOUS
    micro-batch (persisted in the checkpoint across runs);
  - a late row is dropped iff its window END <= the applied watermark (the
    window has been finalized); a late row into a still-open window is folded
    in normally;
  - an availableNow run appends a trailing NO-DATA micro-batch, so windows
    closed by the newly advanced watermark are emitted in the SAME run.

  run 1  batch A: 00:10, 01:10, 02:10 x2, 03:59  -> wm advances to 01:59;
         the trailing no-data batch emits [00:00,01:00)
  run 2  batch B: 05:30 (on time; wm -> 03:30), 02:30 (late, window
         [02:00,03:00) end 03:00 > 01:59: ACCEPTED into the open window),
         00:30 (window [00:00,01:00) end 01:00 <= 01:59: DROPPED — its
         window was finalized in run 1 without it and is never re-emitted)
         -> no-data batch emits [01:00) and [02:00) incl. the late row
  run 3  batch C: dummy at 07:00 (wm -> 05:00) -> emits [03:00)
"""

from __future__ import annotations

import datetime as dt

from html_parser_spark.streaming.rollup import (
    EVENTS_SCHEMA,
    events_rollup_stream,
    read_events_stream,
    start_rollup_sink,
)


def _t(hh: int, mm: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hh, mm, 0)


def _feed(spark, input_dir: str, rows) -> None:
    data = [
        (i, ts, 1, etype, float(val), None) for i, (ts, etype, val) in enumerate(rows)
    ]
    spark.createDataFrame(data, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def _run(spark, input_dir: str, out_dir: str, ckpt: str) -> None:
    stream = events_rollup_stream(read_events_stream(spark, input_dir))
    q = start_rollup_sink(stream, out_dir, ckpt)
    q.awaitTermination(120)


def test_watermark_drops_late_and_folds_in_time_rows(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: seed windows [00:00) [01:00) [02:00) [03:00); max 03:59 -> wm 01:59
    _feed(
        spark,
        input_dir,
        [
            (_t(0, 10), "click", 1.00),
            (_t(1, 10), "click", 2.00),
            (_t(2, 10), "click", 4.00),
            (_t(2, 10), "view", 8.00),
            (_t(3, 59), "click", 16.00),
        ],
    )
    _run(spark, input_dir, out_dir, ckpt)
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # wm 01:59 closes exactly [00:00,01:00) via the trailing no-data batch
    assert got == {(_t(0, 0), "click"): (1, 100)}

    # run 2 (applied wm = 01:59): on-time row advances the wm; the 02:30 row
    # is late but its window is still open (end 03:00 > wm) -> accepted; the
    # 00:30 row's window closed (end 01:00 <= wm) -> dropped
    _feed(
        spark,
        input_dir,
        [
            (_t(5, 30), "click", 32.00),
            (_t(2, 30), "click", 64.00),  # accepted: folds into [02:00,03:00)
            (_t(0, 30), "click", 128.00),  # dropped: [00:00,01:00) is finalized
        ],
    )
    _run(spark, input_dir, out_dir, ckpt)
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # the finalized [00:00,01:00) row is NOT re-emitted and NEVER includes the
    # dropped 128.00 row; the accepted 02:30 row shows up in [02:00,03:00)
    assert got[(_t(0, 0), "click")] == (1, 100)
    assert got[(_t(1, 0), "click")] == (1, 200)
    assert got[(_t(2, 0), "click")] == (2, 6800)

    # run 3: dummy row advances wm to 05:00, closing [03:00,04:00)
    _feed(spark, input_dir, [(_t(7, 0), "view", 0.50)])
    _run(spark, input_dir, out_dir, ckpt)

    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[(_t(0, 0), "click")] == (1, 100)  # still exactly once
    assert got[(_t(1, 0), "click")] == (1, 200)
    # [02:00): run-1 rows PLUS the late-but-accepted 02:30 row
    assert got[(_t(2, 0), "click")] == (2, 6800)
    assert got[(_t(2, 0), "view")] == (1, 800)
    assert got[(_t(3, 0), "click")] == (1, 1600)
    # the on-time 05:30 row's window is still open; the dropped row NEVER lands
    total_cents = sum(v for _, v in got.values())
    assert total_cents == 100 + 200 + 6800 + 800 + 1600

    # exactly-once: re-run with no new data -> no duplicate window rows
    n = spark.read.parquet(out_dir).count()
    _run(spark, input_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n

"""Stream-stream interval join with watermarks — the streaming face of
functions/joins.range_join_count.

Spark's stream-stream join buffers BOTH sides in the state store; the
interval condition plus the two watermarks are what make that viable
unbounded: a buffered left row can be evicted once the right watermark
passes `left.ts` (nothing later can match it), and vice versa — state is
O(rows inside the watermark horizon), not O(stream). Without the time
bound the state grows forever; this module therefore only exposes the
bounded form.

Append-mode semantics: a match is emitted when it is FINAL (both
watermarks passed), so the sink is exactly-once joined pairs — pinned
equal to the batch inequality join over the union of all micro-batches by
tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_secs: int,
    delay_secs: int = 60,
    ts: str = "ts",
) -> DataFrame:
    """Join each left-stream row to every right-stream row of the same
    `on` key with right.ts in [left.ts - window_secs, left.ts]. Both
    inputs must be STREAMING DataFrames with an event-time `ts` column.
    `delay_secs` is the lateness tolerance (watermark delay) on both
    sides; the right watermark carries the extra `window_secs` it may
    trail the left.

    Output: (on, left_ts, right_ts, left/right payload columns renamed
    l_/r_)."""
    lw = left.select(
        F.col(on),
        F.col(ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (on, ts)
        ],
    ).withWatermark("l_ts", f"{delay_secs} seconds")
    rw = right.select(
        F.col(on).alias("_r_on"),
        F.col(ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, ts)
        ],
    ).withWatermark("r_ts", f"{delay_secs + window_secs} seconds")
    cond = (
        (F.col(on) == F.col("_r_on"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window_secs} SECONDS"))
    )
    return lw.join(rw, cond).drop("_r_on")

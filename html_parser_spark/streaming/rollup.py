"""Event-time windowed rollup over the events feed (watermark + late data).

The reference is strictly batch (SURVEY.md §2.2: no streaming abstraction);
this is the streaming form of the batch `events_hourly` gate query: tumbling
event-time windows over `ts`, grouped by `event_type`, with a watermark that
(a) bounds state on a long-running cluster job — closed windows are evicted
instead of accumulating for the lifetime of the stream — and (b) defines the
late-data contract: a row later than `watermark` behind the max observed
event time is dropped; anything inside the horizon is folded into its
(possibly already-open) window before the window finalizes.

Append output mode means a window row is emitted exactly once, when the
watermark passes its end — the right contract for an Iceberg/parquet rollup
sink (no upserts needed, exactly-once via the sink checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def events_rollup_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time rollup; same aggregates as the batch
    `events_hourly` query (value summed in integer cents so stream and batch
    compare bit-exactly)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr("cast(sum(cast(round(value * 100) as bigint)) as bigint)").alias(
                "value_cents"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def events_sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization — the streaming face of the batch
    `events_sessionize` gate query, built on Spark's NATIVE session_window
    (the idiomatic form: merge-on-overlap session state in the state store,
    no custom applyInPandasWithState needed). Sessions MERGE across
    micro-batches: an event arriving in a later batch within `gap` of a
    user's open session extends it, and the session row is emitted exactly
    once, when the watermark passes its end (append mode).

    Boundary semantics differ from the batch lag-formulation by one
    instant: session_window splits when the gap is >= `gap` (windows
    [t, t+gap) merge only on strict overlap), while the lag query splits
    when the gap is > 1800 s. Same integer-cents aggregation as the batch
    twin, so closed streaming sessions compare bit-exactly against running
    this SAME function over the full input in batch mode (session_window
    works in both; withWatermark is a no-op in batch).

    State posture at scale: one state-store entry per OPEN session, keyed
    by user_id — the watermark evicts closed sessions, so state is bounded
    by concurrently-active users, not history."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr("cast(sum(cast(round(value * 100) as bigint)) as bigint)").alias(
                "value_cents"
            ),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
            "value_cents",
        )
    )


def start_rollup_sink(
    rollup: DataFrame, output_dir: str, checkpoint_dir: str, available_now: bool = True
) -> StreamingQuery:
    writer = (
        rollup.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")  # emit each window once, on watermark close
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

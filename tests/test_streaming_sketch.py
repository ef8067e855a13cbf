"""Streaming HLL (streaming/sketch_stream.py): cross-batch register state,
monotone emissions, and EXACT equality with the batch sketch over the
union of all micro-batches."""

from __future__ import annotations

import time

from pyspark.sql.types import StringType, StructField, StructType

from html_parser_spark.functions.sketch import hll_distinct
from html_parser_spark.streaming.sketch_stream import (
    hll_estimate_from_registers,
    hll_stream,
)

SCHEMA = StructType(
    [StructField("user", StringType()), StructField("grp", StringType())]
)


def _run_once(spark, input_dir, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = (
        hll_stream(stream, key_expr="user", group_expr="grp")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_equals_batch_hll(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(f"u{i}", "a") for i in range(120)] + [
        (f"u{i}", "b") for i in range(40)
    ]
    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(input_dir)
    _run_once(spark, input_dir, out_dir, ckpt)
    n_emit_1 = spark.read.parquet(out_dir).count()
    assert 0 < n_emit_1 <= 2 * 256  # at most one row per live register

    # batch 2: overlapping users (no register growth for repeats) + new ones
    time.sleep(1.1)
    batch2 = [(f"u{i}", "a") for i in range(100, 300)]
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(input_dir)
    _run_once(spark, input_dir, out_dir, ckpt)

    emitted = spark.read.parquet(out_dir)
    got = {
        r.group_key: r
        for r in hll_estimate_from_registers(emitted).collect()
    }
    union = spark.createDataFrame(batch1 + batch2, SCHEMA)
    want = {
        r.grp: r
        for r in hll_distinct(
            union, "user", ["grp"], with_exact=False
        ).collect()
    }
    assert set(got) == {"a", "b"}
    for g in ("a", "b"):
        # EXACT register-level equality with the batch sketch
        assert (got[g].n_reg, got[g].v_zero, got[g].s_fold) == (
            want[g].n_reg, want[g].v_zero, want[g].s_fold,
        )
        assert got[g].raw_est == want[g].raw_est
        assert got[g].est_rounded == want[g].est_rounded


def test_unchanged_registers_emit_nothing(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = [(f"u{i}", "a") for i in range(50)]
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(input_dir)
    _run_once(spark, input_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()

    time.sleep(1.1)  # replay the exact same keys: all registers unchanged
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(input_dir)
    _run_once(spark, input_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1


def test_streaming_countmin_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from html_parser_spark.functions.sketch import (
        countmin_cells,
        countmin_estimate,
    )
    from html_parser_spark.streaming.sketch_stream import (
        countmin_cells_from_stream,
        countmin_stream,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    term_schema = StructType([StructField("term", StringType())])

    b1 = [("alpha",)] * 30 + [("beta",)] * 10 + [(f"w{i}",) for i in range(20)]
    b2 = [("alpha",)] * 15 + [("gamma",)] * 5
    spark.createDataFrame(b1, term_schema).write.mode("append").parquet(input_dir)

    def run_once():
        stream = spark.readStream.schema(term_schema).parquet(input_dir)
        q = (
            countmin_stream(stream, "term")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    time.sleep(1.1)
    spark.createDataFrame(b2, term_schema).write.mode("append").parquet(input_dir)
    run_once()

    stream_cells = countmin_cells_from_stream(spark.read.parquet(out_dir))
    union = spark.createDataFrame(b1 + b2, term_schema)
    batch_cells = countmin_cells(union, "term")
    a = {(r.hrow, r.bucket): r.cnt for r in stream_cells.collect()}
    b = {(r.hrow, r.bucket): r.cnt for r in batch_cells.collect()}
    assert a == b  # cell-for-cell equal to the batch sketch
    # and the estimates built from the streamed cells match too
    probes = spark.createDataFrame(
        [("alpha", 45), ("beta", 10), ("gamma", 5)], "term string, exact long"
    )
    est_s = {
        r.term: r.est
        for r in countmin_estimate(stream_cells, probes).collect()
    }
    est_b = {
        r.term: r.est
        for r in countmin_estimate(batch_cells, probes).collect()
    }
    assert est_s == est_b
    assert est_s["alpha"] >= 45

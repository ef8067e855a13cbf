"""Checkpoint/resume protocol (sources/checkpoint.py): exactly-once output,
idempotent group commits, crash-resume equivalence."""

from __future__ import annotations

import pytest

from html_parser_spark.operators.extract import INPUT_SCHEMA, extract_spans
from html_parser_spark.sources.checkpoint import ExtractCheckpointJob
from html_parser_spark.sources.fixtures import synth_docs


def _input_factory(spark):
    rows = [
        (d, [dict(kind=k, text=t, media_ref=m, offset=o) for k, t, m, o in sp])
        for d, sp in synth_docs(200, seed=7)
    ]

    def factory():
        return spark.createDataFrame(rows, schema=INPUT_SCHEMA)

    return factory


def test_full_run_then_resume_is_noop(spark, tmp_path):
    job = ExtractCheckpointJob(spark, str(tmp_path / "out"), n_groups=4)
    factory = _input_factory(spark)
    r1 = job.run(factory)
    assert [r.skipped for r in r1] == [False] * 4
    assert sum(r.doc_count for r in r1) == 200
    # resume: everything committed -> all groups skipped
    r2 = job.run(factory)
    assert [r.skipped for r in r2] == [True] * 4
    assert job.output().count() == 200


def test_crash_resume_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    factory = _input_factory(spark)
    # "crash" after 2 of 4 groups
    job = ExtractCheckpointJob(spark, out, n_groups=4)
    r1 = job.run(factory, max_groups=2)
    assert sum(1 for r in r1 if not r.skipped) == 2
    assert len(job.committed_groups()) == 2
    # resume with a fresh job object (new driver process in real life)
    job2 = ExtractCheckpointJob(spark, out, n_groups=4)
    job2.run(factory)
    assert len(job2.committed_groups()) == 4
    got = job2.output()
    assert got.count() == 200
    assert got.select("doc_id").distinct().count() == 200  # exactly once
    # content identical to a non-checkpointed run
    direct = extract_spans(factory())
    a = {(r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]))
         for r in got.collect()}
    b = {(r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]))
         for r in direct.collect()}
    assert a == b


def test_lineage_metrics_sum(spark, tmp_path):
    job = ExtractCheckpointJob(spark, str(tmp_path / "out"), n_groups=4)
    job.run(_input_factory(spark))
    lin = {r["group"]: r for r in job.lineage().collect()}
    assert set(lin) == {0, 1, 2, 3}
    assert sum(r["doc_count"] for r in lin.values()) == 200
    out = job.output()
    assert sum(r["span_count"] for r in lin.values()) == (
        out.selectExpr("sum(n_spans) s").collect()[0]["s"]
    )


def test_group_membership_stable(spark, tmp_path):
    """Groups derive from doc_id (xxhash64), not task ids: same docs land in
    the same group across runs and parallelism levels."""
    job = ExtractCheckpointJob(spark, str(tmp_path / "o1"), n_groups=4)
    factory = _input_factory(spark)
    job.run(factory)
    g1 = {
        (r["doc_id"]): p
        for p in job.committed_groups()
        for r in spark.read.parquet(f"{job.data_dir}/group={p}").collect()
    }
    job2 = ExtractCheckpointJob(spark, str(tmp_path / "o2"), n_groups=4)
    job2.run(lambda: factory().repartition(13))
    g2 = {
        (r["doc_id"]): p
        for p in job2.committed_groups()
        for r in spark.read.parquet(f"{job2.data_dir}/group={p}").collect()
    }
    assert g1 == g2

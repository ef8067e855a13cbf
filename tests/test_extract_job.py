"""jobs/extract.py driven in-process: synthetic corpus run, summary
counts, and the crash-resume contract (a second run over the same output
skips every committed group and changes nothing)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

import extract as extract_job  # noqa: E402


def test_extract_job_run_and_resume(spark, tmp_path, capsys):
    out = str(tmp_path / "xout")
    args = ["--output", out, "--synth-docs", "300", "--n-groups", "4"]
    assert extract_job.main(args, spark=spark) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["groups_processed"] == 4 and first["groups_skipped"] == 0
    assert first["doc_count"] == 300 and first["span_count"] > 0

    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.select("doc_id").distinct().count() == 300

    # resume: everything already committed -> all groups skip, output stable
    before = data.selectExpr("count(*)", "sum(n_text_chars)", "sum(n_spans)").first()
    assert extract_job.main(args, spark=spark) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["groups_skipped"] == 4 and second["groups_processed"] == 0
    after = (
        spark.read.parquet(os.path.join(out, "data"))
        .selectExpr("count(*)", "sum(n_text_chars)", "sum(n_spans)")
        .first()
    )
    assert tuple(before) == tuple(after)

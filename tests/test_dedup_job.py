"""jobs/dedup_corpus.py: end-to-end dedup job on a corpus with planted
exact and near duplicates — artifact layout, survivor semantics, metrics,
and the resume (commit-marker) path."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

import dedup_corpus  # noqa: E402


def _corpus(spark, tmp_path):
    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(40)))  # unique docs
        for i in range(20)
    ]
    # near-dup of doc 3 (drop last word) and exact copy of doc 5
    near = (100, " ".join(f"w3x{j}" for j in range(39)))
    exact = (101, base[5][1])
    df = spark.createDataFrame(base + [near, exact], "doc_id bigint, text string")
    path = str(tmp_path / "corpus")
    df.write.parquet(path)
    return path


def test_job_end_to_end_and_resume(spark, tmp_path, capsys):
    inp = _corpus(spark, tmp_path)
    out = str(tmp_path / "dedup")
    rc = dedup_corpus.main(["--input", inp, "--output", out], spark=spark)
    assert rc == 0
    metrics = json.loads(open(os.path.join(out, "metrics.json")).read())
    assert metrics["n_docs"] == 22
    assert metrics["n_exact_dup_groups"] == 1
    assert metrics["n_near_dup_pairs"] >= 2  # (3,100) near + (5,101) exact
    assert metrics["n_dropped_docs"] == 2  # 100 and 101 lose to min ids
    assert metrics["lsh_observation"]["dropped_buckets"] == 0

    surv = {
        r.doc_id: (r.rep_doc_id, r.keep)
        for r in spark.read.parquet(os.path.join(out, "survivors")).collect()
    }
    assert len(surv) == 22
    assert surv[100] == (3, False) and surv[101] == (5, False)
    assert surv[3] == (3, True) and surv[5] == (5, True)
    assert surv[7] == (7, True)  # untouched doc keeps itself

    # resume: metrics.json is the commit marker — exits 0 without Spark work
    capsys.readouterr()
    rc = dedup_corpus.main(
        ["--input", "/nonexistent", "--output", out, "--resume"], spark=spark
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["n_docs"] == 22

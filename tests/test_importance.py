"""DSIR-shaped importance resampling (functions/sampling.py): bucket
weights, row-local scoring, deterministic top-k — pinned against a pure
Python mirror, plus the cross-corpus scoring path (weights estimated on
one corpus, applied to another) and the neutral-bucket default."""

from __future__ import annotations

import hashlib

from html_parser_spark.functions.sampling import (
    IMP_CLAMP,
    IMP_UNIT,
    importance_resample,
    importance_score,
    importance_weights,
)

B = 256


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _grams(text: str) -> list[str]:
    ws = [w for w in text.split(" ") if w]
    return [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _mirror(rows, target_sources, top_k):
    c_t, c_r = {}, {}
    for _, src, text in rows:
        side = c_t if src in target_sources else c_r
        for g in _grams(text):
            b = _bucket(g)
            side[b] = side.get(b, 0) + 1
    wt = {}
    for b in set(c_t) | set(c_r):
        wt[b] = min(
            IMP_UNIT * (c_t.get(b, 0) + 1) // (c_r.get(b, 0) + 1), IMP_CLAMP
        )
    scored = []
    for doc_id, src, text in rows:
        gs = _grams(text)
        score = sum(wt.get(_bucket(g), IMP_UNIT) for g in gs)
        scored.append((doc_id, src, len(gs), score))
    scored.sort(key=lambda r: (-r[3], r[0]))
    return scored[:top_k]


def test_resample_matches_python_mirror(spark):
    rows = [
        (i, f"src{i % 5}", " ".join(
            ["alpha beta", "gamma delta epsilon", "alpha beta gamma",
             "zeta eta theta iota", "beta  beta alpha"][i % 5]
            for _ in range(1 + i % 3)
        ))
        for i in range(60)
    ] + [(100, "src0", ""), (101, "src1", "word")]  # zero-gram docs
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = importance_resample(
        docs, "source in ('src0', 'src1')", top_k=20
    ).collect()
    want = _mirror(rows, {"src0", "src1"}, 20)
    assert [(r.doc_id, r.source, r.n_grams, r.score) for r in got] == want
    assert [r.rank for r in got] == list(range(1, 21))


def test_cross_corpus_scoring_and_neutral_default(spark):
    est = spark.createDataFrame(
        [(1, "t", "good data good data"), (2, "r", "bad stuff bad stuff")],
        "doc_id bigint, source string, text string",
    )
    wt = importance_weights(est, "source = 't'")
    # target-only bigrams weigh over the neutral unit, raw-only under it
    w = {r.bucket: r.w for r in wt.collect()}
    assert w[_bucket("good data")] > IMP_UNIT > w[_bucket("bad stuff")]
    # scoring a DIFFERENT corpus: unseen bigrams take the neutral weight
    other = spark.createDataFrame(
        [(9, "x", "never seen grams")], "doc_id bigint, source string, text string"
    )
    got = importance_score(other, wt, keep_cols=("source",)).collect()[0]
    assert got.n_grams == 2 and got.score == 2 * IMP_UNIT


def test_clamp_bounds_zero_raw_blowup(spark):
    # a target bigram that never occurs raw: weight = 1e6 * (c+1), clamped
    docs = spark.createDataFrame(
        [(i, "t", "rare pair") for i in range(3)]
        + [(99, "r", "other words")],
        "doc_id bigint, source string, text string",
    )
    w = {r.bucket: r.w for r in importance_weights(docs, "source = 't'").collect()}
    assert w[_bucket("rare pair")] == min(IMP_UNIT * 4, IMP_CLAMP)

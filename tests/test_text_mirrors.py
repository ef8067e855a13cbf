"""Seeded-random cross-checks: bm25_topk, phrase_search, and
repeated_spans against plain-Python mirrors over small-vocabulary random
corpora (small vocab forces collisions, repeats, and ties — the paths a
hand-built fixture misses)."""

from __future__ import annotations

import random

from html_parser_spark.functions import dedup as DD
from html_parser_spark.functions import text as TXT

VOCAB = ["a", "b", "c", "d", "e"]


def _corpus(seed, n_docs=80, max_len=40):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, max_len))))
        for i in range(n_docs)
    ]


def _bm25_mirror(rows, terms, k):
    docs = {d: t.split(" ") for d, t in rows}
    n_docs = len(docs)
    total_len = sum(len(w) for w in docs.values())
    df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    scored = []
    for d, w in docs.items():
        s, hits = 0, 0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            hits += 1
            tp = (22_000_000 * tf * total_len) // (
                10 * tf * total_len + 3 * total_len + 9 * len(w) * n_docs
            )
            idf = (1000 * (2 * (n_docs - df[t]) + 1)) // (2 * df[t] + 1)
            s += (tp * idf) // 1000
        if hits:
            scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def _phrase_mirror(rows, phrase):
    out = {}
    for d, t in rows:
        w = t.split(" ")
        hits = [
            i
            for i in range(len(w) - len(phrase) + 1)
            if w[i : i + len(phrase)] == list(phrase)
        ]
        if hits:
            out[d] = (len(hits), hits[0])
    return out


def _spans_mirror(rows, n=10):
    from collections import Counter, defaultdict

    grams = Counter()
    pos = defaultdict(list)
    for d, t in rows:
        w = t.split(" ")
        for i in range(len(w) - n + 1):
            g = " ".join(w[i : i + n])
            grams[g] += 1
            pos[d].append((i, g))
    out = {}
    for d, lst in pos.items():
        rep = [i for i, g in lst if grams[g] >= 2]
        if not rep:
            continue
        seq = 0
        start = prev = rep[0]
        cnt = 1
        for p in rep[1:]:
            if p - prev > n:
                seq += 1
                out[(d, seq)] = (start, prev + n - 1, prev - start + n, cnt)
                start, cnt = p, 0
            cnt += 1
            prev = p
        seq += 1
        out[(d, seq)] = (start, prev + n - 1, prev - start + n, cnt)
    return out


def test_bm25_matches_mirror_on_random_corpora(spark):
    for seed in (7, 19, 42):
        rows = _corpus(seed)
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = [
            (r.doc_id, r.bm25_micro)
            for r in sorted(
                TXT.bm25_topk(df, terms=("a", "b"), k=15).collect(),
                key=lambda r: r.rank,
            )
        ]
        assert got == _bm25_mirror(rows, ("a", "b"), 15), f"seed {seed}"


def test_phrase_matches_mirror_on_random_corpora(spark):
    for seed, phrase in ((3, ("a", "b")), (11, ("a", "a")), (23, ("b", "c", "a"))):
        rows = _corpus(seed)
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r.doc_id: (r.n_phrase, r.first_pos)
            for r in TXT.phrase_search(df, phrase=phrase).collect()
        }
        assert got == _phrase_mirror(rows, phrase), f"seed {seed}"


def test_repeated_spans_matches_mirror_on_random_corpora(spark):
    # vocab of 3 over length<=60 makes 10-gram repeats common
    for seed in (5, 29):
        rng = random.Random(seed)
        rows = [
            (
                i,
                " ".join(
                    rng.choice(["x", "y", "z"])
                    for _ in range(rng.randint(1, 60))
                ),
            )
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            (r.doc_id, r.span_seq): (
                r.span_start,
                r.span_end,
                r.span_words,
                r.n_rep_grams,
            )
            for r in DD.repeated_spans(df).collect()
        }
        assert got == _spans_mirror(rows), f"seed {seed}"

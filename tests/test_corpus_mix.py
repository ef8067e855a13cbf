"""Token-budget corpus mixing: deterministic weighted up/down-sampling.

Checked against an independent Python mirror of the integer-ppm arithmetic
(md5 bucket, floor rates), plus regime assertions: over-budget sources emit
epoch repeats, under-budget sources thin out, and the expected emitted token
count per source tracks its share of the budget.
"""

from __future__ import annotations

import hashlib

from html_parser_spark.functions.sampling import MIX_UNIT, corpus_mix


def _bucket(doc_id, source):
    return int(
        hashlib.md5(f"{doc_id}:{source}".encode()).hexdigest()[:8], 16
    ) % MIX_UNIT


def _mirror(rows, weights, budget):
    """rows = [(doc_id, source, n_tokens)] -> {(doc_id, copy_idx): ...}"""
    wsum = sum(weights.values())
    totals = {}
    for _d, s, n in rows:
        totals[s] = totals.get(s, 0) + n
    out = set()
    for d, s, n in rows:
        if s not in weights or totals[s] == 0:
            continue
        rate_ppm = (budget * weights[s] * MIX_UNIT) // (wsum * totals[s])
        copies = rate_ppm // MIX_UNIT + (
            1 if _bucket(d, s) < rate_ppm % MIX_UNIT else 0
        )
        for c in range(1, copies + 1):
            out.add((d, s, c, n, rate_ppm))
    return out


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(d, s, " ".join(["tok"] * n)) for d, s, n in rows],
        "doc_id: long, source: string, text: string",
    )


def test_matches_python_mirror_and_is_deterministic(spark):
    rows = [(i, f"src{i % 3}", 5 + i % 7) for i in range(120)]
    weights = {"src0": 1, "src1": 2, "src2": 4}
    budget = sum(n for _, _, n in rows)  # mixed regime: rates ~0.4..1.7
    got = {
        tuple(r)
        for r in corpus_mix(_docs_df(spark, rows), weights, budget).collect()
    }
    assert got == _mirror(rows, weights, budget)
    again = {
        tuple(r)
        for r in corpus_mix(_docs_df(spark, rows), weights, budget).collect()
    }
    assert again == got


def test_upsampling_emits_epoch_repeats(spark):
    # tiny high-weight source vs big low-weight source
    rows = [(1, "rare", 10)] + [(100 + i, "web", 10) for i in range(50)]
    weights = {"rare": 5, "web": 1}
    budget = 510  # rare's share = 425 tokens over 10 available -> 42 epochs
    out = corpus_mix(_docs_df(spark, rows), weights, budget).collect()
    rare = [r for r in out if r.source == "rare"]
    assert len(rare) >= 42 and {r.copy_idx for r in rare} == set(
        range(1, len(rare) + 1)
    )
    # web down-samples: 85-token share over 500 available
    web = [r for r in out if r.source == "web"]
    assert 0 < len(web) < 50 and all(r.copy_idx == 1 for r in web)


def test_expected_tokens_track_share(spark):
    rows = [(i, "a" if i % 2 else "b", 10) for i in range(400)]
    weights = {"a": 3, "b": 1}
    budget = 2000
    out = corpus_mix(_docs_df(spark, rows), weights, budget).collect()
    toks = {"a": 0, "b": 0}
    for r in out:
        toks[r.source] += r.n_tokens
    # shares are 1500/500; hash-binomial tail at n=200 stays well inside 20%
    assert abs(toks["a"] - 1500) < 300 and abs(toks["b"] - 500) < 150


def test_source_missing_from_weights_is_dropped(spark):
    rows = [(1, "kept", 10), (2, "unlisted", 10)]
    out = corpus_mix(_docs_df(spark, rows), {"kept": 1}, 10).collect()
    assert {r.source for r in out} == {"kept"}

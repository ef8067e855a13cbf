"""Cross-document repeated-span mining (functions/dedup.repeated_spans):
hand-built corpora where the maximal spans are known exactly — shared-prefix
pairs, the merge-vs-split boundary at gap == n, and sub-n-gram docs."""

from __future__ import annotations

import pytest

from html_parser_spark.functions import dedup as DD

N = DD.REP_SPAN_N  # 10


def _mine(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        (r.doc_id, r.span_seq): (
            r.span_start,
            r.span_end,
            r.span_words,
            r.n_rep_grams,
        )
        for r in DD.repeated_spans(df).collect()
    }


def _words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_exact_copy_mines_whole_doc(spark):
    text = _words("w", 25)
    out = _mine(spark, [(1, text), (2, text), (3, _words("z", 25))])
    # both copies: one span covering words 0..24, all 16 grams repeated
    assert out == {
        (1, 1): (0, 24, 25, 16),
        (2, 1): (0, 24, 25, 16),
    }


def test_shared_middle_span(spark):
    shared = _words("s", 14)  # 14 shared words -> 5 repeated 10-grams
    a = _words("a", 7) + " " + shared + " " + _words("b", 7)
    b = _words("c", 4) + " " + shared + " " + _words("d", 9)
    out = _mine(spark, [(1, a), (2, b)])
    # doc 1: shared words occupy positions 7..20; repeated gram starts 7..11
    assert out[(1, 1)] == (7, 20, 14, 5)
    # doc 2: shared words occupy positions 4..17
    assert out[(2, 1)] == (4, 17, 14, 5)
    assert len(out) == 2


def test_gap_merge_boundary(spark):
    # two repeated 10-gram islands in doc 1 (each shared with a DIFFERENT
    # witness doc, so the straddling grams stay unique), island starts
    # separated by exactly n positions (touching windows -> ONE span) vs
    # n+1 (disjoint -> TWO spans)
    s1, s2 = _words("p", 10), _words("q", 10)
    witnesses = [
        (2, _words("a", 5) + " " + s1 + " " + _words("b", 5)),
        (3, _words("c", 5) + " " + s2 + " " + _words("d", 5)),
    ]
    # islands at pos 0 and 10: gap == n -> merge
    out = _mine(spark, [(1, s1 + " " + s2)] + witnesses)
    assert out[(1, 1)] == (0, 19, 20, 2)
    assert out[(2, 1)] == (5, 14, 10, 1)
    assert out[(3, 1)] == (5, 14, 10, 1)
    assert len(out) == 3

    # islands at pos 0 and 11: gap > n -> split
    out2 = _mine(spark, [(1, s1 + " x0 " + s2)] + witnesses)
    assert out2[(1, 1)] == (0, 9, 10, 1)
    assert out2[(1, 2)] == (11, 20, 10, 1)


def test_short_docs_and_unique_text_mine_nothing(spark):
    out = _mine(
        spark,
        [(1, _words("u", 9)), (2, _words("u", 9)), (3, _words("v", 40))],
    )
    # 9-word docs have no 10-gram even as exact copies; unique text has no
    # repeated gram
    assert out == {}


def test_within_doc_repeat_counts(spark):
    # the SAME doc repeating a 10-gram twice is a global count of 2
    s = _words("r", 10)
    out = _mine(spark, [(1, s + " " + s), (2, _words("t", 30))])
    assert out == {(1, 1): (0, 19, 20, 2)}


@pytest.mark.parametrize("n_words", [10, 11])
def test_minimal_repeat(spark, n_words):
    text = _words("m", n_words)
    out = _mine(spark, [(1, text), (2, text)])
    grams = n_words - N + 1
    assert out == {
        (1, 1): (0, n_words - 1, n_words, grams),
        (2, 1): (0, n_words - 1, n_words, grams),
    }

"""BM25 ranked retrieval (functions/text.bm25_topk): exact integer scores on
a hand-built corpus plus the ranking properties BM25 must satisfy (idf
weighting, tf saturation, length normalization)."""

from __future__ import annotations

from html_parser_spark.functions import text as TXT


def _score(tf, dl, n_docs, total_len, df):
    """Python mirror of the per-term integer BM25 (docstring formula)."""
    if tf == 0:
        return 0
    tf_part = (22_000_000 * tf * total_len) // (
        10 * tf * total_len + 3 * total_len + 9 * dl * n_docs
    )
    idf = (1000 * (2 * (n_docs - df) + 1)) // (2 * df + 1)
    return (tf_part * idf) // 1000


def _run(spark, rows, terms, k=10):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return TXT.bm25_topk(df, terms=terms, k=k).collect()


def test_exact_scores_small_corpus(spark):
    rows = [
        (1, "join hash join filler filler"),
        (2, "join filler filler filler filler filler"),
        (3, "filler filler filler"),
        (4, "hash hash hash hash"),
    ]
    out = _run(spark, rows, terms=("join", "hash"))
    n_docs, total_len = 4, 5 + 6 + 3 + 4
    df_join, df_hash = 2, 2
    exp = {}
    for doc_id, text in rows:
        w = text.split(" ")
        s = _score(w.count("join"), len(w), n_docs, total_len, df_join) + _score(
            w.count("hash"), len(w), n_docs, total_len, df_hash
        )
        if s:
            exp[doc_id] = s
    got = {r.doc_id: r.bm25_micro for r in out}
    assert got == exp
    # ranks are dense over (score desc, doc_id asc)
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == sorted(exp, key=lambda d: (-exp[d], d))
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(exp) + 1)
    )


def test_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 doc, 'common' in all: one rare hit must outrank
    # one common hit at equal tf and dl
    rows = [
        (1, "rare pad1 pad2 pad3"),
        (2, "common pad1 pad2 pad3"),
        (3, "common pad4 pad5 pad6"),
        (4, "common pad7 pad8 pad9"),
    ]
    out = {r.doc_id: r.bm25_micro for r in _run(spark, rows, ("rare", "common"))}
    assert out[1] > out[2]


def test_tf_saturates(spark):
    # doubling tf increases the score, but by less than 2x (the k1 cap)
    rows = [
        (1, "term pad pad pad pad pad pad pad"),
        (2, "term term pad pad pad pad pad pad"),
        (3, "other pad pad pad pad pad pad pad"),
    ]
    out = {r.doc_id: r.bm25_micro for r in _run(spark, rows, ("term",))}
    assert out[1] < out[2] < 2 * out[1]


def test_shorter_doc_wins_at_equal_tf(spark):
    rows = [
        (1, "term pad pad pad"),
        (2, "term pad pad pad pad pad pad pad pad pad pad pad"),
        (3, "zzz yyy"),
    ]
    out = _run(spark, rows, ("term",))
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
    assert {r.doc_id for r in out} == {1, 2}  # no-hit docs excluded


def test_k_cut_and_tie_break(spark):
    # equal docs tie on score; the cut keeps lowest doc_ids
    rows = [(i, "term pad pad") for i in range(1, 8)]
    out = _run(spark, rows, ("term",), k=3)
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]

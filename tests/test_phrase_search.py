"""Positional phrase search (functions/text.phrase_search): exact adjacency
semantics — consecutive positions only, overlapping matches counted, k-word
phrases — on hand-built docs."""

from __future__ import annotations

from html_parser_spark.functions import text as TXT


def _run(spark, rows, phrase):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r.doc_id: (r.n_phrase, r.first_pos)
        for r in TXT.phrase_search(df, phrase=phrase).collect()
    }


def test_adjacency_not_bag_of_words(spark):
    out = _run(
        spark,
        [
            (1, "pad hash join pad"),  # match at 1
            (2, "hash pad join"),  # both words, not adjacent
            (3, "join hash"),  # reversed
            (4, "hash join pad hash join"),  # two matches
        ],
        ("hash", "join"),
    )
    assert out == {1: (1, 1), 4: (2, 0)}


def test_three_word_phrase_and_first_pos(spark):
    out = _run(
        spark,
        [
            (1, "x a b c y a b"),  # full phrase at 1; prefix at 5 no match
            (2, "a b x c"),
            (3, "c b a"),
        ],
        ("a", "b", "c"),
    )
    assert out == {1: (1, 1)}


def test_overlapping_matches_count(spark):
    out = _run(spark, [(1, "a a a a"), (2, "b b")], ("a", "a"))
    assert out == {1: (3, 0)}


def test_repeated_word_phrase_requires_run(spark):
    out = _run(spark, [(1, "a b a b a"), (2, "a a b")], ("a", "a"))
    assert out == {2: (1, 0)}

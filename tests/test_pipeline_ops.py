"""Training-data pipeline operators: benchmark decontamination and the
bigram-LM fluency score (functions/dedup.decontaminate, text.bigram_lm_score)."""

from __future__ import annotations

from html_parser_spark.functions import dedup as DD
from html_parser_spark.functions import text as TXT


def test_decontaminate_flags_members_and_near_copies(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, bench_text, "s"),                                   # IS the benchmark doc
        (2, "prefix words " + bench_text + " suffix words", "s"),  # contains it
        (3, "totally unrelated content with many different words here", "s"),
        (4, "alpha beta gamma nothing else shared apart from this", "s"),  # 1 shingle
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = docs.where("doc_id = 1")
    got = {r.doc_id: r for r in DD.decontaminate(docs, bench, threshold=5).collect()}
    assert got[1].is_contaminated == 1  # self
    assert got[2].is_contaminated == 1 and got[2].n_overlap >= 6  # superset doc
    assert got[3].is_contaminated == 0 and got[3].n_overlap == 0
    assert got[4].is_contaminated == 0 and got[4].n_overlap == 1  # below threshold


def test_bigram_lm_scores_fluency(spark):
    # 'the cat sat' repeated makes its transitions common; doc 4 is the
    # only user of its bigrams -> lower conditional probabilities
    rows = [
        (1, "the cat sat on the mat", "s"),
        (2, "the cat sat on the rug", "s"),
        (3, "the cat sat on the mat", "s"),
        (4, "zq xw vv kj qpr mno", "s"),
        (5, "one", "s"),  # no bigrams -> no row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in TXT.bigram_lm_score(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].n_bigrams == 5
    assert got[1].score_micro == got[3].score_micro  # identical docs
    # Laplace smoothing is load-bearing: without +V the hapax-prefix
    # ratio degenerates to 1/1 and GIBBERISH scores the maximum
    assert got[1].score_micro > got[4].score_micro  # fluent beats gibberish
    # doc 2 shares most transitions with 1/3 but 'the rug' is rarer
    assert got[2].score_micro < got[1].score_micro

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


def test_chunk_dedup_keeps_first_occurrence(spark):
    # doc 1 owns both of its chunks; doc 2 repeats doc 1's first 5-word
    # chunk (dropped) but keeps its own tail; doc 3 is a full copy of
    # doc 1 -> survives as a row with nothing kept
    c1 = "alpha beta gamma delta epsilon"
    rows = [
        (1, c1 + " zeta eta", "s"),
        (2, c1 + " own new words here", "s"),
        (3, c1 + " zeta eta", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in DD.chunk_dedup(docs).collect()}
    assert (got[1].n_chunks, got[1].n_kept) == (2, 2)
    assert got[1].text_dedup == c1 + " zeta eta"
    assert (got[2].n_chunks, got[2].n_kept) == (2, 1)
    assert got[2].text_dedup == "own new words here"
    assert (got[3].n_chunks, got[3].n_kept) == (2, 0)
    assert got[3].text_dedup == ""


def test_repetition_flags_degenerate_text(spark):
    rows = [
        (1, "spam ham spam ham spam ham spam ham spam ham", "s"),  # one bigram pair dominates
        # 17 distinct words -> 16 distinct bigrams: top share 62 permille,
        # under the 66 threshold (the flag is share-based, so very short
        # docs are inherently over it — mirroring Gopher's fraction rule)
        (2, "many quite different tokens appear woven across this longer "
            "sentence because short texts always exceed fraction thresholds", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in TXT.repetition(docs).collect()}
    # doc 1: 9 bigrams, 'spam ham' x5 -> 555 permille, flagged
    assert (got[1].n_bigrams, got[1].top_bigram_count) == (9, 5)
    assert got[1].top_bigram_permille == 555 and got[1].rep_ok == 0
    # doc 2: all distinct words and bigrams
    assert got[2].top_bigram_count == 1 and got[2].dup_word_permille == 0
    assert got[2].top_bigram_permille == 62 and got[2].rep_ok == 1


def test_pii_redact_scrubs_planted_pii(spark):
    rows = [(3, "plain lowercase words only", "s"), (4, "other text body", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in TXT.pii_redact(TXT.plant_pii(docs)).collect()}
    # doc 3 (doc_id % 3 == 0) gets the second planted email
    assert got[3].n_emails == 2 and got[4].n_emails == 1
    for r in got.values():
        assert "@" not in r.text_clean and "<EMAIL>" in r.text_clean
        # any 4+ digit id was masked; shorter runs may legitimately remain
        import re
        assert not re.search(r"[0-9]{4,}", r.text_clean)
        if r.n_ids:
            assert "<ID>" in r.text_clean

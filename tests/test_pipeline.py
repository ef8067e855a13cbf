"""Composed pipeline (operators/pipeline.py): extraction -> reassembly ->
quality gate -> dedup manifest, end-to-end on a corpus with planted exact
duplicates and a quality-failing doc."""

from __future__ import annotations

from pyspark.sql import functions as F

from html_parser_spark.operators.pipeline import clean_corpus, reassembled_documents
from html_parser_spark.operators.extract import extract_spans
from html_parser_spark.sources.interleave import interleaved_from_documents


def _corpus(spark):
    rows = [
        # 1 & 2: exact duplicates (same text) -> one group, rep=1, n=2
        (1, "alpha beta gamma delta epsilon zeta", "s1"),
        (2, "alpha beta gamma delta epsilon zeta", "s2"),
        # 10: numeric-min check partner for 9 (same text) -> rep=9 not '10'
        (9, "one two three four five six seven", "s1"),
        (10, "one two three four five six seven", "s1"),
        # 20: fails the quality gate (3*distinct < words after the wrap
        # doubles the body: distinct=5, words=3+2*10=23 -> 15 < 23)
        (20, "rep rep rep rep rep rep rep rep go on", "s1"),
        # 30: unique singleton
        (30, "unique words make a fine single document", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_reassembled_matches_wrap_closed_form(spark):
    docs = _corpus(spark)
    re = reassembled_documents(extract_spans(interleaved_from_documents(docs)))
    got = {r["doc_id"]: r["text"] for r in re.collect()}
    assert got[1] == (
        "alpha beta gamma"
        " alpha beta gamma delta epsilon zeta"
        " alpha beta gamma delta epsilon zeta"
    )
    assert isinstance(next(iter(got)), int)  # numeric ids preserved


def test_clean_corpus_manifest(spark):
    out = clean_corpus(interleaved_from_documents(_corpus(spark))).collect()
    by_rep = {r["rep_doc_id"]: r["n_copies"] for r in out}
    assert by_rep == {1: 2, 9: 2, 30: 1}  # doc 20 quality-dropped; 9 < 10 numerically


def test_single_wide_operation(spark):
    """The composed plan must contain exactly one Exchange (the dedup
    groupBy) and one Python crossing."""
    import io
    from contextlib import redirect_stdout

    df = clean_corpus(interleaved_from_documents(_corpus(spark)))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "MapInPandas" not in plan and plan.count("MapInArrow") <= 2

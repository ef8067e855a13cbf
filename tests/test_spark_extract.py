"""End-to-end Spark extraction: the mapInPandas pipeline must reproduce the
oracle span-for-span over the interleaved input table (the per-row invariant:
span-sequence equality on (kind, text, media_ref, order))."""

from __future__ import annotations

import pytest

from html_parser_spark.core import oracle
from html_parser_spark.operators.extract import (
    INPUT_SCHEMA,
    exploded_spans,
    extract_spans,
    partition_metrics,
)
from html_parser_spark.sources.fixtures import FIXTURES, synth_docs


def _to_rows(docs):
    return [
        (doc_id, [{"kind": k, "text": t, "media_ref": m, "offset": off} for k, t, m, off in spans])
        for doc_id, spans in docs
    ]


@pytest.fixture(scope="module")
def extracted(spark):
    docs = list(synth_docs(300, seed=11, mega_doc_rate=0.01))
    # plus one doc per HTML fixture (errors and divergents included)
    docs += [
        (f"fx-{fid}", [("text", html, None, 0)])
        for fid, _cat, html, _status in FIXTURES
    ]
    df = spark.createDataFrame(_to_rows(docs), schema=INPUT_SCHEMA)
    out = extract_spans(df, salt_partitions=8).cache()
    return docs, out


def test_spark_matches_oracle_per_row(extracted):
    docs, out = extracted
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == len(docs)
    for doc_id, in_spans in docs:
        triples = [(k, t, m) for (k, t, m, _off) in in_spans]
        want_spans, want_status, want_error = oracle.process_document(triples)
        row = got[doc_id]
        assert row["status"] == want_status, doc_id
        assert row["error"] == want_error, doc_id
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]]
        assert got_spans == want_spans, doc_id


def test_spark_output_schema_stable(extracted):
    _, out = extracted
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "spans", "status", "error", "n_spans", "n_text_chars", "partition_id",
    ]


def test_exploded_spans_order(extracted):
    _, out = extracted
    ex = exploded_spans(out)
    rows = ex.where(ex.doc_id == "fx-siblings-1").orderBy("span_order").collect()
    assert [(r["kind"], r["text"], r["media_ref"]) for r in rows] == [
        ("text", "a", None),
        ("media", None, "x.png"),
        ("text", "tail", None),
    ]


def test_partition_metrics_totals(extracted):
    docs, out = extracted
    m = partition_metrics(out)
    agg = m.groupBy().sum("doc_count", "error_count", "divergent_count").collect()[0]
    assert agg[0] == len(docs)
    # fixture corpus includes known error/divergent docs
    assert agg[1] > 0 and agg[2] > 0


def test_arrow_and_pandas_crossings_are_twins(spark):
    """extract_spans(use_arrow=True|False) must be bit-identical — including
    on dirty upstream rows (null doc_id / null spans / empty spans / null
    span text) and in heuristics mode."""
    from html_parser_spark.kernels.extract import ExtractOptions

    docs = _to_rows(synth_docs(150, seed=23, mega_doc_rate=0.02))
    docs += [
        (None, [{"kind": "text", "text": "<p>x</p>", "media_ref": None, "offset": 0}]),
        ("nullspans", None),
        ("emptyspans", []),
        ("nulltext", [{"kind": "text", "text": None, "media_ref": None, "offset": 0}]),
        ("nullmedia", [{"kind": "media", "text": None, "media_ref": None, "offset": 0}]),
    ]
    df = spark.createDataFrame(docs, schema=INPUT_SCHEMA)

    def key(r):
        return (
            r["doc_id"], r["status"], r["error"], r["n_spans"],
            r["n_text_chars"], r["partition_id"],
            tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in (r["spans"] or [])),
        )

    for opts in (None, ExtractOptions(mode="main")):
        for salt in (None, 8):
            a = sorted((key(r) for r in extract_spans(df, options=opts, salt_partitions=salt, use_arrow=True).collect()), key=str)
            p = sorted((key(r) for r in extract_spans(df, options=opts, salt_partitions=salt, use_arrow=False).collect()), key=str)
            assert a == p


def test_partition_id_stable_across_runs(spark, extracted):
    docs, out = extracted
    first = {r["doc_id"]: r["partition_id"] for r in out.select("doc_id", "partition_id").collect()}
    df2 = spark.createDataFrame(_to_rows(docs), schema=INPUT_SCHEMA)
    out2 = extract_spans(df2)  # no salting this time: bucket must not depend on layout
    second = {r["doc_id"]: r["partition_id"] for r in out2.select("doc_id", "partition_id").collect()}
    assert first == second

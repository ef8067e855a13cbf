"""Span-stream plugin pipeline (operators/transform.py)."""

from __future__ import annotations

import pytest

from html_parser_spark.operators.extract import INPUT_SCHEMA, extract_spans
from html_parser_spark.operators.transform import (
    drop_empty_text,
    drop_kind,
    regex_redact,
    transform_spans,
    truncate_chars,
    truncate_spans,
)


@pytest.fixture(scope="module")
def extracted(spark):
    rows = [
        ("d1", [
            {"kind": "text", "text": "<p>alpha beta</p><p>  </p>", "media_ref": None, "offset": 0},
            {"kind": "media", "text": None, "media_ref": "m.jpg", "offset": 1},
            {"kind": "text", "text": "<p>secret gamma</p>", "media_ref": None, "offset": 2},
        ]),
        ("bad", [{"kind": "text", "text": "<p>a > b</p>", "media_ref": None, "offset": 0}]),
    ]
    return extract_spans(spark.createDataFrame(rows, schema=INPUT_SCHEMA)).cache()


def _spans(df, doc_id):
    row = {r["doc_id"]: r for r in df.collect()}[doc_id]
    return [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]]


def test_chain_and_order_reassignment(extracted):
    out = transform_spans(extracted, [drop_empty_text(), drop_kind("media")])
    assert _spans(out, "d1") == [
        ("text", "alpha beta", None, 0),
        ("text", "secret gamma", None, 1),
    ]


def test_redact_and_truncate(extracted):
    out = transform_spans(
        extracted, [regex_redact(r"secret\s+\w+", "■"), truncate_spans(2)]
    )
    got = _spans(out, "d1")
    assert len(got) == 2
    assert got[0] == ("text", "alpha beta", None, 0)


def test_truncate_chars(extracted):
    out = transform_spans(extracted, [drop_kind("media"), truncate_chars(12)])
    got = _spans(out, "d1")
    texts = [t for _, t, _, _ in got]
    assert sum(len(t) for t in texts if t) == 12
    assert texts[0] == "alpha beta"  # 10 chars, second span truncated to 2


def test_error_rows_pass_through(extracted):
    out = transform_spans(extracted, [drop_kind("media")])
    row = {r["doc_id"]: r for r in out.collect()}["bad"]
    assert row["status"] == "divergent" and row["spans"] == []


def test_metrics_recomputed(extracted):
    out = transform_spans(extracted, [drop_kind("text")])
    row = {r["doc_id"]: r for r in out.collect()}["d1"]
    assert row["n_spans"] == 1 and row["n_text_chars"] == 0

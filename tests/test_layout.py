"""PDF/layout branch (operators/layout.py): routing + parse plumbing."""

from __future__ import annotations

import pytest

from html_parser_spark.operators.extract import INPUT_SCHEMA, extract_spans
from html_parser_spark.operators.layout import (
    fake_layout_parser,
    parse_layout,
    real_layout_parser,
    route_media,
)


@pytest.fixture(scope="module")
def extracted(spark):
    rows = [
        ("d1", [
            {"kind": "media", "text": None, "media_ref": "s3://x/a.pdf", "offset": 0},
            {"kind": "text", "text": "<p>hello there</p>", "media_ref": None, "offset": 1},
            {"kind": "media", "text": None, "media_ref": "s3://x/b.jpg", "offset": 2},
        ]),
        ("d2", [
            {"kind": "media", "text": None, "media_ref": "s3://x/c.DOCX", "offset": 0},
            {"kind": "media", "text": None, "media_ref": "noextension", "offset": 1},
        ]),
    ]
    return extract_spans(spark.createDataFrame(rows, schema=INPUT_SCHEMA)).cache()


def test_routing(extracted):
    layout, passthrough = route_media(extracted)
    assert {r["media_ref"] for r in layout.collect()} == {"s3://x/a.pdf", "s3://x/c.DOCX"}
    assert {r["media_ref"] for r in passthrough.collect()} == {"s3://x/b.jpg", "noextension"}


def test_layout_parse_deterministic(extracted):
    layout, _ = route_media(extracted)
    rows = parse_layout(layout).collect()
    assert rows, "layout parse produced no blocks"
    # same input -> same blocks, ordered within a ref
    again = parse_layout(layout).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    for ref in {r["media_ref"] for r in rows}:
        blocks = [r for r in rows if r["media_ref"] == ref]
        orders = sorted(r["block_order"] for r in blocks)
        assert orders == list(range(len(blocks)))
        assert fake_layout_parser(ref)  # kernel used the same fake


def test_real_parser_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_layout_parser("x.pdf")

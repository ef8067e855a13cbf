"""Multimodal binary-column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest

from html_parser_spark.operators.multimodal import (
    attach_payload,
    fake_decoder,
    media_metadata,
    real_decoder,
)


def test_metadata_kernel(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "world")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in media_metadata(attach_payload(docs)).collect()}
    for doc_id, text in ((1, "hello"), (2, "world")):
        b = hashlib.md5(text.encode()).digest()
        r = rows[str(doc_id)]
        assert r["n_bytes"] == 16
        assert r["magic"] == b[:4].hex()
        assert (r["width"], r["height"]) == (b[0], b[1])
        assert r["checksum"] == int.from_bytes(b[:4], "big")


def test_null_payload_safe(spark):
    df = spark.createDataFrame([("x", None)], "doc_id string, payload binary")
    r = media_metadata(df).collect()[0]
    assert (r["n_bytes"], r["magic"], r["checksum"]) == (0, "", 0)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decoder(b"\x89PNG")

"""WARC source (sources/warc.py): record-scanner robustness on malformed
containers (degrade-never-raise), gzip member handling, and the Spark
round trip documents -> files -> records."""

from __future__ import annotations

import gzip
import hashlib

from html_parser_spark.sources import warc as W


def _rec(url: str, payload: bytes, clen: int | None = None) -> bytes:
    clen = len(payload) if clen is None else clen
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"Content-Length: " + str(clen).encode() + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )


def test_scan_clean_file():
    blob = _rec("u/1", b"hello") + _rec("u/2", b"world")
    out = list(W._scan_records(blob))
    assert [(r[0], r[2], r[5]) for r in out] == [("u/1", 5, "ok"), ("u/2", 5, "ok")]
    assert out[0][4] == hashlib.md5(b"hello").hexdigest()


def test_scan_garbage_between_records():
    blob = b"\x00junk" + _rec("u/1", b"aa") + b"noise noise" + _rec("u/2", b"bb")
    out = list(W._scan_records(blob))
    assert [(r[0], r[5]) for r in out] == [("u/1", "ok"), ("u/2", "ok")]


def test_scan_truncated_payload_then_recovers():
    # declared length runs past EOF -> truncated_payload, no raise
    blob = _rec("u/1", b"abc", clen=50)
    out = list(W._scan_records(blob))
    assert out[0][5] == "truncated_payload"
    assert out[0][2] == 50 and out[0][3] == len(b"abc\r\n\r\n")


def test_scan_bad_header_skips_record():
    bad = b"WARC/1.0\r\nWARC-Target-URI: u/9\r\nContent-Length: nope\r\n\r\n"
    blob = bad + _rec("u/2", b"ok-payload")
    out = list(W._scan_records(blob))
    assert [(r[0], r[5]) for r in out] == [
        ("u/9", "bad_header"),
        ("u/2", "ok"),
    ]


def test_scan_missing_terminator_flagged():
    r = _rec("u/1", b"abcd")
    blob = r[:-4] + b"XXXX" + _rec("u/2", b"ee")
    out = list(W._scan_records(blob))
    assert out[0][5] == "bad_terminator"
    assert out[1][5] == "ok"


def test_scan_truncated_header_and_empty():
    assert list(W._scan_records(b"")) == []
    out = list(W._scan_records(b"WARC/1.0\r\nWARC-Type: resp"))
    assert out == [(None, None, None, None, None, "truncated_header")]


def test_gzip_member_per_record():
    # the .warc.gz layout: one gzip member PER record, concatenated
    blob = gzip.compress(_rec("u/1", b"aa")) + gzip.compress(_rec("u/2", b"bb"))
    out = list(W._scan_records(blob))
    assert [(r[0], r[5]) for r in out] == [("u/1", "ok"), ("u/2", "ok")]


def test_spark_roundtrip_and_grouping(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i}", "src") for i in range(7)],
        "doc_id bigint, text string, source string",
    )
    files = W.synth_warc_files(docs, docs_per_file=3, compress=False)
    assert files.count() == 3  # ceil(7/3)
    recs = W.warc_records(files).collect()
    assert len(recs) == 7
    assert all(r.status == "ok" for r in recs)
    got = {r.url: (r.content_length, r.payload_md5) for r in recs}
    for i in range(7):
        t = f"text number {i}"
        assert got[f"{W.URL_PREFIX}/src/{i}"] == (
            len(t),
            hashlib.md5(t.encode()).hexdigest(),
        )


def test_spark_roundtrip_gzip(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta", "s"), (2, "gamma", "s")],
        "doc_id bigint, text string, source string",
    )
    recs = W.warc_records(
        W.synth_warc_files(docs, docs_per_file=10, compress=True)
    ).collect()
    assert sorted((r.url, r.status) for r in recs) == [
        (f"{W.URL_PREFIX}/s/1", "ok"),
        (f"{W.URL_PREFIX}/s/2", "ok"),
    ]


def test_scanner_never_raises_on_garbage():
    """Degrade-never-raise: arbitrary bytes — including planted version
    markers, header fragments, and gzip magic — always scan to completion."""
    import random

    for seed in range(25):
        rng = random.Random(seed)
        chunks = []
        for _ in range(rng.randint(1, 12)):
            pick = rng.randint(0, 5)
            if pick == 0:
                chunks.append(b"WARC/1.0\r\n")
            elif pick == 1:
                chunks.append(b"Content-Length: " + str(rng.randint(-5, 99)).encode())
            elif pick == 2:
                chunks.append(b"\r\n\r\n")
            elif pick == 3:
                chunks.append(b"\x1f\x8b")
            else:
                chunks.append(bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 40))))
        blob = b"".join(chunks)
        recs = list(W._scan_records(blob))  # must not raise
        for r in recs:
            assert r[5] in (
                "ok",
                "bad_header",
                "truncated_payload",
                "truncated_header",
                "bad_terminator",
            )

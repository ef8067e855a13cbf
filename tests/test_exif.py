"""EXIF/APP1 walk (core/exif.py): synth round-trip both byte orders,
generic-parse robustness (unknown tags, truncated structures, bad offsets),
and the Spark operator's degrade rows. The closed-form field derivation is
pinned end-to-end by the multimodal_exif_meta gate oracle."""

from __future__ import annotations

import struct

from html_parser_spark.core.exif import exif_info, synth_exif_app1
from html_parser_spark.core.jpeg import synth_jpeg


def _jpeg_with(app1: bytes) -> bytes:
    jpg = synth_jpeg(8, 16, (10, 20, 30))
    return jpg[:2] + app1 + jpg[2:]


def test_roundtrip_both_byte_orders():
    for bo in ("II", "MM"):
        app1 = synth_exif_app1(
            bo, 6, "cam-ab", "2019:02:28 23:59:01",
            "S", (89, 59, 59), "W", (179, 0, 30),
        )
        d = exif_info(_jpeg_with(app1))
        assert d["byte_order"] == bo
        assert d["orientation"] == 6
        assert d["make"] == "cam-ab"
        assert d["datetime"] == "2019:02:28 23:59:01"
        assert d["lat_udeg"] == -((89 * 3600 + 59 * 60 + 59) * 1_000_000 // 3600)
        assert d["lon_udeg"] == -((179 * 3600 + 0 * 60 + 30) * 1_000_000 // 3600)
        assert d["n_ifd0"] == 4
        assert (d["width"], d["height"]) == (8, 16)


def test_no_exif_and_unparseable():
    d = exif_info(synth_jpeg(8, 8, (0, 0, 0)))
    assert d["byte_order"] is None and (d["width"], d["height"]) == (8, 8)
    assert exif_info(b"") is None
    assert exif_info(b"\x89PNG\r\n") is None


def test_truncated_and_hostile_structures_degrade():
    app1 = synth_exif_app1(
        "II", 1, "x", "2000:01:01 00:00:00", "N", (1, 2, 3), "E", (4, 5, 6)
    )
    # truncate the TIFF body progressively: must never raise
    for cut in range(10, len(app1), 7):
        seg = app1[:cut]
        body = seg[4:]
        rebuilt = app1[:2] + struct.pack(">H", len(body) + 2) + body
        exif_info(_jpeg_with(rebuilt))
    # IFD0 offset pointing past the blob -> no_exif-style nulls, no raise
    bad = bytearray(app1)
    bad[14:18] = struct.pack("<I", 10_000_000)
    d = exif_info(_jpeg_with(bytes(bad)))
    assert d["orientation"] is None
    # wrong TIFF magic -> ignored
    bad2 = bytearray(app1)
    bad2[12:14] = struct.pack("<H", 41)
    assert exif_info(_jpeg_with(bytes(bad2)))["byte_order"] is None


def test_unknown_tags_are_skipped_not_fatal():
    # hand-build an IFD0 with an unknown tag + unknown type before a real
    # orientation entry: the walker must keep what it understands
    fmt = "<"
    tiff = bytearray(b"II" + struct.pack(fmt + "HI", 42, 8))
    tiff += struct.pack(fmt + "H", 2)
    tiff += struct.pack(fmt + "HHI", 0x9999, 77, 1) + b"\x00\x00\x00\x00"
    tiff += struct.pack(fmt + "HHI", 0x0112, 3, 1) + struct.pack(fmt + "H", 8) + b"\x00\x00"
    tiff += struct.pack(fmt + "I", 0)
    body = b"Exif\x00\x00" + bytes(tiff)
    app1 = bytes([0xFF, 0xE1]) + struct.pack(">H", len(body) + 2) + body
    d = exif_info(_jpeg_with(app1))
    assert d["orientation"] == 8
    assert d["n_ifd0"] == 1  # only the understood entry counted


def test_spark_operator_outcomes(spark):
    from html_parser_spark.operators.multimodal import (
        attach_exif_jpeg,
        exif_meta_stats,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in exif_meta_stats(attach_exif_jpeg(docs)).collect()}
    assert all(r.outcome == "parsed" for r in rows.values())
    assert all(r.byte_order in ("II", "MM") for r in rows.values())
    # degrade rows: raw garbage and exif-free jpeg
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("payload", BinaryType())]
    )
    mixed = spark.createDataFrame(
        [("g", bytearray(b"not a jpeg")), ("p", bytearray(synth_jpeg(8, 8, (1, 2, 3))))],
        schema,
    )
    got = {r.doc_id: r.outcome for r in exif_meta_stats(mixed).collect()}
    assert got == {"g": "unparseable", "p": "no_exif"}


def test_gps_rational_non_unit_denominator_exact():
    """Real-corpus GPS stores sub-unit seconds as e.g. 4716/100; the udeg
    math must stay exact integer over the common denominator instead of
    flooring each component first (ADVICE r04)."""
    app1 = synth_exif_app1(
        "II", 1, "cam", "2020:01:01 00:00:00",
        "N", (40, 26, (4716, 100)), "E", ((1201, 10), 0, 0),
    )
    d = exif_info(_jpeg_with(app1))
    # floor((40*3600 + 26*60 + 47.16) * 1e6 / 3600) over exact integers
    assert d["lat_udeg"] == (40 * 3600 * 100 + 26 * 60 * 100 + 4716) * 1_000_000 // (
        3600 * 100
    )
    # floored-per-component would give 40446388 — off by 45 udeg
    assert d["lat_udeg"] == 40446433
    assert d["lon_udeg"] == 1201 * 3600 * 1_000_000 // (3600 * 10)

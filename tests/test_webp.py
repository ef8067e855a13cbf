"""WebP RIFF container (core/webp.py): synth round-trip for all three
variants, the riff_bytes closed forms the gate oracle relies on, hostile
input degradation, and the Spark operator's degrade rows. The closed-form
field derivation is pinned end-to-end by the multimodal_webp_meta gate
oracle."""

from __future__ import annotations

import struct

from html_parser_spark.core.webp import synth_webp, webp_info


def test_vp8_roundtrip_and_closed_form():
    for filler in (0, 1, 63):
        raw = synth_webp("vp8", 16127, 1, filler=filler)
        d = webp_info(raw)
        assert d["variant"] == "vp8"
        assert (d["width"], d["height"]) == (16127, 1)
        assert (d["has_alpha"], d["has_anim"], d["has_icc"]) == (0, 0, 0)
        assert d["riff_bytes"] == 30 + filler + (filler % 2) == len(raw)


def test_vp8l_roundtrip_and_closed_form():
    for alpha, filler in ((0, 0), (1, 5), (1, 62)):
        raw = synth_webp("vp8l", 640, 480, alpha=alpha, filler=filler)
        d = webp_info(raw)
        assert d["variant"] == "vp8l"
        assert (d["width"], d["height"], d["has_alpha"]) == (640, 480, alpha)
        assert d["riff_bytes"] == 25 + filler + ((5 + filler) % 2) == len(raw)


def test_vp8x_flags_and_canvas():
    raw = synth_webp(
        "vp8x", 1920, 1080, alpha=1, anim=0, exif=1, icc=0, xmp=1, filler=7
    )
    d = webp_info(raw)
    assert d["variant"] == "vp8x"
    assert (d["width"], d["height"]) == (1920, 1080)
    assert (d["has_alpha"], d["has_anim"], d["has_exif"]) == (1, 0, 1)
    assert (d["has_icc"], d["has_xmp"]) == (0, 1)
    assert d["riff_bytes"] == 48 + 7 + 1 == len(raw)


def test_degrades_never_raises():
    assert webp_info(b"") is None
    assert webp_info(b"RIFFxxxxWAVE" + b"\x00" * 20) is None  # wrong form type
    good = synth_webp("vp8", 32, 32)
    assert webp_info(good[:15]) is None  # truncated mid-header
    assert webp_info(good[:25]) is None  # truncated mid-chunk
    # corrupt the VP8 start code
    bad = bytearray(good)
    bad[23] = 0xFF
    assert webp_info(bytes(bad)) is None
    # inter frame (tag bit 0 set) is not a standalone image
    bad2 = bytearray(good)
    bad2[20] |= 1
    assert webp_info(bytes(bad2)) is None
    # VP8L with nonzero version bits
    lraw = bytearray(synth_webp("vp8l", 8, 8))
    (bits,) = struct.unpack_from("<I", lraw, 21)
    struct.pack_into("<I", lraw, 21, bits | (1 << 29))
    assert webp_info(bytes(lraw)) is None
    # unknown leading fourcc
    unk = bytearray(good)
    unk[12:16] = b"JUNK"
    assert webp_info(bytes(unk)) is None


def test_spark_operator_outcomes(spark):
    from html_parser_spark.operators.multimodal import attach_webp, webp_meta_stats

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(24)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in webp_meta_stats(attach_webp(docs)).collect()}
    assert all(r.outcome == "parsed" for r in rows.values())
    variants = {r.variant for r in rows.values()}
    assert variants == {"vp8", "vp8l", "vp8x"}  # 24 docs cycle all three
    assert all(1 <= r.width <= 16128 and 1 <= r.height <= 16128 for r in rows.values())
    # degrade rows
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("payload", BinaryType())]
    )
    mixed = spark.createDataFrame(
        [("g", bytearray(b"not a webp")), ("p", bytearray(synth_webp("vp8", 4, 4)))],
        schema,
    )
    got = {r.doc_id: r.outcome for r in webp_meta_stats(mixed).collect()}
    assert got == {"g": "unparseable", "p": "parsed"}


def test_anim_roundtrip_and_walk():
    from html_parser_spark.core.webp import webp_frames

    frames = [
        dict(x=4, y=2, w=32, h=16, duration_ms=250, blend=1, dispose=0),
        dict(x=0, y=254, w=8, h=8, duration_ms=10, blend=0, dispose=1),
        dict(x=100, y=100, w=640, h=480, duration_ms=100000, blend=1, dispose=1),
    ]
    raw = synth_webp("vp8x", 640, 480, anim=1, frames=frames, loop_count=9)
    d = webp_frames(raw)
    assert d["loop_count"] == 9
    assert d["frames"] == frames
    # the static-info walk still reads the same container's flags + canvas
    i = webp_info(raw)
    assert (i["variant"], i["has_anim"], i["width"], i["height"]) == (
        "vp8x", 1, 640, 480,
    )
    # non-animated inputs -> None; truncated ANMF ends the walk gracefully
    assert webp_frames(synth_webp("vp8l", 8, 8)) is None
    assert webp_frames(synth_webp("vp8x", 8, 8, anim=1)) is None
    cut = webp_frames(raw[: len(raw) - 30])
    assert cut is not None and len(cut["frames"]) == 2


def test_anim_spark_operator(spark):
    from html_parser_spark.operators.multimodal import (
        attach_webp_anim,
        webp_frame_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"anim text {i}") for i in range(40)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in webp_frame_stats(attach_webp_anim(docs)).collect()}
    outcomes = {r.outcome for r in rows.values()}
    assert outcomes == {"animated", "not_animated"}  # 40 docs hit both paths
    for r in rows.values():
        if r.outcome == "animated":
            assert 1 <= r.n_frames <= 4
            assert r.total_duration_ms >= 10 * r.n_frames
            assert 0 <= r.n_blend <= r.n_frames
        else:
            assert r.n_frames is None
    # unparseable degrade
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("payload", BinaryType())]
    )
    bad = spark.createDataFrame([("g", bytearray(b"junk"))], schema)
    assert webp_frame_stats(bad).collect()[0].outcome == "unparseable"


def test_fuzz_walks_degrade_never_raise():
    """Hostile-byte robustness (the core/pdf fuzz discipline): every walk
    must return a dict or None on ARBITRARY corruptions of real containers
    — a raised exception inside a mapInArrow kernel would kill the whole
    scan task at 100 TB."""
    from hypothesis import given, settings, strategies as st

    from html_parser_spark.core.webp import webp_frames

    frames = [dict(x=2, y=4, w=16, h=8, duration_ms=99, blend=1, dispose=0)]
    bases = [
        synth_webp("vp8", 100, 50, filler=9),
        synth_webp("vp8l", 33, 77, alpha=1, filler=4),
        synth_webp("vp8x", 64, 64, anim=1, frames=frames, loop_count=3),
    ]

    @settings(max_examples=200, deadline=None)
    @given(
        base=st.sampled_from(range(len(bases))),
        cut=st.integers(min_value=0, max_value=80),
        flips=st.lists(
            st.tuples(st.integers(0, 79), st.integers(0, 255)),
            max_size=6,
        ),
    )
    def run(base, cut, flips):
        raw = bytearray(bases[base])
        for pos, val in flips:
            if pos < len(raw):
                raw[pos] = val
        raw = bytes(raw[: len(raw) - cut if cut < len(raw) else 0])
        for walk in (webp_info, webp_frames):
            d = walk(raw)
            assert d is None or isinstance(d, dict)

    run()

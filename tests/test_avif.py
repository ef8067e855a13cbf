"""AVIF / ISO-BMFF container (core/avif.py): synth round-trip, the
file_bytes/mdat_bytes closed forms the gate oracle relies on, hostile
input degradation, and the Spark operator's degrade rows. The closed-form
field derivation is pinned end-to-end by the multimodal_avif_meta gate
oracle."""

from __future__ import annotations

from html_parser_spark.core.avif import avif_info, synth_avif


def test_roundtrip_and_closed_forms():
    for alpha in (0, 1):
        for filler in (0, 1, 63):
            afill = 17 if alpha else 0
            raw = synth_avif(
                4096, 1, bit_depth=10, rotation=3, alpha=alpha,
                filler=filler, alpha_filler=afill,
            )
            d = avif_info(raw)
            assert d["brand"] == "avif" and d["codec"] == "av01"
            assert (d["width"], d["height"], d["bit_depth"]) == (4096, 1, 10)
            assert (d["rotation"], d["n_items"], d["has_alpha"]) == (
                3, 1 + alpha, alpha,
            )
            expect = (348 + filler + afill) if alpha else (252 + filler)
            assert d["file_bytes"] == expect == len(raw)
            assert d["mdat_bytes"] == filler + afill


def test_degrades_never_raises():
    assert avif_info(b"") is None
    # mp4-style ftyp with a non-avif brand
    assert avif_info(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16) is None
    good = synth_avif(320, 240, alpha=1, filler=12, alpha_filler=3)
    # truncation at every offset: a dict with degraded fields or None,
    # never a raise (mapInArrow kernels must not kill the scan task)
    for cut in range(len(good)):
        d = avif_info(good[:cut])
        assert d is None or isinstance(d, dict)
    # leading box must be ftyp
    not_ftyp = bytearray(good)
    not_ftyp[4:8] = b"free"
    assert avif_info(bytes(not_ftyp)) is None
    # a box size pointing past the buffer ends the walk, never reads OOB
    oversize = bytearray(good)
    oversize[0:4] = (1 << 24).to_bytes(4, "big")
    assert avif_info(bytes(oversize)) is None


def test_fuzz_walk_degrades_never_raises():
    from hypothesis import given, settings, strategies as st

    bases = [
        synth_avif(100, 50, filler=9),
        synth_avif(33, 77, bit_depth=12, rotation=1, alpha=1,
                   filler=4, alpha_filler=31),
    ]

    @settings(max_examples=200, deadline=None)
    @given(
        base=st.sampled_from(range(len(bases))),
        cut=st.integers(min_value=0, max_value=80),
        flips=st.lists(
            st.tuples(st.integers(0, 120), st.integers(0, 255)), max_size=6
        ),
    )
    def run(base, cut, flips):
        raw = bytearray(bases[base])
        for pos, val in flips:
            if pos < len(raw):
                raw[pos] = val
        raw = bytes(raw[: len(raw) - cut if cut < len(raw) else 0])
        d = avif_info(raw)
        assert d is None or isinstance(d, dict)

    run()


def test_spark_operator_outcomes(spark):
    from html_parser_spark.operators.multimodal import attach_avif, avif_meta_stats

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(24)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in avif_meta_stats(attach_avif(docs)).collect()}
    assert all(r.outcome == "parsed" for r in rows.values())
    assert {r.has_alpha for r in rows.values()} == {0, 1}
    assert {r.bit_depth for r in rows.values()} == {8, 10, 12}
    for r in rows.values():
        assert r.brand == "avif" and r.codec == "av01"
        assert r.n_items == 1 + r.has_alpha
        assert r.file_bytes - r.mdat_bytes == (252 if r.has_alpha == 0 else 348)
    # degrade rows
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("payload", BinaryType())]
    )
    mixed = spark.createDataFrame(
        [("g", bytearray(b"not an avif")),
         ("p", bytearray(synth_avif(4, 4, filler=2)))],
        schema,
    )
    got = {r.doc_id: r.outcome for r in avif_meta_stats(mixed).collect()}
    assert got == {"g": "unparseable", "p": "parsed"}

"""int8 scalar quantization + symmetric quantized ANN
(functions/similarity.quantize_int8 / quantized_topk)."""

from __future__ import annotations

import math

from html_parser_spark.functions import similarity as SIM


def _embs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quantize_roundtrip_bound_and_saturation(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 0.125]),
        (1, [3.0, 3.0, -3.0, 0.0]),
        (2, [1e-6, -1e-6, 0.0, 1e-6]),
    ]
    got = {r.vec_id: r for r in SIM.quantize_int8(_embs(spark, rows)).collect()}
    for vid, emb in [(r[0], r[1]) for r in rows]:
        q = got[vid]
        mx = max(abs(x) for x in emb)
        assert math.isclose(q.scale, mx / 127.0)
        # round-half-up within half a quantization step everywhere
        for v, c in zip(emb, q.codes):
            assert abs(c * q.scale - v) <= q.scale / 2 + 1e-15
        # the max-magnitude component saturates to exactly +/-127
        assert max(abs(c) for c in q.codes) == 127
    # n_sat in the gate projection counts these; doc 1 has three at max
    assert sum(1 for c in got[1].codes if abs(c) == 127) == 3


def test_quantize_zero_vector_no_nan(spark):
    got = SIM.quantize_int8(_embs(spark, [(0, [0.0, 0.0, 0.0])])).collect()[0]
    assert got.scale == 0.0
    assert list(got.codes) == [0, 0, 0]
    assert got.code_hash == 0


def test_code_hash_pins_element_order(spark):
    a = SIM.quantize_int8(_embs(spark, [(0, [1.0, 0.5, 0.25])])).collect()[0]
    b = SIM.quantize_int8(_embs(spark, [(0, [0.25, 0.5, 1.0])])).collect()[0]
    assert a.code_hash != b.code_hash  # same multiset, different order


def test_quantized_topk_ranks_neighbors_like_cosine(spark):
    # vec 0 (query) is nearly parallel to 10, orthogonal-ish to 11
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (10, [0.99, 0.01, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0]),
        (12, [0.7, 0.7, 0.0, 0.0]),
    ]
    got = SIM.quantized_topk(_embs(spark, rows), n_queries=1, k=3).collect()
    order = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)]
    assert order == [10, 12, 11]
    top = next(r for r in got if r.neighbor_id == 10)
    assert top.qcos > 0.999

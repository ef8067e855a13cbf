"""Deterministic HLL sketch (functions/sketch.py) vs an exact Python
mirror, plus accuracy sanity on both estimator branches."""

from __future__ import annotations

import hashlib
import math

from html_parser_spark.functions import sketch as SK


def _mirror(keys):
    """Python re-implementation of the register fold (spec in sketch.py)."""
    M = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        reg = int(h[:2], 16)
        bits = bin(int(h[2:16], 16))[2:].zfill(56)
        rho = 57 if "1" not in bits else bits.index("1") + 1
        M[reg] = max(M.get(reg, 0), min(rho, SK.RHO_CAP))
    s = sum(1 << (SK.RHO_CAP - M.get(j, 0)) for j in range(256))
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 256.0 * 256.0 * float(1 << SK.RHO_CAP) / float(s)
    v = 256 - len(M)
    est = 256.0 * math.log(256.0 / v) if (raw <= 640.0 and v > 0) else raw
    return len(M), v, s, raw, round(est)


def test_hll_matches_python_mirror_small_and_large(spark):
    for n in (5, 300, 5000):  # linear-counting regime and raw-HLL regime
        df = spark.range(n).selectExpr("concat('key-', id) as k")
        got = SK.hll_distinct(df, "k").collect()[0]
        n_reg, v, s, raw, est = _mirror(f"key-{i}" for i in range(n))
        assert (got.n_reg, got.v_zero, got.s_fold) == (n_reg, v, s)
        assert got.raw_est == raw  # bit-exact pure arithmetic
        assert got.est_rounded == est
        assert got.exact_distinct == n
        # estimator sanity: within 10% at these cardinalities (m=256)
        assert abs(got.est_rounded - n) / n < 0.10


def test_hll_grouped_and_duplicate_invariance(spark):
    df = spark.createDataFrame(
        [(g, i % 40) for g in ("a", "b") for i in range(500)], "g string, u long"
    )
    got = {r.g: r for r in SK.hll_distinct(df, "cast(u as string)", ["g"]).collect()}
    ref = _mirror(range(40))
    for g in ("a", "b"):
        assert got[g].exact_distinct == 40
        assert (got[g].n_reg, got[g].v_zero, got[g].s_fold) == ref[:3]
        assert got[g].est_rounded == ref[4]  # duplicates never move registers


def test_hll_partial_aggregation_in_plan(spark):
    df = spark.range(100).selectExpr("cast(id as string) as k")
    plan = (
        SK.hll_distinct(df, "k", with_exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stage-1 max(rho) must run map-side (partial_max before the Exchange)
    assert "partial_max" in plan or "partial" in plan.lower()

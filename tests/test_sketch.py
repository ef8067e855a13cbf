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


def _cm_mirror(occurrences, probes, d=4, w_hex=1):
    cells = {}
    for t in occurrences:
        h_all = [
            int(hashlib.md5(f"{t}#{i}".encode()).hexdigest()[:w_hex], 16)
            for i in range(d)
        ]
        for i, b in enumerate(h_all):
            cells[(i, b)] = cells.get((i, b), 0) + 1
    out = {}
    for t in probes:
        out[t] = min(
            cells.get(
                (i, int(hashlib.md5(f"{t}#{i}".encode()).hexdigest()[:w_hex], 16)),
                0,
            )
            for i in range(d)
        )
    return out


def test_countmin_matches_mirror_and_overestimates(spark):
    from collections import Counter

    words = (["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 10
             + [f"w{i}" for i in range(40) for _ in (0, 1)])
    df = spark.createDataFrame([(w,) for w in words], "term string")
    cells = SK.countmin_cells(df, "term")
    exact = Counter(words)
    probes = spark.createDataFrame(
        [(t, c) for t, c in exact.items()], "term string, exact long"
    )
    got = {r.term: r for r in SK.countmin_estimate(cells, probes).collect()}
    mirror = _cm_mirror(words, list(exact))
    assert set(got) == set(exact)
    for t, c in exact.items():
        assert got[t].est == mirror[t]  # cell-exact vs the Python mirror
        assert got[t].est >= c  # the CM guarantee: never underestimates
    # with 43 terms in 16 buckets collisions are forced: some term must
    # genuinely overestimate, or the test is vacuous
    assert any(got[t].est > c for t, c in exact.items())


def _bloom_mirror(build_keys, probe_keys, k=4, m=960, bits=60):
    words = {}
    def positions(t):
        return [
            int(hashlib.md5(f"{t}@{i}".encode()).hexdigest()[:3], 16) % m
            for i in range(k)
        ]
    for t in build_keys:
        for p in positions(t):
            words[p // bits] = words.get(p // bits, 0) | (1 << (p % bits))
    return {
        t: int(all((words.get(p // bits, 0) >> (p % bits)) & 1 for p in positions(t)))
        for t in probe_keys
    }


def test_bloom_no_false_negatives_and_mirror_exact(spark):
    members = [f"key-{i}" for i in range(150)]
    outsiders = [f"other-{i}" for i in range(200)]
    bloom = SK.bloom_build(
        spark.createDataFrame([(t,) for t in members], "g string"), "g"
    )
    probes = spark.createDataFrame(
        [(t,) for t in members + outsiders], "g string"
    )
    got = {r.g: r.bloom_hit for r in SK.bloom_probe(probes, "g", bloom).collect()}
    mirror = _bloom_mirror(members, members + outsiders)
    assert got == mirror  # word-for-word identical to the Python fold
    assert all(got[t] == 1 for t in members)  # never a false negative
    fp = sum(got[t] for t in outsiders)
    assert 0 < fp < len(outsiders)  # collisions happen, but not saturation


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    import math

    rows = [("g", i, float(v)) for i, v in enumerate(
        [x * 0.37 for x in range(500)]  # cents 0..18463
    )]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    got = SK.histogram_quantiles(
        df, "cast(round(value * 100) as bigint)", ["event_type"]
    ).collect()[0]
    cents = sorted(round(v * 100) for _, _, v in rows)
    n = len(cents)
    assert got.n == n
    for p, col in ((500, got.hq500_cents), (900, got.hq900_cents), (990, got.hq990_cents)):
        exact = cents[math.ceil(p * n / 1000) - 1]
        assert exact < col <= exact + 2 * SK.HIST_BIN_CENTS  # upper edge bound
        assert col % SK.HIST_BIN_CENTS == 0


def test_histogram_quantiles_clamps_overflow_bin(spark):
    df = spark.createDataFrame(
        [("g", i, 5000.0) for i in range(10)],  # 500000 cents >> range
        "event_type string, event_id long, value double",
    )
    got = SK.histogram_quantiles(
        df, "cast(round(value * 100) as bigint)", ["event_type"]
    ).collect()[0]
    assert got.hq500_cents == SK.HIST_N_BINS * SK.HIST_BIN_CENTS  # last bin edge

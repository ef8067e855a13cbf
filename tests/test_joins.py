"""As-of join and banded range join (functions/joins.py) vs brute-force
Python mirrors, including the edges the gate data can't produce
(equal-ts match, tolerance expiry, empty right key)."""

from __future__ import annotations

import datetime as dt

from html_parser_spark.functions import joins as J


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _df(spark, rows, schema="k long, ts timestamp, v long"):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_basic_and_equal_ts(spark):
    left = _df(spark, [(1, _t(10), 100), (1, _t(20), 101), (2, _t(5), 102)])
    right = _df(
        spark,
        [
            (1, _t(10), 7),   # equal ts -> must match left (1, t10)
            (1, _t(15), 8),
            (2, _t(9), 9),    # after the only left row for k=2 -> no match
        ],
    )
    got = {
        (r.k, r.ts.second): r
        for r in J.asof_join(left, right, on="k").collect()
    }
    assert got[(1, 10)].asof_v == 7 and got[(1, 10)].asof_ts == _t(10)
    assert got[(1, 20)].asof_v == 8  # latest <= 20 is t15, not t10
    assert got[(2, 5)].asof_v is None and got[(2, 5)].asof_ts is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _df(spark, [(1, _t(30), 0), (1, _t(31), 0)])
    right = _df(spark, [(1, _t(10), 5), (1, _t(29), 6)])
    got = {
        r.ts.second: r
        for r in J.asof_join(left, right, on="k", tolerance_secs=2).collect()
    }
    assert got[30].asof_v == 6  # 1s old, within tolerance
    # drop the right rows and re-check expiry: latest for t31 is 2s old (keep),
    # but a 21s-old match must null out
    left2 = _df(spark, [(1, _t(50), 0)])
    got2 = J.asof_join(left2, right, on="k", tolerance_secs=2).collect()[0]
    assert got2.asof_v is None and got2.asof_ts is None
    assert got[31].asof_v == 6


def test_asof_matches_bruteforce(spark):
    import itertools

    lrows = [(k, _t(s), s) for k, s in itertools.product([1, 2, 3], range(0, 50, 7))]
    rrows = [(k, _t(s), 10 * s) for k, s in itertools.product([1, 2], range(3, 50, 5))]
    got = {
        (r.k, r.ts): (r.asof_ts, r.asof_v)
        for r in J.asof_join(
            _df(spark, lrows), _df(spark, rrows), on="k"
        ).collect()
    }
    for k, lts, _ in lrows:
        cand = [(rts, v) for rk, rts, v in rrows if rk == k and rts <= lts]
        want = max(cand) if cand else (None, None)
        assert got[(k, lts)] == want


def test_range_join_count_matches_bruteforce(spark):
    import itertools

    lrows = [(k, _t(s), s) for k, s in itertools.product([1, 2], range(0, 59, 3))]
    rrows = [(k, _t(s), 0) for k, s in itertools.product([1, 3], range(1, 59, 2))]
    got = {
        (r.k, r.ts): r.n_in_range
        for r in J.range_join_count(
            _df(spark, lrows), _df(spark, rrows), on="k", window_secs=7
        ).collect()
    }
    assert len(got) == len(lrows)  # every left row kept
    for k, lts, _ in lrows:
        want = sum(
            1
            for rk, rts, _ in rrows
            if rk == k and dt.timedelta(0) <= lts - rts <= dt.timedelta(seconds=7)
        )
        assert got[(k, lts)] == want
    # k=2 has no right rows at all -> all zeros, still present
    assert all(v == 0 for (k, _), v in got.items() if k == 2)


def test_range_join_count_keeps_duplicate_left_rows(spark):
    # two IDENTICAL left rows must each produce their own output row with
    # the true count — not collapse into one row with a doubled count
    # (ADVICE r03: the old form grouped on the left column values)
    lrows = [(1, _t(10), 0), (1, _t(10), 0), (1, _t(40), 0)]
    rrows = [(1, _t(8), 0), (1, _t(9), 0)]
    out = J.range_join_count(
        _df(spark, lrows), _df(spark, rrows), on="k", window_secs=7
    ).collect()
    assert len(out) == 3
    counts = sorted(r.n_in_range for r in out)
    assert counts == [0, 2, 2]


def test_asof_plan_has_single_exchange(spark):
    left = _df(spark, [(1, _t(10), 0)])
    right = _df(spark, [(1, _t(5), 1)])
    plan = (
        J.asof_join(left, right, on="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # the window shuffle only

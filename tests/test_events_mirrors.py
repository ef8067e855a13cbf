"""Seeded-random cross-checks for the windowed event analytics whose
semantics have edge cases a fixture can miss: the greedy-earliest funnel
(stage anchoring, 7-day windows, missing stages) and the carry-forward
gap-fill (gap runs, single-hour users) against plain-Python mirrors.

The gate queries read parquet dirs, so the mirrors drive the same LOGIC
through equivalent local DataFrames built from the random corpus."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

WEEK = 7 * 86400


def _events(seed, n_users=25, n_events=400):
    rng = random.Random(seed)
    rows = []
    for eid in range(n_events):
        rows.append(
            (
                eid,
                rng.randrange(n_users),
                rng.choice(["signup", "click", "purchase", "view"]),
                rng.randrange(0, 30 * 86400),  # seconds over a month
            )
        )
    return rows


def _funnel_mirror(rows):
    by_user = {}
    for eid, u, t, ts in rows:
        by_user.setdefault(u, []).append((t, ts))
    out = {}
    for u, evs in by_user.items():
        s1 = min((ts for t, ts in evs if t == "signup"), default=None)
        s2 = (
            min(
                (
                    ts
                    for t, ts in evs
                    if t == "click" and s1 is not None and s1 <= ts <= s1 + WEEK
                ),
                default=None,
            )
            if s1 is not None
            else None
        )
        s3 = (
            min(
                (
                    ts
                    for t, ts in evs
                    if t == "purchase" and s2 is not None and s2 <= ts <= s2 + WEEK
                ),
                default=None,
            )
            if s2 is not None
            else None
        )
        stage = 3 if s3 is not None else 2 if s2 is not None else 1 if s1 is not None else 0
        out[u] = (s1, s2, s3, stage)
    return out


def test_funnel_logic_matches_mirror(spark):
    for seed in (2, 13):
        rows = _events(seed)
        df = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, event_type string, tsec bigint"
        )
        wn = Window.partitionBy("user_id")
        s1 = df.withColumn(
            "s1", F.expr("min(case when event_type = 'signup' then tsec end)").over(wn)
        )
        s2 = s1.withColumn(
            "s2",
            F.expr(
                "min(case when event_type = 'click' and tsec >= s1 "
                f"and tsec <= s1 + {WEEK} then tsec end)"
            ).over(wn),
        )
        s3 = s2.withColumn(
            "s3",
            F.expr(
                "min(case when event_type = 'purchase' and tsec >= s2 "
                f"and tsec <= s2 + {WEEK} then tsec end)"
            ).over(wn),
        )
        got = {
            r.user_id: (r.s1, r.s2, r.s3)
            for r in s3.groupBy("user_id")
            .agg(F.min("s1").alias("s1"), F.min("s2").alias("s2"), F.min("s3").alias("s3"))
            .collect()
        }
        mirror = _funnel_mirror(rows)
        assert got == {u: v[:3] for u, v in mirror.items()}, f"seed {seed}"


def _gapfill_mirror(rows):
    """rows: (user, hr, cents). Mirror of the q_events_gapfill fold."""
    by_user = {}
    for u, hr, c in rows:
        agg = by_user.setdefault(u, {})
        n, tot = agg.get(hr, (0, 0))
        agg[hr] = (n + 1, tot + c)
    out = {}
    for u, hours in by_user.items():
        lo, hi = min(hours), max(hours)
        last = None
        for h in range(lo, hi + 1):
            if h in hours:
                n, tot = hours[h]
                last = tot
                out[(u, h)] = (n, last, 0)
            else:
                out[(u, h)] = (0, last, 1)
    return out


def test_gapfill_fold_matches_mirror(spark):
    for seed in (4, 21):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(6), rng.randrange(100), rng.randrange(-50, 200))
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "user_id bigint, hr bigint, cents bigint")
        hourly = (
            df.repartition("user_id")
            .groupBy("user_id", "hr")
            .agg(F.count("*").alias("n_events"), F.expr("cast(sum(cents) as bigint)").alias("cents"))
        )
        packed = hourly.groupBy("user_id").agg(
            F.expr("array_sort(collect_list(struct(hr, n_events, cents)))").alias("obs")
        )
        fill = """
          flatten(zip_with(obs, slice(obs, 2, size(obs)), (a, b) ->
            transform(sequence(a.hr, coalesce(b.hr, a.hr + 1) - 1), h ->
              struct(h as hr,
                     case when h = a.hr then a.n_events else 0L end as n_events,
                     a.cents as value_cents_filled,
                     cast(h <> a.hr as int) as is_gap))))
        """
        got = {
            (r.user_id, r.hr): (r.n_events, r.value_cents_filled, r.is_gap)
            for r in packed.select("user_id", F.explode(F.expr(fill)).alias("c"))
            .select("user_id", "c.*")
            .collect()
        }
        assert got == _gapfill_mirror(rows), f"seed {seed}"

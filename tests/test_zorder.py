"""Z-order layout (functions/zorder.py): Morton-key correctness vs a
Python mirror and the actual pruning benefit vs a one-column sort."""

from __future__ import annotations

from html_parser_spark.functions import zorder as ZO


def _morton(a, b, bits=16):
    a, b = min(a, (1 << bits) - 1), min(b, (1 << bits) - 1)
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_mirror(spark):
    rows = [(i, a, b) for i, (a, b) in enumerate(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (70000, 3), (12345, 54321)]
    )]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r.id: r.k for r in df.selectExpr(
        "id", ZO.zorder_key_expr("a", "b") + " as k"
    ).collect()}
    for i, a, b in rows:
        assert got[i] == _morton(a, b)


def test_zorder_prunes_better_than_single_column_sort(spark):
    # grid data: 64 users x 64 time slots -> both dims uniformly spread
    rows = [(u * 64 + t, u, t) for u in range(64) for t in range(64)]
    df = spark.createDataFrame(rows, "event_id long, user long, slot long")
    z = ZO.zorder_bucket_stats(df, "user", "slot", "event_id", n_buckets=16)
    z.cache()
    assert z.count() == 16
    assert sum(r.n for r in z.collect()) == 64 * 64
    # a point predicate on EITHER dim touches a strict subset of buckets
    hits_user = ZO.buckets_hit(z, "a", 7)
    hits_slot = ZO.buckets_hit(z, "b", 7)
    assert hits_user < 16 and hits_slot < 16
    # the one-column layout (sort by user only) cannot prune on slot at all
    from pyspark.sql import Window, functions as F

    w = Window.orderBy("user", "event_id")
    ucked = (
        df.withColumn("_rn", F.row_number().over(w))
        .selectExpr("user", "slot", "cast(((_rn - 1) * 16) div 4096 as int) as bucket")
        .groupBy("bucket")
        .agg(F.min("slot").alias("min_b"), F.max("slot").alias("max_b"))
    )
    naive_hits = ucked.where((F.col("min_b") <= 7) & (F.col("max_b") >= 7)).count()
    assert naive_hits == 16  # user-sorted layout: every bucket spans all slots
    assert hits_slot <= naive_hits // 2  # z-order at least halves it

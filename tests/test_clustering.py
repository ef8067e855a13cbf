"""Fixed-round Lloyd k-means (functions/clustering.py): hand-checkable
geometry, the empty-cluster carryover rule, and oracle-SQL equivalence on
a seeded random corpus (the gate re-checks on the real tables)."""

from __future__ import annotations

import duckdb

from html_parser_spark.functions.clustering import (
    kmeans_assign,
    kmeans_oracle_sql,
)


def _embs(spark, rows, dim):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separated_clusters(spark):
    lo = [0.0, 0.0, 0.0, 0.0]
    hi = [10.0, 10.0, 10.0, 10.0]
    rows = [(0, lo), (1, hi)] + [
        (i, [v + 0.25 * (i % 3) for v in (lo if i % 2 == 0 else hi)])
        for i in range(2, 12)
    ]
    got = {
        r.vec_id: r
        for r in kmeans_assign(_embs(spark, rows, 4), k=2, n_iter=2, dim=4).collect()
    }
    for i, _ in rows:
        assert got[i].cluster == (0 if i % 2 == 0 else 1)
    assert got[0].dist < 1e9  # squared-distance in the x1000 space


def test_kmeans_duplicate_seeds_empty_cluster_carryover(spark):
    # seeds 0 and 1 are identical: every point tie-breaks to cid 0, cluster 1
    # goes empty and must KEEP its seed centroid (not NaN/vanish)
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)]
    got = kmeans_assign(_embs(spark, rows, 4), k=2, n_iter=2, dim=4).collect()
    assert len(got) == 6
    assert all(r.cluster == 0 and r.dist == 0.0 for r in got)


def test_kmeans_matches_oracle_on_seeded_corpus(spark):
    import random

    import numpy as np

    rng = random.Random(7)
    # rows flow to Spark as array<float>; the oracle table must hold the
    # SAME f32-rounded values or round(x*1000) ties flip at the .5 edge
    rows = [
        (i, [float(np.float32(rng.uniform(-1, 1))) for _ in range(8)])
        for i in range(60)
    ]
    spark_out = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in kmeans_assign(_embs(spark, rows, 8), k=4, n_iter=2, dim=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT "
        "UNNEST(range(60)) AS vec_id, UNNEST($vecs) AS embedding",
        {"vecs": [v for _, v in rows]},
    )
    duck_out = sorted(
        tuple(t) for t in con.execute(
            kmeans_oracle_sql(k=4, n_iter=2, dim=8)
        ).fetchall()
    )
    assert spark_out == duck_out  # bit-exact, including dist doubles

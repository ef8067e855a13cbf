"""Distributed k-means over the embedding corpus — the ITERATIVE-algorithm
shape (fixed-round Lloyd iterations) expressed as pure DataFrame ops, with
every arithmetic step engine-portable so an ANSI-SQL oracle reproduces the
assignments BIT-EXACTLY (most engines can only property-test k-means; this
one is gate-hashable).

Determinism recipe (each step is exact or a single IEEE op):
  1. coordinates quantize to integer-VALUED doubles: round(x * 1000) —
     f32->f64 is exact, one IEEE multiply, one tie-away-from-zero round
     (identical in Spark and DuckDB).
  2. centroid update sums integer-valued doubles — every partial sum is
     exact (magnitudes << 2^53), so Spark's partition-order-dependent SUM
     equals any other order; the mean is ONE division of exact inputs.
  3. distance is a LEFT FOLD of (x-c)^2 over the 64 dims (aggregate/
     zip_with on Spark, list_reduce/list_transform in the oracle) — the
     identical operation sequence, hence identical last-ulp results.
  4. argmin tie-breaks on (dist, cid) — total order, no engine choice.

Scale posture: seeds/centroids are k rows — collapsed into ONE broadcast
array row for the assignment step, whose argmin is a ROW-LOCAL
array_min-over-structs expression (no window, no k-fold row expansion —
the corpus NEVER shuffles); the update is a map-side-combinable
groupBy(cid) over 64 per-dim sums (k x 64 numbers of state per
executor). Per iteration the corpus is read once and shuffles only the
k x 64 partials. Fixed iteration count keeps the plan finite (lineage
grows per round — at production depth, localCheckpoint per round like
functions/dedup.connected_components). Seeds are the first k vec_ids
(deterministic); k-means|| sampling would slot in as a seed provider.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K_DEFAULT = 8
SCALE = 1000.0

SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, c) -> (x - c) * (x - c)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def quantized_vectors(embs: DataFrame, col: str = "embedding") -> DataFrame:
    """(vec_id, codes array<double>) with integer-valued coordinates
    round(x * 1000) — the exactness foundation (module docstring #1)."""
    return embs.select(
        "vec_id",
        F.expr(
            f"transform({col}, x -> round(cast(x as double) * {SCALE}d))"
        ).alias("codes"),
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: the k centroids collapse into ONE
    broadcast array row, and the argmin is a ROW-LOCAL expression —
    array_min over struct(dist, cid), whose lexicographic struct ordering
    IS the (dist, cid) tie-break the oracle's row_number uses. No k-fold
    row expansion, no window, no per-round corpus Exchange (the previous
    window form shuffled the k-expanded corpus on vec_id every round —
    3 corpus shuffles per kmeans call; this form has zero)."""
    carr = cents.agg(F.collect_list(F.struct("cid", "cent")).alias("cs"))
    best = (
        "array_min(transform(cs, c -> struct("
        + SQDIST.format(a="codes", b="c.cent")
        + " as dist, c.cid as cid)))"
    )
    return (
        vecs.crossJoin(F.broadcast(carr))
        .select("vec_id", "codes", F.expr(best).alias("_b"))
        .select(
            "vec_id", "codes", F.col("_b.cid").alias("cid"),
            F.col("_b.dist").alias("dist"),
        )
    )


def _update(assigned: DataFrame, seeds: DataFrame, dim: int) -> DataFrame:
    """New centroids = per-dim mean of members (exact-int sums, one
    division); clusters that lost every member keep their previous
    centroid (deterministic, mirrors the oracle's LEFT JOIN)."""
    sums = assigned.groupBy("cid").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.element_at("codes", d + 1)).alias(f"s{d}")
            for d in range(dim)
        ],
    )
    new_cent = sums.select(
        "cid",
        F.array(
            *[F.col(f"s{d}") / F.col("n").cast("double") for d in range(dim)]
        ).alias("new_cent"),
    )
    # broadcast: both sides are k rows, but without the hint the planner
    # saw unsized aggregation outputs and planned a SortMergeJoin per round
    # (two sort stages over 8 rows — pure plan-depth cost, VERDICT r03 #4)
    return seeds.join(F.broadcast(new_cent), on="cid", how="left").select(
        "cid", F.coalesce("new_cent", "cent").alias("cent")
    )


def kmeans_assign(
    embs: DataFrame, k: int = K_DEFAULT, n_iter: int = 2, dim: int = 64
) -> DataFrame:
    """Fixed-round Lloyd k-means; returns the FINAL assignment
    (vec_id, cluster int, dist double) after `n_iter` update rounds —
    dist is the squared distance in the quantized (x1000) space."""
    from .dedup import _unpersist_with

    # persisted: every iteration's assignment pass re-reads the vectors
    # (n_iter + 1 passes); without the cache each pass re-scans the source
    # and re-quantizes. Released when the result is garbage-collected.
    vecs = quantized_vectors(embs).persist()
    cents = vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("codes").alias("cent")
    )
    for _ in range(n_iter):
        assigned = _assign(vecs, cents)
        cents = _update(assigned, cents, dim)
    final = _assign(vecs, cents)
    return _unpersist_with(
        final.select("vec_id", F.col("cid").alias("cluster"), "dist"), vecs
    )


def kmeans_chain_sql(
    k: int = K_DEFAULT,
    n_iter: int = 2,
    dim: int = 64,
    source: str = "embeddings",
    final_name: str = "asg",
) -> str:
    """DuckDB mirror of kmeans_assign as a composable WITH-chain ending in
    CTE `final_name` (vec_id, cluster INTEGER, dist DOUBLE). The final CTE
    is MATERIALIZED (the CLAUDE.md re-expansion invariant: a consumer that
    references it twice — e.g. semantic_dedup's pair self-join — must not
    replay the whole iteration chain per reference)."""
    sq = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (acc, v) -> acc + v)"
    )
    sums = ", ".join(f"SUM(codes[{d + 1}]) AS s{d}" for d in range(dim))
    means = ", ".join(f"m.s{d} / CAST(m.n AS DOUBLE)" for d in range(dim))
    sql = f"""
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding,
                     x -> round(CAST(x AS DOUBLE) * {SCALE}e0)) AS codes
          FROM {source}
        ), c0 AS (
          SELECT CAST(vec_id AS INTEGER) AS cid, codes AS cent
          FROM v WHERE vec_id < {k}
        )"""
    prev = "c0"
    for it in range(n_iter):
        d = sq.format(a="v.codes", b="c.cent")
        sql += f""", a{it} AS (
          SELECT * FROM (
            SELECT v.vec_id, v.codes, c.cid, {d} AS dist,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY {d}, c.cid) AS rk
            FROM v, {prev} c
          ) WHERE rk = 1
        ), m{it} AS (
          SELECT cid, COUNT(*) AS n, {sums} FROM a{it} GROUP BY cid
        ), c{it + 1} AS (
          SELECT s.cid,
                 CASE WHEN m.cid IS NULL THEN s.cent
                      ELSE [{means}] END AS cent
          FROM {prev} s LEFT JOIN m{it} m USING (cid)
        )"""
        prev = f"c{it + 1}"
    d = sq.format(a="v.codes", b="c.cent")
    sql += f""", {final_name} AS MATERIALIZED (
        SELECT vec_id, CAST(cid AS INTEGER) AS cluster, dist FROM (
          SELECT v.vec_id, c.cid, {d} AS dist,
                 row_number() OVER (PARTITION BY v.vec_id
                                    ORDER BY {d}, c.cid) AS rk
          FROM v, {prev} c
        ) WHERE rk = 1
        )"""
    return sql


def kmeans_oracle_sql(k: int = K_DEFAULT, n_iter: int = 2, dim: int = 64) -> str:
    """DuckDB mirror of kmeans_assign (same ops in the same order)."""
    return (
        kmeans_chain_sql(k, n_iter, dim)
        + "\n        SELECT vec_id, cluster, dist FROM asg\n    "
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication via cluster-blocked cosine
# ---------------------------------------------------------------------------

SEM_MIN_COS = 0.999


def semantic_dedup(
    embs: DataFrame,
    k: int = K_DEFAULT,
    n_iter: int = 2,
    dim: int = 64,
    min_cos: float = SEM_MIN_COS,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): k-means the embedding
    corpus, compare pairs ONLY within a cluster, call cos >= min_cos a
    semantic duplicate, and within each duplicate pair KEEP the member
    farther from its centroid (the paper's low-centroid-similarity keep
    rule — it preserves the cluster's outskirts, dropping redundant
    near-centroid mass). Ties on distance keep the smaller vec_id.

    Returns one row per input vector:
      (vec_id, cluster int, dist double, n_dups int, keep int)
    n_dups = how many same-cluster vectors sit within min_cos of this one;
    keep = 0 iff some duplicate pair elected this vector its loser.

    Every arithmetic step is engine-portable (quantized kmeans + left-fold
    cosine), so the SQL oracle reproduces keep decisions bit-exactly.

    Scale posture: clustering is the blocker — the pair join shuffles on
    cluster id and is quadratic ONLY within a cluster, which is the
    algorithm's stated cost; k is the knob (k ~ n / desired_cluster_size
    at production scale, e.g. ~100k clusters for web corpora — the paper
    uses the same regime; AQE skew-join splits any runaway cluster). The
    corpus-side join of assignments back to embeddings is one
    co-partitioned shuffle; everything downstream touches only pairs."""
    from .dedup import _DOT, _NORM2, _unpersist_with

    assigned = kmeans_assign(embs, k, n_iter, dim)
    # persisted: the pair step reads base twice (self-join) and the final
    # keep projection a third time; released with the result (weakref)
    base = assigned.join(embs.select("vec_id", "embedding"), "vec_id").persist()

    a, b = base.alias("a"), base.alias("b")
    dot = _DOT.format(a="a.embedding", b="b.embedding")
    na2 = _NORM2.format(a="a.embedding")
    nb2 = _NORM2.format(a="b.embedding")
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.col("a.dist").alias("da"),
            F.col("b.dist").alias("db"),
            F.expr(f"{dot} / (sqrt({na2}) * sqrt({nb2}))").alias("cos"),
        )
        .where(F.col("cos") >= min_cos)
    )
    # per-vector duplicate stats: one explode of the (small) pair set —
    # loser = the near-centroid member (drop), ties drop the larger id
    loser = (
        "case when da < db then va when db < da then vb "
        "else greatest(va, vb) end"
    )
    stats = (
        pairs.selectExpr(
            f"explode(array(struct(va as vec_id, "
            f"case when {loser} = va then 1 else 0 end as lost), "
            f"struct(vb as vec_id, "
            f"case when {loser} = vb then 1 else 0 end as lost))) as s"
        )
        .select("s.vec_id", "s.lost")
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_dups"), F.max("lost").alias("lost"))
    )
    result = base.join(stats, "vec_id", "left").select(
        "vec_id",
        "cluster",
        "dist",
        F.coalesce("n_dups", F.lit(0)).cast("int").alias("n_dups"),
        (1 - F.coalesce("lost", F.lit(0))).cast("int").alias("keep"),
    )
    return _unpersist_with(result, base)


def semantic_dedup_oracle_sql(
    k: int = K_DEFAULT,
    n_iter: int = 2,
    dim: int = 64,
    min_cos: str = "0.999e0",
    source: str = "embeddings",
    lead_ctes: str = "",
) -> str:
    """DuckDB mirror of semantic_dedup. `min_cos` is a string in
    e-notation (the CLAUDE.md DECIMAL-literal invariant). `lead_ctes`
    lets the caller prepend e.g. a planted-duplicate corpus CTE;
    `source` must then name that CTE."""
    cos = (
        "(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        "(acc, v) -> acc + v))"
    )
    norm2 = (
        "(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), "
        "(acc, v) -> acc + v))"
    )
    cos_ab = (
        cos.format(a="a.embedding", b="b.embedding")
        + " / (sqrt(" + norm2.format(a="a.embedding") + ") * sqrt("
        + norm2.format(a="b.embedding") + "))"
    )
    chain = kmeans_chain_sql(k, n_iter, dim, source=source)
    if lead_ctes:
        chain = chain.replace("WITH v AS (", f"WITH {lead_ctes} v AS (", 1)
    return (
        chain
        + f""", base AS MATERIALIZED (
          SELECT g.vec_id, g.cluster, g.dist, e.embedding
          FROM asg g JOIN {source} e USING (vec_id)
        ), prs AS MATERIALIZED (
          SELECT a.vec_id AS va, b.vec_id AS vb, a.dist AS da, b.dist AS db
          FROM base a JOIN base b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE {cos_ab} >= {min_cos}
        ), st AS (
          SELECT vec_id, CAST(COUNT(*) AS INTEGER) AS n_dups,
                 MAX(lost) AS lost
          FROM (
            SELECT va AS vec_id,
                   CASE WHEN da < db OR (da = db AND va > vb)
                        THEN 1 ELSE 0 END AS lost
            FROM prs
            UNION ALL
            SELECT vb,
                   CASE WHEN db < da OR (da = db AND vb > va)
                        THEN 1 ELSE 0 END
            FROM prs
          ) GROUP BY 1
        )
        SELECT b.vec_id, b.cluster, b.dist,
               COALESCE(st.n_dups, 0) AS n_dups,
               CAST(1 - COALESCE(st.lost, 0) AS INTEGER) AS keep
        FROM base b LEFT JOIN st USING (vec_id)
    """
    )

"""Graph analytics: fixed-round PageRank as pure DataFrame ops, integer
micro-units end to end so the SQL oracle matches EXACTLY (dedup's
connected_components is the other graph operator; see functions/dedup.py).

The float formulation of PageRank is summation-order sensitive (the sum
of in-neighbor contributions lands in different ulps under different
partitionings); scaling ranks to integer micro-units and flooring each
division makes every iteration associative-exact, so Spark's arbitrary
aggregation order equals the oracle's. Fixed damping 850 permille:

    pr_0(v)    = SCALE                      (1e6)
    contrib(e) = pr(src) div out_deg(src)   (integer floor)
    pr_t+1(v)  = (1000 - d) * (SCALE div 1000)
                 + (d * sum(contrib over in-edges of v)) div 1000

Scale posture: one shuffle per iteration (the groupBy(dst) of
contributions, map-side combinable) plus the broadcast-able out-degree
join; iteration count is fixed, and at production depth each round would
localCheckpoint like connected_components to truncate lineage. The
standard convergence loop just wraps this with a delta check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000
PR_DAMPING_PERMILLE = 850


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping_permille: int = PR_DAMPING_PERMILLE,
) -> DataFrame:
    """nodes: (node bigint); edges: (src, dst). Returns (node,
    pr_micro bigint, in_deg int) after `n_iter` exact integer rounds.
    Dangling mass is dropped (nodes with no out-edges contribute
    nothing), matching the simple formulation the oracle mirrors."""
    base = (1000 - damping_permille) * (PR_SCALE // 1000)
    deg = edges.groupBy("src").agg(
        F.expr("cast(count(*) as bigint)").alias("out_deg")
    )
    ed = edges.join(F.broadcast(deg), on="src")
    pr = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("pr_micro"))
    for _ in range(n_iter):
        contrib = (
            ed.join(pr, ed["src"] == pr["node"])
            .select("dst", F.expr("pr_micro div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.expr("cast(sum(c) as bigint)").alias("s"))
        )
        pr = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            F.expr(
                f"cast({base} + ({damping_permille} * coalesce(s, 0)) "
                "div 1000 as bigint)"
            ).alias("pr_micro"),
        )
    in_deg = edges.groupBy("dst").agg(
        F.expr("cast(count(*) as int)").alias("in_deg")
    )
    return pr.join(in_deg, pr["node"] == in_deg["dst"], "left").select(
        "node", "pr_micro", F.expr("coalesce(in_deg, 0)").alias("in_deg")
    )

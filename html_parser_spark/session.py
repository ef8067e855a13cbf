"""Recommended Spark confs for this engine's plan shapes.

The pipelines here persist small-but-hot intermediates (LSH candidate pairs,
shingle-array tables) and chain several tiny adaptive stages. Two AQE
defaults hurt that shape badly on both toy and production inputs:

- ``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` defaults to
  false, so CACHED plans keep their full ``spark.sql.shuffle.partitions``
  fan-out forever: every downstream read of a persisted candidate set
  schedules shuffle.partitions near-empty tasks (measured: a 64-task stage
  over ~3k cached rows). True lets AQE coalesce below the cache too.
- ``spark.sql.adaptive.coalescePartitions.parallelismFirst`` defaults to
  true, which coalesces only down to the default parallelism — on a busy
  cluster (or an oversubscribed local[32]) that still schedules cores-many
  tasks for kilobyte stages. False coalesces to the advisory partition size
  (64 MB), which is also what you want at 100 TB: partition count tracks
  DATA, not cluster width. (Spark's own docs recommend false on busy
  clusters.)

Measured effect (sf0.1 documents, local[32], interleaved A/B, median of 5):
minhash LSH 5.0 s -> 2.0 s; every multi-stage query in the sweep benefits.
"""

from __future__ import annotations

SCALE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # smaller Arrow batches pipeline the mapInArrow kernels better than the
    # 10k default (interleaved A/B on the 2M-doc headline: min wall 7.14 ->
    # 6.58 s at 4096; 20k regresses) and bound per-batch kernel memory under
    # mega-doc skew
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
}


def apply_scale_confs(builder):
    """Apply SCALE_CONFS to a SparkSession.Builder (returns the builder)."""
    for k, v in SCALE_CONFS.items():
        builder = builder.config(k, v)
    return builder

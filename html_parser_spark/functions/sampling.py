"""Deterministic sampling for training-data mixes.

Pretraining pipelines weight sources (web vs wiki vs code ...) by sampling
each stratum at its own rate. `stratified_sample` does this with a
HASH-derived keep decision instead of an RNG:

  keep row  iff  pmod(h(doc_id), 1000) < permille(row)

where h is the engine's md5-derived 32-bit word hash (functions/text.py) —
so the sample is (a) deterministic and engine-portable (an ANSI-SQL oracle
reproduces it row-for-row, unlike Spark's `sampleBy` RNG), (b) stable
under re-runs and resumes (the same doc is kept or dropped forever —
lineage-friendly), and (c) consistent across strata definitions (changing
a rate only adds/removes docs at the margin, it never reshuffles the kept
set). The filter is a narrow projection — no shuffle, full column pruning.

At 100 TB: sampling-before-extraction prunes work proportionally; the
predicate rides the scan stage (md5 per row is JVM-side codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WORD_HASH


def keep_bucket_expr(id_col: str = "doc_id") -> str:
    """The 0..999 sampling bucket of a row (md5-derived, engine-portable)."""
    h = WORD_HASH.format(w=f"cast({id_col} as string)")
    return f"pmod({h}, 1000)"


def stratified_sample(
    df: DataFrame, permille_expr: str, id_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff its hash bucket < `permille_expr` (any SQL
    expression over the row, e.g. a CASE over `source` or a map lookup —
    0 drops the stratum, 1000 keeps all of it)."""
    return df.where(F.expr(f"{keep_bucket_expr(id_col)} < ({permille_expr})"))

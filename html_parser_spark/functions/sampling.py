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


# ---------------------------------------------------------------------------
# Token-budget corpus mixing (data recipes: source weighting with epochs)
# ---------------------------------------------------------------------------

MIX_UNIT = 1_000_000  # sampling rates carried in integer millionths


def corpus_mix(
    docs: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic token-budget corpus mixing — the data-recipe step of a
    pretraining pipeline: give each source a target share of the token
    budget (`budget * w_s / sum(w)`) and emit the document (multi)set that
    realizes it, DOWN-sampling over-represented sources and UP-sampling
    (repeating docs across epochs) under-represented ones.

    Per source: rate_ppm = floor(budget * w_s * 1e6 / (sum(w) * tokens_s)).
    Per doc: n_copies = rate_ppm div 1e6, plus 1 when the doc's md5-derived
    bucket (uniform in [0, 1e6)) falls below the fractional part — so
    expected emitted tokens hit the source's share exactly, and the
    realized set is RNG-free: stable under re-runs/resumes, reproducible
    by an ANSI-SQL oracle row-for-row, and margin-stable under weight
    changes (same hash-keep property as stratified_sample). All arithmetic
    is integer (ppm), so engines agree bit-for-bit.

    Output: one row per emitted copy — (doc_id, source, copy_idx 1..n,
    n_tokens, rate_ppm).

    Scale shape: token counting is a narrow projection; per-source totals
    are ONE map-side-combinable groupBy whose result has |sources| rows;
    the rate table re-joins via broadcast; the copy decision is row-local
    codegen; explode only fires where n_copies > 1. No window, no global
    sort, no per-source skew (the heavy side never shuffles)."""
    spark = docs.sparkSession
    wsum = sum(weights.values())
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in weights.items()],
        f"{source_col} string, w bigint",
    )
    toks = docs.select(
        id_col,
        source_col,
        F.expr(f"cast(size(split({text_col}, ' ')) as bigint)").alias("n_tokens"),
    )
    totals = toks.groupBy(source_col).agg(F.sum("n_tokens").alias("total_tokens"))
    rates = (
        totals.join(wdf, source_col)
        .where(F.col("total_tokens") > 0)
        .select(
            source_col,
            F.expr(
                f"(cast({int(token_budget)} as bigint) * w * {MIX_UNIT}) "
                f"div (cast({int(wsum)} as bigint) * total_tokens)"
            ).alias("rate_ppm"),
        )
    )
    bucket = WORD_HASH.format(w=f"cast({id_col} as string) || ':' || {source_col}")
    return (
        toks.join(F.broadcast(rates), source_col)
        .withColumn(
            "n_copies",
            F.expr(
                f"rate_ppm div {MIX_UNIT} + (case when pmod({bucket}, {MIX_UNIT}) "
                f"< rate_ppm % {MIX_UNIT} then 1 else 0 end)"
            ),
        )
        .where(F.col("n_copies") >= 1)
        .select(
            id_col,
            source_col,
            F.explode(F.expr("sequence(cast(1 as bigint), n_copies)")).alias(
                "copy_idx"
            ),
            "n_tokens",
            "rate_ppm",
        )
    )


def chunk_windows(
    docs: DataFrame,
    window: int = 16,
    stride: int = 12,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep that
    long-document training runs use (stride < window gives overlap so no
    boundary context is lost): (doc_id, chunk_idx int, n_tokens int,
    chunk string). Chunks are word-aligned; the last window starts at the
    final stride step that still adds words, so every word appears in
    >=1 chunk and no chunk is empty (a doc shorter than `window` yields
    exactly one chunk). Pure JVM transform-over-sequence + posexplode —
    the explode is the output, not an intermediate; no shuffle."""
    assert 0 < stride <= window
    w = f"split({text_col}, ' ')"
    n_chunks = (
        f"1 + greatest(div(size({w}) - {window} + {stride} - 1, {stride}), 0)"
    )
    chunks = (
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> array_join(slice({w}, i * {stride} + 1, {window}), ' '))"
    )
    return docs.selectExpr(
        "doc_id", f"posexplode({chunks}) as (chunk_idx, chunk)"
    ).selectExpr(
        "doc_id",
        "cast(chunk_idx as int) as chunk_idx",
        "cast(size(split(chunk, ' ')) as int) as n_tokens",
        "chunk",
    )

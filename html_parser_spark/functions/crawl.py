"""Incremental-recrawl snapshot delta — the nightly question of every
web-scale corpus: given yesterday's crawl snapshot A and today's snapshot
B of the same URL space, which documents are NEW, CHANGED, GONE, or
UNCHANGED, and how much re-extraction work does that imply per source?

Reference scope note: the reference parser (790891601/html-parser) is the
per-document kernel; snapshot diffing is the surrounding-pipeline operator
that decides WHICH documents re-enter that kernel (re-extract only
new+changed — at a ~5%/day web change rate this is the 20x saving that
makes daily recrawl affordable at 10^12 docs).

Scale design:
  - The join NEVER shuffles document text. Both sides reduce scan-side to
    a ~50-byte (doc_id, content hash, length, source) projection inside
    whole-stage codegen; only those rows cross the full-outer-join
    Exchange. Content equality == md5 equality.
  - The join key is doc_id, the natural bucketing key of a crawl store:
    with both snapshots written bucketed-by-doc_id (sources/catalog
    TableIO — CLAUDE.md: bucketed tables must be read via TableIO.load()),
    the sort-merge join plans with ZERO Exchanges. The gate reads bare
    parquet, so the audited plan here is the 2-Exchange SMJ form.
  - The rollup groupBy(source, status) is tiny (sources x 4) and
    map-side-combined.

`synth_snapshot2` derives snapshot B deterministically from the documents
table (no RNG, oracle-replayable closed form):
  - doc_id % 17 == 3  -> page disappeared (GONE from B)
  - doc_id % 17 in (1, 5) -> content edited (text || ' rev')
  - doc_id % 17 == 7  -> additionally spawns a brand-new page with
    doc_id + 1_000_000_000 and text 'fresh ' || text (NEW in B)
  - everything else unchanged
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEW_ID_OFFSET = 1_000_000_000


def synth_snapshot2(docs: DataFrame) -> DataFrame:
    """Deterministic 'tomorrow' snapshot of the documents table
    (doc_id, source, text) per the module-docstring rules."""
    base = docs.where("pmod(doc_id, 17) != 3").select(
        "doc_id",
        "source",
        F.expr(
            "if(pmod(doc_id, 17) in (1, 5), concat(text, ' rev'), text)"
        ).alias("text"),
    )
    fresh = docs.where("pmod(doc_id, 17) = 7").select(
        (F.col("doc_id") + F.lit(NEW_ID_OFFSET)).alias("doc_id"),
        "source",
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
    )
    return base.unionAll(fresh)


def _digest(df: DataFrame, side: str) -> DataFrame:
    """Scan-side reduction to the join payload: (doc_id, h, len, source).
    This is the projection that crosses the shuffle — never the text."""
    return df.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias(f"h_{side}"),
        F.length("text").cast("bigint").alias(f"len_{side}"),
        F.col("source").alias(f"source_{side}"),
    )


def crawl_delta(snap_a: DataFrame, snap_b: DataFrame) -> DataFrame:
    """Per-(source, status) recrawl delta rollup between two snapshots,
    each (doc_id, source, text).

    Output columns:
      source  string
      status  string  'new' | 'gone' | 'changed' | 'unchanged'
      n_docs  bigint  documents in that cell
      n_chars bigint  chars of the CURRENT side (B when present, else the
                      vanished A text) — the re-extraction / storage budget
    """
    a = _digest(snap_a, "a")
    b = _digest(snap_b, "b")
    j = a.join(b, on="doc_id", how="full_outer")
    status = F.expr(
        "case when h_b is null then 'gone' "
        "when h_a is null then 'new' "
        "when h_a = h_b then 'unchanged' else 'changed' end"
    )
    return (
        j.select(
            F.coalesce("source_b", "source_a").alias("source"),
            status.alias("status"),
            F.coalesce("len_b", "len_a").alias("len"),
        )
        .groupBy("source", "status")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("len").cast("bigint").alias("n_chars"),
        )
    )

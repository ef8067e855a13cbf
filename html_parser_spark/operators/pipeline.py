"""Composed training-data pipeline: extraction -> document reassembly ->
quality gate -> exact-dedup survivor manifest, as ONE Spark plan.

This is the end-to-end shape a pretraining-data run takes (the north_star's
point: operators must COMPOSE without materialization): the only wide
operation in the whole pipeline is the final dedup groupBy — extraction is
the single mapInArrow crossing, reassembly and the quality gate are narrow
JVM projections fused into the post-crossing stage, and the group-by is
map-side combinable. At 100 TB this runs as scan -> kernel -> project/
filter -> one exchange.

Stage reuse, not reimplementation: the quality gate IS functions/text.quality
(same expressions, same thresholds) and the grouping mirrors
functions/dedup.exact_groups; the gate query's DuckDB oracle reconstructs
the whole composition from first principles (__spark_entry__.oracle_sql
['pipeline_clean_corpus']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality
from .extract import extract_spans


def reassembled_documents(df_extracted: DataFrame) -> DataFrame:
    """Extraction output -> (doc_id: long, text): the document's text spans
    re-joined in span order with single spaces — the 'clean text' view a
    tokenizer consumes. Error/divergent docs are dropped (their spans are
    partial by contract). Narrow projection, no shuffle."""
    return df_extracted.where(F.col("status") == "ok").select(
        # numeric ids: survivor selection below must be the NUMERIC min
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(
            "array_join(transform(filter(spans, s -> s.kind = 'text'), "
            "s -> s.text), ' ')"
        ).alias("text"),
    )


def clean_corpus(interleaved: DataFrame) -> DataFrame:
    """Interleaved docs -> deduplicated quality-passing corpus manifest:
    (text_md5, rep_doc_id, n_copies) — one row per surviving distinct
    document (singletons included; n_copies > 1 rows are the dedup wins,
    rep_doc_id = numeric-min survivor)."""
    ex = extract_spans(interleaved)
    docs = reassembled_documents(ex)
    kept = quality(docs, keep=("text",)).where(F.col("quality_ok") == 1)
    return kept.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").alias("n_copies"),
    )

"""Spark-side extraction operator: salted repartition + mapInArrow kernel.

Input table (BASELINE.json input_hint):
    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Output table:
    doc_id, spans: array<struct<kind, text, media_ref, order:int>>,
    status ('ok'|'error'|'divergent'), error, n_spans, n_text_chars,
    partition_id (stable hash bucket for lineage/metrics, NOT the Spark task id)

Scale notes (100 TB / 1000 executors):
- Exactly ONE JVM->Python Arrow crossing on the hot path: tokenize + tree
  build + extraction are fused in a single mapInArrow stage (SURVEY.md §7.3);
  the crossing moves flat Arrow child arrays, never per-span Python dicts
  (the pandas crossing is kept as a tested fallback, use_arrow=False).
- Skew: mega-documents are row-atomic, so the defense is (a) salted
  repartitioning — salt_by='hash' spreads docs uniformly on the raw
  xxhash64(doc_id); salt_by='bytes' is SIZE-WEIGHTED: an AQE REBALANCE on
  doc_id, which splits/coalesces the shuffle output by measured partition
  BYTES (optimizeSkewsInRebalancePartitions), so a mega-doc gets a
  partition to itself instead of dragging its hash-bucket's light docs
  into the hottest task (measured: 10 MB doc among 10k -> co-resident
  light bytes on the hottest task drop from ~670 KB to ~0; BASELINE.md) —
  and (b) byte-bounded Arrow batches (set
  spark.sql.execution.arrow.maxRecordsPerBatch down for mega-doc corpora).
  Salting is a full shuffle of the input bytes — leave salt_partitions=None
  when the upstream layout is already uniform (e.g. sized parquet row
  groups + AQE); pass an int (or salt_by='bytes') when the source is
  skewed. In bytes mode the partition count follows
  spark.sql.adaptive.advisoryPartitionSizeInBytes (size it to the per-task
  byte budget), not salt_partitions; sizes are COMPRESSED shuffle bytes,
  so low-entropy payloads pack denser than their logical size.
- partition_id = pmod(xxhash64(doc_id), n_buckets) is derived from doc_id, so
  re-runs produce identical bucket assignment -> idempotent per-partition
  lineage commits (resume support; see sources/checkpoint.py).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels.extract import ExtractOptions, process_document

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),
    ]
)

EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_STRUCT)),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("n_spans", IntegerType()),
        StructField("n_text_chars", LongType()),
        StructField("partition_id", IntegerType()),
    ]
)

INPUT_SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(INPUT_SPAN_STRUCT)),
    ]
)


def _kernel_factory(options: ExtractOptions, n_buckets: int):
    heur = None
    if options.mode == "main":
        from ..kernels.heuristics import extract_main_content as heur  # noqa: F811

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield _process_batch(pd, pdf, heur, n_buckets)

    return kernel


def _arrow_span_schema(pa):
    return pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field(
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            pa.field("kind", pa.string()),
                            pa.field("text", pa.string()),
                            pa.field("media_ref", pa.string()),
                            pa.field("order", pa.int32()),
                        ]
                    )
                ),
            ),
            pa.field("status", pa.string()),
            pa.field("error", pa.string()),
            pa.field("n_spans", pa.int32()),
            pa.field("n_text_chars", pa.int64()),
            pa.field("partition_id", pa.int32()),
        ]
    )


def _arrow_kernel_factory(options: ExtractOptions, n_buckets: int):
    heur = None
    if options.mode == "main":
        from ..kernels.heuristics import extract_main_content as heur  # noqa: F811

    def kernel(batches):
        import pyarrow as pa

        schema = _arrow_span_schema(pa)
        for batch in batches:
            yield _process_arrow_batch(pa, batch, heur, n_buckets, schema)

    return kernel


def _process_arrow_batch(pa, batch, heur, n_buckets, schema):
    """One Arrow batch through the kernel WITHOUT materializing per-span
    Python dicts on either side of the JVM<->Python crossing: the input
    list<struct> column is decomposed into its flat child arrays (one C
    pass per column), per-document slices are cut by the list offsets, and
    the output list<struct> is rebuilt from flat arrays + offsets. This
    roughly halves crossing overhead vs the pandas path (measured in
    BASELINE.md); the pandas kernel (_process_batch) remains the semantic
    twin and both are pinned to the same oracle by test_spark_extract."""
    from ..kernels.extract import process_document_flat

    idx_doc = batch.schema.get_field_index("doc_id")
    idx_spans = batch.schema.get_field_index("spans")
    doc_arr = batch.column(idx_doc)
    if doc_arr.type != pa.string():
        doc_arr = doc_arr.cast(pa.string())
    spans_arr = batch.column(idx_spans)
    n = batch.num_rows
    doc_ids = doc_arr.to_pylist()

    if n:
        offs = spans_arr.offsets.to_pylist()  # absolute into the child arrays
        vals = spans_arr.values
        fidx = {f.name: i for i, f in enumerate(spans_arr.type.value_type)}
        kinds_f = vals.field(fidx["kind"]).to_pylist()
        texts_f = vals.field(fidx["text"]).to_pylist()
        mrefs_f = vals.field(fidx["media_ref"]).to_pylist()
        nulls = spans_arr.is_null().to_pylist() if spans_arr.null_count else None
    else:
        offs, kinds_f, texts_f, mrefs_f, nulls = [0], [], [], [], None

    out_kinds: list = []
    out_texts: list = []
    out_mrefs: list = []
    out_orders: list = []
    out_offsets = [0]
    statuses, errors, n_spans_l, n_chars_l, part_ids = [], [], [], [], []
    for i in range(n):
        if nulls is not None and nulls[i]:
            a = b = 0  # null spans column == no input spans (dirty upstream)
        else:
            a, b = offs[i], offs[i + 1]
        n_sp, status, error, n_chars = process_document_flat(
            kinds_f[a:b], texts_f[a:b], mrefs_f[a:b], out_kinds, out_texts, out_mrefs
        )
        if heur is not None and status == "ok":
            # heuristic branch: replace this doc's strict spans
            del out_kinds[len(out_kinds) - n_sp :]
            del out_texts[len(out_texts) - n_sp :]
            del out_mrefs[len(out_mrefs) - n_sp :]
            hs = heur(kinds_f[a:b], texts_f[a:b], mrefs_f[a:b])
            for s in hs:
                out_kinds.append(s["kind"])
                out_texts.append(s["text"])
                out_mrefs.append(s["media_ref"])
            n_sp = len(hs)
        out_orders.extend(range(n_sp))
        out_offsets.append(out_offsets[-1] + n_sp)
        statuses.append(status)
        errors.append(error)
        n_spans_l.append(n_sp)
        n_chars_l.append(n_chars)
        part_ids.append(_stable_bucket(doc_ids[i], n_buckets))

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(out_kinds, pa.string()),
            pa.array(out_texts, pa.string()),
            pa.array(out_mrefs, pa.string()),
            pa.array(out_orders, pa.int32()),
        ],
        fields=list(schema.field("spans").type.value_type),
    )
    spans_out = pa.ListArray.from_arrays(pa.array(out_offsets, pa.int32()), span_struct)
    return pa.RecordBatch.from_arrays(
        [
            doc_arr,
            spans_out,
            pa.array(statuses, pa.string()),
            pa.array(errors, pa.string()),
            pa.array(n_spans_l, pa.int32()),
            pa.array(n_chars_l, pa.int64()),
            pa.array(part_ids, pa.int32()),
        ],
        schema=schema,
    )


def _stable_bucket(doc_id: Optional[str], n_buckets: int) -> int:
    # Stable across runs and Python processes (NOT hash(), which is seeded).
    # Null doc_ids (dirty upstream data) deterministically land in bucket 0.
    import zlib

    if doc_id is None:
        return 0
    return zlib.crc32(doc_id.encode("utf-8")) % n_buckets


def _process_batch(pd, pdf, heur, n_buckets):
    doc_ids = pdf["doc_id"].tolist()
    spans_col = pdf["spans"].tolist()
    out_spans, statuses, errors, n_spans_l, n_chars_l, part_ids = [], [], [], [], [], []
    for doc_id, in_spans in zip(doc_ids, spans_col):
        if in_spans is None:
            in_spans = []
        kinds = [s["kind"] for s in in_spans]
        texts = [s["text"] for s in in_spans]
        mrefs = [s["media_ref"] for s in in_spans]
        spans, status, error, n_chars = process_document(kinds, texts, mrefs)
        if heur is not None and status == "ok":
            spans = heur(kinds, texts, mrefs)
        out_spans.append(spans)
        statuses.append(status)
        errors.append(error)
        n_spans_l.append(len(spans))
        n_chars_l.append(n_chars)
        part_ids.append(_stable_bucket(doc_id, n_buckets))
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "spans": out_spans,
            "status": statuses,
            "error": errors,
            "n_spans": pd.array(n_spans_l, dtype="int32"),
            "n_text_chars": pd.array(n_chars_l, dtype="int64"),
            "partition_id": pd.array(part_ids, dtype="int32"),
        }
    )


def extract_spans(
    df: DataFrame,
    options: Optional[ExtractOptions] = None,
    salt_partitions: Optional[int] = None,
    n_buckets: int = 1024,
    use_arrow: bool = True,
    salt_by: str = "hash",
) -> DataFrame:
    """The flagship operator: interleaved docs -> ordered extracted spans.

    salt_partitions: if set, hash-repartition on xxhash64(doc_id) first
    (north_rule skew defense). salt_by='bytes' selects the size-weighted
    variant instead (AQE REBALANCE on doc_id: partitions sized by measured
    shuffle bytes, mega-docs isolated; partition count follows
    spark.sql.adaptive.advisoryPartitionSizeInBytes rather than
    salt_partitions). n_buckets: lineage bucket count.
    use_arrow: mapInArrow crossing (default — avoids per-span dict
    materialization on both sides); False selects the pandas crossing
    (semantic twin, kept for comparison and as a fallback).
    """
    options = options or ExtractOptions()
    missing = {"doc_id", "spans"} - set(df.columns)
    if missing:
        raise ValueError(
            f"extract_spans input is missing column(s) {sorted(missing)}; "
            "expected (doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)"
        )
    if salt_by not in ("hash", "bytes"):
        raise ValueError(f"salt_by must be 'hash' or 'bytes', got {salt_by!r}")
    if salt_by == "bytes":
        # size-weighted salting: hash-distribute on doc_id, then let AQE
        # re-cut the shuffle output by BYTES (skew splits + small-partition
        # coalesce). A mega-doc is row-atomic, so the best any partitioner
        # can do is give it a partition of its own — this does exactly that
        # without a second sizing scan (it reuses the shuffle's own map
        # output statistics).
        df = df.hint("rebalance", "doc_id")
    elif salt_partitions:
        # full-entropy salt: repartition hashes the expression again, so
        # wrapping in pmod(.., P) would collapse to P distinct values and
        # leave ~1/e of the partitions empty (verified) — hash the raw
        # 64-bit doc hash instead
        df = df.repartition(salt_partitions, F.xxhash64(F.col("doc_id")))
    if use_arrow:
        return df.mapInArrow(_arrow_kernel_factory(options, n_buckets), schema=EXTRACT_SCHEMA)
    return df.mapInPandas(_kernel_factory(options, n_buckets), schema=EXTRACT_SCHEMA)


def exploded_spans(df_extracted: DataFrame) -> DataFrame:
    """Flatten extraction output to one row per span (for SQL-comparable
    query results; the pipeline itself stays explode-free)."""
    return df_extracted.select(
        "doc_id",
        "status",
        F.posexplode_outer("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        "status",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.order").alias("span_order"),
    )


def partition_metrics(df_extracted: DataFrame) -> DataFrame:
    """Per-partition lineage metrics (map-side combinable aggregation)."""
    return df_extracted.groupBy("partition_id").agg(
        F.count("*").alias("doc_count"),
        F.sum("n_spans").alias("span_count"),
        F.sum("n_text_chars").alias("text_chars"),
        F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("error_count"),
        F.sum(F.when(F.col("status") == "divergent", 1).otherwise(0)).alias(
            "divergent_count"
        ),
    )

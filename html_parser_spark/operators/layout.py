"""PDF/layout branch: route media spans by media_ref type and run a layout
parser over document-shaped media (north_star: "plus a PDF/layout branch").

The reference has no PDF semantics (it is an HTML parser), so this branch is
contract-free by construction (SURVEY.md §7.1 step 5): the ROUTING and Spark
plumbing are real and tested; the actual PDF decode is a pluggable kernel,
stubbed here (no PDF libs in this container) behind `layout_parser=` with a
deterministic fake used by tests and the correctness gate.

Flow:
  extracted spans -> explode media refs -> route on extension
    - pdf/doc-like  -> layout_parse kernel (mapInPandas): per-ref ordered
                       (page, block_order, block_kind, content) rows
    - image/audio/… -> passthrough rows (decode lives in operators/multimodal)
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

LAYOUT_TYPES = ("pdf", "docx", "ps")  # extensions routed to the layout parser

LAYOUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("page", IntegerType()),
        StructField("block_order", IntegerType()),
        StructField("block_kind", StringType()),  # 'text' | 'table' | 'figure'
        StructField("content", StringType()),
    ]
)


def media_refs(df_extracted: DataFrame) -> DataFrame:
    """(doc_id, media_ref, media_type): one row per media span; media_type =
    lowercase extension ('' when absent)."""
    return (
        df_extracted.select(
            "doc_id",
            F.explode(
                F.expr("filter(spans, s -> s.kind = 'media' and s.media_ref is not null)")
            ).alias("s"),
        )
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
        .withColumn(
            "media_type",
            F.lower(F.regexp_extract(F.col("media_ref"), r"\.([A-Za-z0-9]+)$", 1)),
        )
    )


def route_media(df_extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(layout_side, passthrough_side) split on media_type."""
    refs = media_refs(df_extracted)
    is_layout = F.col("media_type").isin(*LAYOUT_TYPES)
    return refs.where(is_layout), refs.where(~is_layout)


def real_layout_parser(media_ref: str) -> list[tuple[int, int, str, str]]:
    """Where a real PDF/layout model would run (pdfminer/detectron-style).
    Not available in this container — explicit stub."""
    raise NotImplementedError(
        "PDF/layout parsing requires libraries not present in this environment; "
        "pass layout_parser= to parse_layout()"
    )


def fake_layout_parser(media_ref: str) -> list[tuple[int, int, str, str]]:
    """Deterministic fake: blocks derived from the ref string (md5-seeded),
    giving the pipeline a stable, testable shape."""
    import hashlib

    h = hashlib.md5(media_ref.encode("utf-8")).hexdigest()
    n_pages = 1 + int(h[0], 16) % 3
    out = []
    order = 0
    for page in range(n_pages):
        for b in range(1 + int(h[1 + page], 16) % 2):
            kind = "table" if int(h[4 + b], 16) % 4 == 0 else "text"
            out.append((page, order, kind, f"block:{h[:8]}:{page}:{b}"))
            order += 1
    return out


def parse_layout(
    refs: DataFrame,
    layout_parser: Callable[[str], list[tuple[int, int, str, str]]] = fake_layout_parser,
) -> DataFrame:
    """Arrow-batched layout parse over (doc_id, media_ref) rows."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            doc_ids, mrefs, pages, orders, kinds, contents = [], [], [], [], [], []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                for page, order, kind, content in layout_parser(ref):
                    doc_ids.append(doc_id)
                    mrefs.append(ref)
                    pages.append(page)
                    orders.append(order)
                    kinds.append(kind)
                    contents.append(content)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "media_ref": mrefs,
                    "page": pd.array(pages, dtype="int32"),
                    "block_order": pd.array(orders, dtype="int32"),
                    "block_kind": kinds,
                    "content": contents,
                }
            )

    return refs.select("doc_id", "media_ref").mapInPandas(kernel, schema=LAYOUT_SCHEMA)

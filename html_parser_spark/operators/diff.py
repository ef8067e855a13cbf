"""Document-pair diff operator — the reference's transform/diff entry point
(SURVEY.md §2 X4-X8) as a Spark stage.

Two tables of (doc_id, html) are paired on doc_id and run through the
reference-exact BFS positional diff (core/diff.py, validated against the
bundle's ACTUAL behavior), emitting the ins/del-annotated serialized HTML.

Scale shape: the doc_id join is the pipeline's only required shuffle beyond
salting (SURVEY.md §3.2). Pairing uses a relational FULL OUTER join followed
by ONE batched mapInPandas — not cogroup/applyInPandas, which materializes a
pandas group per doc_id (one-row frames; measured ~10x slower at 5k docs and
pathological at 1e9 pairs). Unpaired rows surface with status 'missing_old' /
'missing_new' (never dropped rows).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..core.diff import (
    DiffTypeError,
    E_DIFF_TYPE_ERROR,
    count_wrappers,
    generate_iter,
    max_id,
    transform_diff,
)
from ..core.oracle import Divergence, ParseError, parse_html

DIFF_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("diff_html", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("n_ins", IntegerType()),
        StructField("n_del", IntegerType()),
    ]
)


def _diff_one(new_html: Optional[str], old_html: Optional[str]):
    if new_html is None:
        return None, "missing_new", None, 0, 0
    if old_html is None:
        return None, "missing_old", None, 0, 0
    try:
        old_root = parse_html(old_html)
        new_root = parse_html(new_html)
    except Divergence:
        return None, "divergent", "divergent_nontermination", 0, 0
    except ParseError as e:
        return None, "error", e.code, 0, 0
    idx_start = max_id(new_root) + 1
    try:
        transform_diff(new_root, old_root, idx_start)
    except DiffTypeError:
        return None, "error", E_DIFF_TYPE_ERROR, 0, 0
    # exact surviving-wrapper counts (marker-based: source-document
    # <ins>/<del> elements and old-tree id overlap never miscount)
    n_ins, n_del = count_wrappers(new_root)
    return generate_iter(new_root), "ok", None, n_ins, n_del


def diff_documents(
    df_new: DataFrame,
    df_old: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, html) x2 -> (doc_id, diff_html, status, error, n_ins, n_del)."""
    from pyspark.sql import functions as F

    paired = df_new.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(html_col).alias("new_html")
    ).join(
        df_old.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(html_col).alias("old_html"),
        ),
        "doc_id",
        "full_outer",
    )

    def kernel(batches):  # Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]
        import pandas as pd

        for pdf in batches:
            htmls, statuses, errors, ins_l, del_l = [], [], [], [], []
            for new_html, old_html in zip(pdf["new_html"], pdf["old_html"]):
                html, status, error, n_ins, n_del = _diff_one(
                    new_html if new_html is not None else None,
                    old_html if old_html is not None else None,
                )
                htmls.append(html)
                statuses.append(status)
                errors.append(error)
                ins_l.append(n_ins)
                del_l.append(n_del)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "diff_html": htmls,
                    "status": statuses,
                    "error": errors,
                    "n_ins": pd.array(ins_l, dtype="int32"),
                    "n_del": pd.array(del_l, dtype="int32"),
                }
            )

    return paired.mapInPandas(kernel, schema=DIFF_SCHEMA)

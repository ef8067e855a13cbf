"""Document-pair diff operator — the reference's transform/diff entry point
(SURVEY.md §2 X4-X8) as a Spark stage.

Two tables of (doc_id, html) are paired on doc_id with a cogrouped
applyInPandas kernel running the reference-exact BFS positional diff
(core/diff.py, validated against the bundle's ACTUAL behavior) and emitting
the ins/del-annotated serialized HTML.

Scale shape: the doc_id join is the pipeline's only required shuffle beyond
salting (SURVEY.md §3.2); cogroup shuffles both sides by doc_id once and the
kernel sees matched pandas groups. Unpaired rows surface with status
'missing_old' / 'missing_new' (full-outer semantics, never dropped rows).
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

    def kernel(key, new_pdf, old_pdf) -> "pd.DataFrame":  # noqa: F821
        import pandas as pd

        doc_id = str(key[0])
        new_html = new_pdf[html_col].iloc[0] if len(new_pdf) else None
        old_html = old_pdf[html_col].iloc[0] if len(old_pdf) else None
        html, status, error, n_ins, n_del = _diff_one(new_html, old_html)
        return pd.DataFrame(
            {
                "doc_id": [doc_id],
                "diff_html": [html],
                "status": [status],
                "error": [error],
                "n_ins": pd.array([n_ins], dtype="int32"),
                "n_del": pd.array([n_del], dtype="int32"),
            }
        )

    return (
        df_new.select(id_col, html_col)
        .groupBy(id_col)
        .cogroup(df_old.select(id_col, html_col).groupBy(id_col))
        .applyInPandas(kernel, schema=DIFF_SCHEMA)
    )

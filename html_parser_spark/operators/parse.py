"""Full-tree parse operator: the reference's parser entry point (SURVEY.md §2
P1-P7) exposed as a Spark stage, emitting the flat id/pid node table.

The reference tree is isomorphic to a flat array of (id, pid, kind, ...) rows
in document order (ascending id = document order; SURVEY.md §1.1), so the
operator emits exactly that — explode-free, one array column per document:

  nodes: array<struct<id:int, pid:int, kind:string, tag:string,
                      content:string, attrs:array<struct<name,value>>,
                      unary:boolean>>

Semantics are the oracle's (ids assigned in tokenization order starting at 2,
root = id 1 implied and omitted; end tags carry no id and emit no row;
attr quirks preserved including value=NULL for quoted-empty).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..core.oracle import (
    ELEMENT,
    INTERPOLATION,
    TAG_END,
    TAG_NAME,
    TAG_OPEN,
    TEXT,
    Divergence,
    ParseError,
    tokenize,
)

ATTR_STRUCT = StructType(
    [StructField("name", StringType()), StructField("value", StringType())]
)
NODE_STRUCT = StructType(
    [
        StructField("id", IntegerType()),
        StructField("pid", IntegerType()),
        StructField("kind", StringType()),
        StructField("tag", StringType()),
        StructField("content", StringType()),
        StructField("attrs", ArrayType(ATTR_STRUCT)),
        StructField("unary", BooleanType()),
    ]
)
PARSE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("nodes", ArrayType(NODE_STRUCT)),
        StructField("status", StringType()),
        StructField("error", StringType()),
    ]
)


def parse_one(html: str) -> tuple[Optional[list[dict[str, Any]]], str, Optional[str]]:
    """Tokenize + parent-stack build -> flat node rows (document order)."""
    try:
        tokens = tokenize(html)
    except Divergence:
        return None, "divergent", "divergent_nontermination"
    except ParseError as e:
        return None, "error", e.code
    nodes: list[dict[str, Any]] = []
    stack: list[tuple[int, str]] = [(1, "")]  # (id, tagName); root id=1
    for tok in tokens:
        t = tok["type"]
        if t == TAG_END:
            if len(stack) == 1 or stack[-1][1] != tok["tagName"]:
                return None, "error", "tag_mismatch"
            stack.pop()
            continue
        pid = stack[-1][0]
        if t == TAG_OPEN or t == TAG_NAME:
            nodes.append(
                {
                    "id": tok["id"],
                    "pid": pid,
                    "kind": ELEMENT,
                    "tag": tok["tagName"],
                    "content": None,
                    "attrs": [
                        {"name": a["name"], "value": a["value"]} for a in tok["attrs"]
                    ],
                    "unary": t == TAG_NAME,
                }
            )
            if t == TAG_OPEN:
                stack.append((tok["id"], tok["tagName"]))
        else:
            content = tok["content"]
            if t == INTERPOLATION:
                content = content[0]  # raw match (inner is derivable)
            nodes.append(
                {
                    "id": tok["id"],
                    "pid": pid,
                    "kind": t if isinstance(t, str) else TEXT,
                    "tag": None,
                    "content": content,
                    "attrs": None,
                    "unary": None,
                }
            )
    return nodes, "ok", None


def parse_nodes(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, html) -> (doc_id, nodes[], status, error)."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, nodes_col, statuses, errors = [], [], [], []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                nodes, status, error = parse_one(html if html is not None else "")
                ids.append(str(doc_id))
                nodes_col.append(nodes)
                statuses.append(status)
                errors.append(error)
            yield pd.DataFrame(
                {"doc_id": ids, "nodes": nodes_col, "status": statuses, "error": errors}
            )

    return df.mapInPandas(kernel, schema=PARSE_SCHEMA)


def exploded_nodes(df_parsed: DataFrame) -> DataFrame:
    """One row per node (SQL-comparable form)."""
    from pyspark.sql import functions as F

    return df_parsed.select(
        "doc_id", "status", F.explode("nodes").alias("n")
    ).select(
        "doc_id",
        "status",
        F.col("n.id").alias("node_id"),
        F.col("n.pid").alias("pid"),
        F.col("n.kind").alias("kind"),
        F.col("n.tag").alias("tag"),
        F.col("n.content").alias("content"),
        F.col("n.unary").alias("unary"),
    )

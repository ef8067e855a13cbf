"""HTML serialization operator — the reference's `generate` capability
(packages/core/generate.ts:3-30) as a Spark stage.

Parses each text span and re-serializes it with the reference's exact quirks
(all bundle-verified, SURVEY.md §2.1 G1-G3):
  - void elements get PAIRED close tags: '<img src="u"/>' -> '<img src="u"></img>'
  - Comment/CDATA/Interpolation serialize as '' (generate returns undefined,
    join('') elides)
  - missing attr values serialize as the literal string 'undefined'
  - attrs keep source order and duplicates

One Python crossing (mapInArrow by default — all four output columns are
flat scalars, so the batch is rebuilt from plain arrays with no per-row dict
materialization; the pandas crossing is kept as the semantic twin,
use_arrow=False); error/divergent rows surface as status columns,
html_out = NULL (kernel shares the pass-1 tokenizer with extraction).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from ..core.oracle import STATUS_OK
from ..kernels.extract import (
    _Fail,
    _T_END,
    _T_OPEN,
    _T_TEXT,
    _T_VOID,
    _tokenize_arrays,
)

SERIALIZE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("html_out", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
    ]
)


def _attrs_code(attrs: list[tuple[str, Optional[str]]]) -> str:
    if not attrs:
        return ""
    return " " + " ".join(
        f'{n}="{"undefined" if v is None else v}"' for n, v in attrs
    )


def serialize_one(html: str) -> tuple[Optional[str], str, Optional[str]]:
    """Parse + generate one string. Returns (html_out, status, error)."""
    try:
        types, tags, payloads, attrs_col = _tokenize_arrays(html, want_attrs=True)
    except _Fail as f:
        return None, f.status, f.error
    parts: list[str] = []
    stack: list[str] = []
    for i, t in enumerate(types):
        if t == _T_TEXT:
            parts.append(payloads[i])
        elif t == _T_OPEN:
            parts.append(f"<{tags[i]}{_attrs_code(attrs_col[i])}>")
            stack.append(tags[i])
        elif t == _T_VOID:
            # reference generate.ts:11 emits a paired close tag for unary too
            parts.append(f"<{tags[i]}{_attrs_code(attrs_col[i])}></{tags[i]}>")
        else:  # _T_END
            if not stack or stack[-1] != tags[i]:
                from ..core.oracle import E_TAG_MISMATCH, STATUS_ERROR

                return None, STATUS_ERROR, E_TAG_MISMATCH
            parts.append(f"</{stack.pop()}>")
    # unclosed elements at EOF: reference keeps them and generate still emits
    # close tags during the recursive serialization (children end at EOF)
    while stack:
        parts.append(f"</{stack.pop()}>")
    return "".join(parts), STATUS_OK, None


def serialize_html(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    use_arrow: bool = True,
) -> DataFrame:
    """(id, html) -> (doc_id, html_out, status, error)."""
    if use_arrow:

        def arrow_kernel(batches):
            import pyarrow as pa

            schema = pa.schema(
                [
                    pa.field("doc_id", pa.string()),
                    pa.field("html_out", pa.string()),
                    pa.field("status", pa.string()),
                    pa.field("error", pa.string()),
                ]
            )
            for batch in batches:
                doc_arr = batch.column(batch.schema.get_field_index(id_col))
                if doc_arr.type != pa.string():
                    doc_arr = doc_arr.cast(pa.string())
                outs, statuses, errors = [], [], []
                for h in batch.column(batch.schema.get_field_index(html_col)).to_pylist():
                    o, s, e = serialize_one(h if h is not None else "")
                    outs.append(o)
                    statuses.append(s)
                    errors.append(e)
                yield pa.RecordBatch.from_arrays(
                    [
                        doc_arr,
                        pa.array(outs, pa.string()),
                        pa.array(statuses, pa.string()),
                        pa.array(errors, pa.string()),
                    ],
                    schema=schema,
                )

        return df.mapInArrow(arrow_kernel, schema=SERIALIZE_SCHEMA)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            outs, statuses, errors = [], [], []
            for h in pdf[html_col]:
                o, s, e = serialize_one(h if h is not None else "")
                outs.append(o)
                statuses.append(s)
                errors.append(e)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "html_out": outs,
                    "status": statuses,
                    "error": errors,
                }
            )

    return df.mapInPandas(kernel, schema=SERIALIZE_SCHEMA)

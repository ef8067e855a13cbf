"""Custom stateful streaming operators (applyInPandasWithState).

`dedup_stream`: streaming exact deduplication — emit only the FIRST document
ever seen for each content key, across micro-batches and restarts (state
lives in the checkpoint). This is the streaming face of the exact-dedup
operator (functions/dedup.exact_groups) for continuous ingestion: content
keys arrive unbounded, so state is per-key minimal (a single seen flag) and
keys partition across executors by the groupBy hash.

At 10^12-doc scale the seen-set cannot live in one process — this operator
shards it by key hash across the cluster's state store, which is exactly
what groupBy + per-key state gives."""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("content_key", StringType()),
        StructField("doc_id", StringType()),
        StructField("n_dupes_in_batch", LongType()),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    total = 0
    rep: Any = None  # canonical survivor: min doc_id in the INPUT's dtype
    # (numeric min for numeric ids, matching functions/dedup.exact_groups;
    # batch row order is nondeterministic so an explicit min is required)
    for pdf in pdfs:
        total += len(pdf)
        if len(pdf):
            m = pdf["doc_id"].min()
            rep = m if rep is None or m < rep else rep
    if state.exists:
        (seen,) = state.get
        state.update((seen + total,))
        return  # key already emitted in an earlier batch: drop everything
    state.update((total,))
    yield pd.DataFrame(
        {
            "content_key": [key[0]],
            "doc_id": [str(rep)],
            "n_dupes_in_batch": pd.array([total], dtype="int64"),
        }
    )


def dedup_stream(stream_df: DataFrame, key_expr: str = "md5(text)") -> DataFrame:
    """(doc_id, text) stream -> first-seen rows per content key.

    key_expr: any deterministic SQL expression over the input row (default:
    exact-content md5; swap in a simhash/minhash band expression from
    functions.dedup for NEAR-dup streaming).

    doc_id keeps its ORIGINAL type through the groupBy so the survivor is the
    numeric min for numeric ids (e.g. 9 < 10, not '10' < '9'); it is cast to
    string only in the output row."""
    keyed = stream_df.select(
        F.expr(key_expr).alias("content_key"),
        F.col("doc_id").alias("doc_id"),
    )
    return keyed.groupBy("content_key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

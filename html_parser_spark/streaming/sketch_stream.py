"""Streaming HyperLogLog: cross-batch distinct counting in the state store
(applyInPandasWithState), register-compatible with the batch sketch.

Each (group, register) key holds ONE bigint of state — the max rho ever
seen — so the total state is groups x 256 rows no matter how many keys
stream through: the property that makes distinct-count viable on an
unbounded stream (a streaming COUNT(DISTINCT) would buffer every key
forever). A row is EMITTED only when a register's max increases (append
mode, monotone), so the sink stays tiny too; the latest row per
(group, register) is the register's current value.

`hll_estimate_from_registers` folds a sink of emitted rows through the
SAME estimator stage as the batch path (functions/sketch.fold_registers),
so a closed stream's estimate equals `hll_distinct` over the union of all
batches EXACTLY — pinned by
tests/test_streaming_sketch.py::test_stream_equals_batch_hll.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.sketch import RHO_CAP, _register_rho_exprs, fold_registers

HLL_STREAM_OUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("_reg", IntegerType()),
        StructField("_mrho", IntegerType()),
    ]
)
HLL_STREAM_STATE_SCHEMA = StructType([StructField("mrho", IntegerType())])


def _hll_fn(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    batch_max = 0
    for pdf in pdfs:
        if len(pdf):
            batch_max = max(batch_max, int(pdf["_rho"].max()))
    prev = state.get[0] if state.exists else 0
    if batch_max <= prev:
        return  # register unchanged: emit nothing, state untouched
    state.update((batch_max,))
    yield pd.DataFrame(
        {
            "group_key": [key[0]],
            "_reg": pd.array([key[1]], dtype="int32"),
            "_mrho": pd.array([batch_max], dtype="int32"),
        }
    )


def hll_stream(
    stream_df: DataFrame, key_expr: str, group_expr: str = "'all'"
) -> DataFrame:
    """Streaming register updates: (group_key, _reg, _mrho) rows, emitted
    only when a register's max rho grows (monotone append)."""
    reg, rho = _register_rho_exprs(key_expr)
    keyed = stream_df.selectExpr(
        f"cast({group_expr} as string) as group_key",
        f"cast({reg} as int) as _reg",
        f"least({rho}, {RHO_CAP}) as _rho",
    )
    return keyed.groupBy("group_key", "_reg").applyInPandasWithState(
        _hll_fn,
        outputStructType=HLL_STREAM_OUT_SCHEMA,
        stateStructType=HLL_STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_estimate_from_registers(
    emitted: DataFrame, groups: Sequence[str] = ("group_key",)
) -> DataFrame:
    """Fold an emitted-rows sink to per-group estimates: the LATEST value
    of each register is its max (emissions are monotone), then the shared
    batch estimator stage."""
    per_reg = emitted.groupBy(*groups, "_reg").agg(
        F.expr("cast(max(_mrho) as int)").alias("_mrho")
    )
    return fold_registers(per_reg, list(groups))

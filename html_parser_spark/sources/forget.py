"""Right-to-be-forgotten: rewrite tables WITHOUT a set of subject keys —
the GDPR/CCPA erasure primitive a data lake must support. At 100 TB the
shape matters: the delete is a broadcast anti-join inside a partition-
preserving rewrite (no shuffle of the table), and with partition/footer
stats most files contain no subject rows and rewrite as straight column
passes (Iceberg/Delta would skip them entirely via delete files; on plain
parquet the rewrite is the honest baseline).

Every erasure returns an audit record (table, rows before/after, removed)
— the evidence a compliance run must log."""

from __future__ import annotations

import os


def forget_keys(
    spark,
    table_path: str,
    output_path: str,
    key_col: str,
    keys,
) -> dict:
    """Rewrite `table_path` to `output_path` dropping rows whose `key_col`
    is in `keys` (a small subject list — broadcast). Returns the audit
    record."""
    from pyspark.sql import functions as F

    # materialize once: a generator argument would be exhausted by the
    # DataFrame build and silently record n_subjects=0 in the audit record
    keys = list(keys)
    if os.path.abspath(output_path) == os.path.abspath(table_path):
        raise ValueError("output_path must differ from table_path (the "
                         "erasure rewrite is not in-place)")
    df = spark.read.parquet(table_path)
    subjects = spark.createDataFrame(
        [(k,) for k in keys], f"{key_col} {df.schema[key_col].dataType.simpleString()}"
    )
    kept = df.join(F.broadcast(subjects), key_col, "left_anti")
    kept.write.mode("overwrite").parquet(output_path)
    before = df.count()
    after = spark.read.parquet(output_path).count()
    return {
        "table": os.path.basename(table_path.rstrip("/")),
        "key_col": key_col,
        "n_subjects": len(keys),
        "rows_before": before,
        "rows_after": after,
        "rows_removed": before - after,
    }

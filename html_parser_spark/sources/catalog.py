"""Table IO: Iceberg when a catalog is on the classpath, parquet-dir fallback.

The north_rule targets Iceberg tables (snapshot-pinned reads for resume,
atomic data+lineage commits). This container has no Iceberg runtime jar, so
every write path in the engine talks to this facade: in production, configure
  spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog
and the same calls become `writeTo(...).append()` / snapshot reads; in the
sandbox they become parquet directories with the same layout. The
checkpoint protocol (sources/checkpoint.py) is written so its parquet
directory commits map 1:1 onto Iceberg transactions.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Uniform save/load/append across Iceberg identifiers and parquet dirs.

    base: a catalog namespace ('cat.db') when Iceberg is available, else a
    filesystem directory. Table names stay identical either way.
    """

    def __init__(self, spark: SparkSession, base: str, use_iceberg: Optional[bool] = None):
        self.spark = spark
        self.base = base.rstrip("/")
        self.iceberg = iceberg_available(spark) if use_iceberg is None else use_iceberg

    def _ident(self, name: str) -> str:
        return f"{self.base}.{name}" if self.iceberg else f"{self.base}/{name}"

    def save(self, df: DataFrame, name: str) -> None:
        if self.iceberg:
            df.writeTo(self._ident(name)).using("iceberg").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._ident(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.iceberg:
            df.writeTo(self._ident(name)).append()
        else:
            df.write.mode("append").parquet(self._ident(name))

    def _table_name(self, name: str) -> str:
        # session-catalog identifier for bucketed parquet tables (bucket
        # metadata lives in the catalog, not in the files)
        return "t_" + re.sub(r"[^A-Za-z0-9_]", "_", f"{self.base}_{name}")

    def save_bucketed(
        self, df: DataFrame, name: str, buckets: int, by: str = "doc_id"
    ) -> None:
        """Write hash-bucketed (and in-bucket sorted) on `by` — the layout
        that makes repeated joins/aggregations on that key EXCHANGE-FREE:
        two tables bucketed the same way sort-merge-join with no shuffle on
        either side (asserted in tests/test_catalog.py). At 100 TB this is
        how per-doc tables (spans, nodes, metrics, embeddings) co-locate so
        the doc_id join never reshuffles the big side. Iceberg: the
        bucket(N, col) partition transform; parquet fallback: a
        session-catalog bucketed table (bucket metadata is catalog-side, so
        reads must go through load(), which resolves the table name)."""
        if self.iceberg:
            from pyspark.sql import functions as F

            (
                df.writeTo(self._ident(name))
                .using("iceberg")
                .partitionedBy(F.bucket(buckets, F.col(by)))
                .createOrReplace()
            )
        else:
            (
                df.write.mode("overwrite")
                .bucketBy(buckets, by)
                .sortBy(by)
                .option("path", self._ident(name))
                .format("parquet")
                .saveAsTable(self._table_name(name))
            )

    def load(self, name: str, snapshot_id: Optional[int] = None) -> DataFrame:
        if self.iceberg:
            reader = self.spark.read
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            return reader.format("iceberg").load(self._ident(name))
        if snapshot_id is not None:
            raise ValueError("snapshot reads require an Iceberg catalog")
        if self.spark.catalog.tableExists(self._table_name(name)):
            # bucketed table: path reads would silently drop the bucket
            # spec — resolve through the catalog so joins stay shuffle-free
            return self.spark.table(self._table_name(name))
        return self.spark.read.parquet(self._ident(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._ident(name))
        import os

        return os.path.exists(self._ident(name))

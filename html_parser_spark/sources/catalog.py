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

    def load(self, name: str, snapshot_id: Optional[int] = None) -> DataFrame:
        if self.iceberg:
            reader = self.spark.read
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            return reader.format("iceberg").load(self._ident(name))
        if snapshot_id is not None:
            raise ValueError("snapshot reads require an Iceberg catalog")
        return self.spark.read.parquet(self._ident(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._ident(name))
        import os

        return os.path.exists(self._ident(name))

"""Table I/O abstraction: Iceberg when the runtime has the jars, parquet
otherwise (SURVEY.md §7 risk item — one interface, two backends).

At design scale the tables are Iceberg (snapshot isolation gives the
checkpoint-resume anti-join a consistent committed-set to read; partition
transform = bucket(doc_id)). The sandbox runtime ships no Iceberg jars, so
the parquet backend is what tests exercise; the interface is identical.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j attribute access never raises (returns a JavaPackage), so
        # probe the classpath explicitly; also require a configured catalog.
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.catalog.Catalog"
        )
        spark.conf.get("spark.sql.catalog.warehouse")
        return True
    except Exception:
        return False


class Warehouse:
    """A named-table warehouse rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = _iceberg_available(spark)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"warehouse.{table}")
        path = self.path(table)
        # A parquet "table" exists when its directory has a _SUCCESS marker
        # or at least one parquet part file.
        if not os.path.isdir(path):
            return False
        return any(
            name == "_SUCCESS" or name.endswith(".parquet")
            for name in os.listdir(path)
        )

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"warehouse.{table}")
        return self.spark.read.parquet(self.path(table))

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        if self.use_iceberg:
            writer = df.writeTo(f"warehouse.{table}")
            if mode == "append" and self.exists(table):
                writer.append()
            else:
                writer.createOrReplace()
            return
        # zstd: ~25-35% smaller than snappy on markdown/span text at similar
        # scan speed — at 10^12 docs that is tens of TB of storage and scan
        # I/O. Level 3 default; no sort imposed (doc_id arrival order already
        # clusters the bucket layout from ddl/iceberg.sql).
        df.write.mode(mode).option("compression", "zstd").parquet(self.path(table))

    def read_or_none(self, table: str) -> Optional[DataFrame]:
        return self.read(table) if self.exists(table) else None

"""Fan out a scan-starved input before explode-amplified work.

Explode-style operators (token/shingle/window hashing) multiply per-row
CPU by 10-1000x, so their cost is governed by the MAP stage's task count,
not the scan's byte count. A small corpus read from one parquet file
yields fewer scan partitions than cores (row-group granularity caps
file-split parallelism), starving the hash stage. Repartitioning the
tiny pre-explode rows costs one negligible shuffle and lets every core
work.

At production scale the scan already carries >= cores partitions, so the
auto mode is a structural no-op — no shuffle is added to a 100 TB read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fanout_scan"]


def fanout_scan(df: DataFrame, fanout: int | None = None) -> DataFrame:
    """Repartition df ahead of explode-amplified work if scan-starved.

    fanout=None (auto): repartition to defaultParallelism only when the
    incoming plan has fewer partitions than cores. fanout=0 disables.
    A positive int forces that width. Row values are never changed, so
    this is always safe for value-exact oracle parity.
    """
    if fanout is None:
        cores = df.sparkSession.sparkContext.defaultParallelism
        fanout = cores if df.rdd.getNumPartitions() < cores else 0
    return df.repartition(fanout) if fanout else df

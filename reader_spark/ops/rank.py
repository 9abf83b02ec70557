"""Distributed global ranking without a single-partition window.

``Window.orderBy(...)`` + ``row_number`` moves the entire input to ONE
partition (Spark logs the WindowExec "moving all data to a single
partition" warning) — a straggler the moment the ranked set is larger
than one executor's slice (e.g. a 1e8-1e9-term vocabulary at corpus
scale).  :func:`scalable_rank` produces the identical rank column with
the classic distributed-sort construction:

1. range-partition by the total order (``repartitionByRange`` — the
   same machinery ``orderBy`` uses, sampled boundaries, deterministic
   for a given input),
2. ``row_number`` *within* each range bucket (partitioned window — no
   single-partition exchange),
3. add per-bucket cumulative offsets (a count-per-bucket dim of at most
   ``buckets`` rows, cumsum'd and broadcast back).

Because bucket ``i``'s keys all precede bucket ``i+1``'s keys in the
total order, ``offset[bucket] + local_row_number`` equals the global
``row_number`` exactly, so callers' values (and their DuckDB oracles)
are unchanged.  The order columns must form a total order (include a
tie-break) for the rank to be deterministic — same contract as the
window form it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scalable_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "rank",
    buckets: int | None = None,
) -> DataFrame:
    """Append global ``row_number`` over ``order_cols`` without a
    single-partition window.

    ``order_cols``: list of Column expressions defining a TOTAL order
    (e.g. ``[F.desc("freq"), F.asc("term")]``).  ``buckets`` defaults to
    the session shuffle partitions.
    """
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order_cols = list(order_cols)
    bucketed = df.repartitionByRange(buckets, *order_cols).withColumn(
        "__rb", F.spark_partition_id()
    )
    counts = bucketed.groupBy("__rb").agg(F.count(F.lit(1)).alias("__n"))
    # Cumulative offsets over the bucket dim via a triangular self-join
    # (<= buckets rows) instead of an unpartitioned window — keeps the
    # whole plan free of single-partition WindowExec, even warnings.
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b.__rb") < F.col("a.__rb"), "left")
        .groupBy(F.col("a.__rb").alias("__rb"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).cast("long").alias("__off"))
    )
    within = Window.partitionBy("__rb").orderBy(*order_cols)
    return (
        bucketed.withColumn("__r", F.row_number().over(within))
        .join(F.broadcast(offsets), "__rb")
        .withColumn(rank_col, (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__rb", "__r", "__off")
    )

"""Stream-stream interval join: the streaming twin of
reader_spark.ops.joins.range_join_buckets (batch oracle:
`attribution_range_join`).

Structured Streaming executes an event-time-range equi-key join with
BOUNDED state when (a) both sides carry watermarks and (b) the join
condition constrains the two event times against each other — Spark then
derives how long each side's rows must be retained and evicts older state
(Spark docs: stream-stream joins, "inner joins with optional watermarking").
Without the time-range bound the state would grow forever; that is the
100 TB failure mode this module exists to avoid."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_interval_join(
    signups: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "12 hours",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """signups(event_id, user_id, ts) x purchases(user_id, ts, value)
    [streaming or batch] -> one row per (signup, purchase-in-window) pair:
    (signup_id, user_id, signup_ts, p_ts, value).

    Same semantics as the batch bucketed range join: start-inclusive,
    end-exclusive. State for a signup is droppable once the watermark
    passes signup_ts + window; purchase state once the watermark passes
    p_ts (the signup side can never need an older purchase)."""
    s = (
        signups.select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark_delay)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("value"),
        )
        .withWatermark("p_ts", watermark_delay)
    )
    cond = (
        (F.col("s_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("signup_ts"))
        & (F.col("p_ts") < F.col("signup_ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return s.join(p, cond, "inner").select(
        "signup_id",
        F.col("s_user_id").alias("user_id"),
        "signup_ts",
        "p_ts",
        F.col("value"),
    )

"""Event-time windowed aggregation with watermark (late-data handling).

The batch twin is __spark_entry__._q_events_hourly (oracle-checked); this is
the streaming cadence: tumbling event-time windows, with a watermark bounding
how late an event may arrive before its window's state is dropped. T5 in the
reference is single-attempt/no-late-retry (scraper.ts:361-383) — watermarks
are the dataset engine's principled version of "how long do we wait"."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """events(ts, event_type, value) [streaming or batch] ->
    (window_start, window_end, event_type, n, sum_value)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )

"""Streaming exact dedup with bounded state: dropDuplicatesWithinWatermark.

The batch twin is ops/dedup.exact_dedup (hash-groupBy, oracle-checked).
Streaming cannot keep every key ever seen — state must be bounded, so the
contract weakens to "no duplicates within the watermark horizon": a key's
state is dropped once the watermark passes it, exactly the trade a 10^12-doc
ingest pipeline makes (dedup-on-arrival within a window; global dedup stays
a batch job over the accumulated table).

Scale notes: state is keyed by the content hash (8 B + timestamp per key,
never payloads), partitioned by the shuffle on the key — the same uniform
64-bit distribution as batch exact dedup, so no skewed state stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    content_col: str = "text",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming frame -> ONE row per content hash within the watermark
    horizon (Spark keeps an arbitrary representative per key inside a
    microbatch — not necessarily the earliest-timestamped; observed
    empirically). Emits (content_hash, <original columns>)."""
    hashed = docs.withColumn("content_hash", F.xxhash64(F.col(content_col)))
    return hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )

"""SCD2 (slowly-changing-dimension, type 2) version history.

Turns an update/event stream into the warehouse-standard versioned
dimension: one row per (key, attribute-state) EPISODE with
[valid_from, valid_to) bounds and an is_current flag. Consecutive
updates that do not change the tracked attributes are collapsed —
only transitions create versions (the defining SCD2 property; without
the collapse every heartbeat event would mint a spurious version).

Shape at 100 TB: two window passes, both partitioned by the dimension
key — per-key state is one row of lag/lead, never a collected history;
key skew (a bot user with millions of updates) stays a single sorted
partition stream, not a driver problem. The change filter between the
passes shrinks the second window's input to transitions only.
Ordering is (ts, tiebreak) — the tiebreak is mandatory for
deterministic versions when updates share a timestamp.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_history(
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """(keys..., attrs..., valid_from, valid_to, is_current): one row per
    attribute episode; valid_to is the NEXT episode's start (half-open
    interval) and NULL on the current episode."""
    from pyspark.sql import Window

    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must each name >= 1 column")

    attrs = F.struct(*[F.col(c) for c in attr_cols])
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changes = (
        updates.withColumn("__prev", F.lag(attrs).over(w))
        .where(~attrs.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            *key_cols,
            *attr_cols,
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().cast("int").alias("is_current"),
        )
    )

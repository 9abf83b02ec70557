"""Cohort retention analysis over an activity stream.

The standard growth-analytics matrix: users are cohorted by the period
of their FIRST qualifying activity, and each (cohort, period-offset)
cell reports how many of them were active again that many periods
later, as a fraction of the cohort. Period indexing is pure integer
arithmetic against a fixed anchor date (floor(days_since_anchor / N)),
not calendar week-of-year — exact in any engine and immune to
locale/week-start differences.

Shape at 100 TB: every step is a user-keyed or (cohort, offset)-keyed
aggregate with map-side combine — first-activity election is ONE
groupBy(user) min; the distinct (user, period) activity set collapses
per-user event volume BEFORE the cohort join (a bot with millions of
events contributes one row per period); cohort sizes are a groupBy
over one row per user. No windows, nothing quadratic, and the cells
output is bounded by cohorts x offsets regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    activity: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    anchor_date: str = "2024-01-01",
    period_days: int = 7,
) -> DataFrame:
    """``activity`` is the pre-filtered qualifying-event stream (the
    caller decides what counts as 'active'). Returns one row per
    (cohort_week, week_offset): cohort_size, active_users, and
    retention = round(active_users / cohort_size, 6). Offset 0 is the
    cohort's own period (retention 1.0 by construction)."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")

    period = F.floor(
        F.datediff(
            F.col(ts_col).cast("date"), F.to_date(F.lit(anchor_date))
        )
        / period_days
    ).alias("wk")
    e = activity.select(F.col(user_col).alias("u"), period)
    first = e.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    active = e.distinct()
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        active.join(first, "u")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("u").alias("active_users"))
    )
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "cohort_size",
        "active_users",
        F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )

"""Declarative data-quality checks (Deequ-style constraint suite).

A pipeline writing 100 TB of curated data needs machine-checkable
contracts on its outputs — completeness, uniqueness, referential
integrity, accepted values, ranges — evaluated as METRICS with
thresholds, not assertions that die on first violation (cf. Schelter
et al., VLDB 2018: Deequ's "unit tests for data"). Each check here
computes one scalar metric in one aggregate (or one join + aggregate
for referential integrity) and reports (check_name, metric, passed);
the suite is a union of 1-row frames, so Spark runs the whole report
as a handful of independent map-side-combined jobs.

Metrics:
  completeness  — fraction of non-null values
  uniqueness    — fraction of values occurring exactly once (Deequ's
                  definition, stricter than distinctness)
  referential   — fraction of child keys present in the parent
                  (left-semi count / total; broadcastable parent)
  accepted      — fraction of values inside an allowed literal set
  in_range      — fraction of values inside [lo, hi]

All metrics are exact rational numbers (integer counts divided once)
rounded to 6 dp; `passed` compares metric >= threshold.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _finish(df: DataFrame, name: str, metric, threshold: float) -> DataFrame:
    m = F.round(metric, 6)
    return df.select(
        F.lit(name).alias("check_name"),
        m.alias("metric"),
        (m >= F.lit(threshold)).cast("int").alias("passed"),
    )


def check_completeness(
    df: DataFrame, col: str, threshold: float = 1.0, name: str | None = None
) -> DataFrame:
    agg = df.agg(
        F.count(F.lit(1)).alias("n"), F.count(F.col(col)).alias("nn")
    )
    return _finish(
        agg,
        name or f"completeness({col})",
        F.try_divide(F.col("nn").cast("double"), F.col("n")),
        threshold,
    )


def check_uniqueness(
    df: DataFrame, col: str, threshold: float = 1.0, name: str | None = None
) -> DataFrame:
    counts = df.where(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("uniq"),
    )
    return _finish(
        agg,
        name or f"uniqueness({col})",
        F.try_divide(F.col("uniq").cast("double"), F.col("n")),
        threshold,
    )


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    threshold: float = 1.0,
    name: str | None = None,
) -> DataFrame:
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    total = child.agg(F.count(F.col(child_col)).alias("n"))
    matched = child.join(F.broadcast(keys), child_col, "left_semi").agg(
        F.count(F.lit(1)).alias("m")
    )
    agg = total.crossJoin(matched)
    return _finish(
        agg,
        name or f"referential({child_col})",
        F.try_divide(F.col("m").cast("double"), F.col("n")),
        threshold,
    )


def check_accepted_values(
    df: DataFrame,
    col: str,
    allowed: Sequence[str],
    threshold: float = 1.0,
    name: str | None = None,
) -> DataFrame:
    agg = df.agg(
        F.count(F.col(col)).alias("n"),
        F.sum(
            F.when(F.col(col).isin(list(allowed)), 1).otherwise(0)
        ).alias("ok"),
    )
    return _finish(
        agg,
        name or f"accepted({col})",
        F.try_divide(F.col("ok").cast("double"), F.col("n")),
        threshold,
    )


def check_in_range(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    threshold: float = 1.0,
    name: str | None = None,
) -> DataFrame:
    v = F.col(col)
    agg = df.agg(
        F.count(v).alias("n"),
        F.sum(F.when((v >= lo) & (v <= hi), 1).otherwise(0)).alias("ok"),
    )
    return _finish(
        agg,
        name or f"in_range({col})",
        F.try_divide(F.col("ok").cast("double"), F.col("n")),
        threshold,
    )


def quality_report(checks: Sequence[DataFrame]) -> DataFrame:
    """Union a suite of check frames into the report table."""
    checks = list(checks)
    if not checks:
        raise ValueError("checks must contain at least one check frame")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out

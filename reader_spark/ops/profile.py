"""Single-pass numeric column profiling (the pre-training data-quality
table: count / nulls / distinct / min / max / mean / stddev / median per
column).

Shape: ALL requested columns' statistics compute in ONE aggregate pass
over the table (one map-side-combined shuffle to a single row), then a
driver-free stack() unpivots that row to one output row per column. The
naive per-column loop would scan the table k times; this scans once
regardless of k.

Medians are exact `percentile` (linear interpolation, matching DuckDB's
quantile_cont) — at 100 TB swap for approx_percentile(., ., accuracy) and
accept the documented error bound; the exact form is the oracle-checkable
contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METRICS = ("n", "n_null", "n_distinct", "min", "max", "mean", "stddev", "p50")


def numeric_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per profiled column:
    (col_name, n, n_null, n_distinct, min, max, mean, stddev, p50).
    All statistics are DOUBLE (rounded to 6 dp where float-valued) so the
    unpivot is type-uniform and engine-portable.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")

    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs.extend(
            [
                F.count(F.lit(1)).cast("double").alias(f"{c}__n"),
                (F.count(F.lit(1)) - F.count(col)).cast("double").alias(f"{c}__n_null"),
                F.countDistinct(col).cast("double").alias(f"{c}__n_distinct"),
                F.round(F.min(col), 6).alias(f"{c}__min"),
                F.round(F.max(col), 6).alias(f"{c}__max"),
                F.round(F.avg(col), 6).alias(f"{c}__mean"),
                F.round(F.stddev(col), 6).alias(f"{c}__stddev"),
                F.round(F.expr(f"percentile(CAST({c} AS DOUBLE), 0.5)"), 6).alias(f"{c}__p50"),
            ]
        )
    one_row = df.agg(*aggs)

    stack_args = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{c}__{m}`" for m in _METRICS)
        )
        for c in cols
    )
    stacked = one_row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        f"(col_name, {', '.join(_METRICS)})"
    )
    return stacked

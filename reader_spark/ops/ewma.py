"""Per-group exponentially-weighted moving average (EWMA).

EWMA is the canonical INHERENTLY-SEQUENTIAL per-key computation:
y_t = alpha*x_t + (1-alpha)*y_{t-1}. No fixed-width window expresses
it, and unrolling the recurrence as a closed-form weighted sum
(y_t = (1-a)^t x_0 + a * sum (1-a)^{t-i} x_i) needs (1-a)^{-i} factors
that overflow float64 after a few thousand rows — so the closed form
is an ORACLE-ONLY twin for short series, and the production path is
`applyInPandas`: one Arrow-batched pandas ewm per group, exactly the
sanctioned shape for per-key imperative state (same family as the
fused extraction UDF and applyInPandasWithState sessions).

Shape at 100 TB: one shuffle on the group key; per-task work is a
vectorized pandas pass over each group's rows (numpy C loop, not
per-row Python). Group skew = one big pandas frame, still linear.
A bot key with 10^8 events is bounded by executor memory — cap with
per-(key, day) sub-grouping upstream if profiles demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_ewma(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """df plus ``out_col``: the running EWMA of value_col within each
    group, ordered by order_cols (include a tiebreaker for determinism).
    Initialized at the first value (adjust=False pandas semantics:
    y_0 = x_0). Output rounded to 6 dp."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not group_cols or not order_cols:
        raise ValueError("group_cols and order_cols must each name >= 1 column")

    schema_fields = df.schema.fields
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema_fields
    )
    out_schema += f", `{out_col}` double"
    order = list(order_cols)

    def ewma_pdf(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        series = pdf[value_col].astype("float64")
        pdf[out_col] = series.ewm(alpha=alpha, adjust=False).mean().round(6)
        return pdf

    return df.groupBy(*group_cols).applyInPandas(ewma_pdf, schema=out_schema)

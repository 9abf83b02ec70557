"""Single-pass numeric column profiling (the pre-training data-quality
table: count / nulls / distinct / min / max / mean / stddev / median per
column).

Shape: ALL requested columns' statistics compute in ONE aggregate pass
over the table (one map-side-combined shuffle to a single row), then a
driver-free stack() unpivots that row to one output row per column. The
naive per-column loop would scan the table k times; this scans once
regardless of k.

Two modes (same pattern as the md5/xxhash sketch twins):
- ``exact=False`` (the PRODUCTION path at scale): approx_percentile
  (KLL-style mergeable sketch, no sort) + approx_count_distinct
  (HyperLogLog++, relative error ~2.3% at the default rsd) — every
  statistic is a mergeable partial aggregate, so the whole profile is one
  map-side-combined pass with no per-column global sort.
- ``exact=True`` (the ORACLE twin): exact `percentile` (linear
  interpolation, matching DuckDB's quantile_cont) + countDistinct; this is
  the oracle-checkable contract, kept for correctness verification and
  small inputs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METRICS = ("n", "n_null", "n_distinct", "min", "max", "mean", "stddev", "p50")


def numeric_profile(
    df: DataFrame,
    cols: Sequence[str],
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n, n_null, n_distinct, min, max, mean, stddev, p50).
    All statistics are DOUBLE (rounded to 6 dp where float-valued) so the
    unpivot is type-uniform and engine-portable.

    ``exact=False`` is the production mode at scale: median via
    approx_percentile(accuracy) and distinct via approx_count_distinct —
    both mergeable sketches, no global sort in the plan (pinned by
    tests/test_plans.py). ``accuracy`` trades memory for percentile error
    (bounded by 1/accuracy relative rank error).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")

    # Plan shape (guide §2.4): the percentile/base statistics and the
    # distinct counts run as TWO separate 1-row aggregates cross-joined
    # together. Mixing k countDistinct with exact percentile in ONE agg
    # plans an Expand x(k+1) whose first aggregate is keyed by the
    # distinct-value columns — every distinct value owns a percentile
    # partial buffer that then crosses the exchange (measured 17.2 s at
    # sf0.1; split form ~3 s, identical values). Split, the base pass is
    # one partial-aggregating ObjectHashAggregate with no Expand, and
    # the distinct pass is a plain count-only HashAggregate over the
    # narrow Expand stream.
    base_aggs = []
    distinct_aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        if exact:
            distinct = F.countDistinct(col).cast("double")
            p50 = F.expr(f"percentile(CAST({c} AS DOUBLE), 0.5)")
        else:
            distinct = F.approx_count_distinct(col).cast("double")
            p50 = F.expr(
                f"approx_percentile(CAST({c} AS DOUBLE), 0.5, {int(accuracy)})"
            )
        if exact:
            distinct_aggs.append(distinct.alias(f"{c}__n_distinct"))
        else:
            # approx_count_distinct is a mergeable sketch — no Expand,
            # so approx mode stays ONE single-pass aggregate.
            base_aggs.append(distinct.alias(f"{c}__n_distinct"))
        base_aggs.extend(
            [
                F.count(F.lit(1)).cast("double").alias(f"{c}__n"),
                (F.count(F.lit(1)) - F.count(col)).cast("double").alias(f"{c}__n_null"),
                F.round(F.min(col), 6).alias(f"{c}__min"),
                F.round(F.max(col), 6).alias(f"{c}__max"),
                F.round(F.avg(col), 6).alias(f"{c}__mean"),
                F.round(F.stddev(col), 6).alias(f"{c}__stddev"),
                F.round(p50, 6).alias(f"{c}__p50"),
            ]
        )
    one_row = df.agg(*base_aggs)
    if distinct_aggs:
        one_row = one_row.crossJoin(df.agg(*distinct_aggs))

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


def equi_width_histogram(
    df: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Exact equi-width histogram: (bin, lo, hi, n) over ``bins`` equal
    intervals of [min, max], max landing in the last bin. One min/max
    aggregate (1-row broadcast dim) + one map-side-combined groupBy —
    scan-local binning, shuffle bounded by ``bins`` rows, any scale.

    Bin index uses least(bins-1, floor((v-min)*bins/span)) on DOUBLE
    arithmetic; bin edges are reported rounded to 6 dp. NULL values are
    excluded (profile them via numeric_profile's n_null)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(col).cast("double")
    mm = df.where(v.isNotNull()).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    span = F.col("__hi") - F.col("__lo")
    idx = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((v - F.col("__lo")) * bins / span),
        )
    ).cast("long")
    width = span / bins
    return (
        df.where(v.isNotNull())
        .crossJoin(F.broadcast(mm))
        .groupBy(idx.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("__lo"),
            F.first("__hi").alias("__hi"),
        )
        .select(
            "bin",
            F.round(F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / bins, 6).alias("lo"),
            F.round(F.col("__lo") + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / bins, 6).alias("hi"),
            "n",
        )
    )


def grouped_linreg(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary least squares in ONE aggregate pass: the
    closed-form slope/intercept/r2 from the five sufficient statistics
    (n, Sx, Sy, Sxy, Sxx [, Syy]) — the grouped-trend primitive
    (metric drift per segment, quality trend per domain) without MLlib
    or any iteration. One map-side-combined groupBy at any scale; the
    sufficient statistics are mergeable, so partial aggregation
    absorbs group skew.

    CALLER NOTE on conditioning: center x near zero (days since an
    anchor, not epoch seconds) — nSxx - Sx^2 on large-magnitude x is
    catastrophic cancellation in doubles. Outputs rounded to 6 dp;
    degenerate groups (constant x) get NULL slope/intercept/r2 via
    try_divide rather than an error.
    """
    group_cols = list(group_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den_x = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    den_y = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = F.try_divide(num, den_x)
    intercept = F.try_divide(F.col("__sy") - slope * F.col("__sx"), F.col("__n"))
    r2 = F.try_divide(num * num, den_x * den_y)
    return agg.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """The pre-shuffle skew diagnostic: top-N heaviest keys with their
    share of rows and hot-key factor (multiple of the mean key size).
    This is the number that decides salting / AQE-skew-join / isolation
    for a planned groupBy/join on ``key_col`` — run it BEFORE shipping a
    job that shuffles 100 TB on a key nobody profiled (the giant-doc
    isolation in spark/job.py is this op's conclusion applied to doc
    size).

    Returns (key, n, frac, hot_factor, rank): hot_factor = n / mean key
    count — >> 1 means that key alone stalls its reducer.

    One map-side-combined groupBy; totals ride back as a 1-row broadcast
    dim; top-N via sort+limit compiles to TakeOrderedAndProject (per-
    partition partial top-k, no global sort).
    """
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__n_keys"),
    )
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("frac"),
            F.round(
                F.col("n") / (F.col("__total") / F.col("__n_keys")), 6
            ).alias("hot_factor"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(top)
    )
    w = Window.orderBy(F.desc("n"), "key")
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-depth (quantile) histogram: bin edges at the i/bins
    percentiles, each bin holding ~equal row mass — the selectivity-
    estimation companion to equi_width_histogram (constant resolution in
    probability, not value; what query optimizers store). Returns
    (bin, lo, hi, n): lo/hi are the bin's edge values (6 dp), bin 0
    starts at the min. Ties sit in the LOWEST bin whose upper edge
    admits them (edge assignment, not row-number splitting — the
    semantic that is partitioning-invariant).

    Two modes, same twin pattern as numeric_profile: exact ``percentile``
    edges are the oracle contract; ``exact=False`` swaps in
    approx_percentile (mergeable sketch) for the production path — NO
    global sort in either mode (edges come from an aggregate; binning is
    a scan-local comparison against the broadcast edge array).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(col).cast("double")
    qs = [i / bins for i in range(bins + 1)]
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {int(accuracy)}"
    edges = df.where(v.isNotNull()).agg(
        F.expr(
            f"transform({fn}(CAST({col} AS DOUBLE), array({', '.join(map(str, qs))}){acc}),"
            " e -> round(e, 9))"
        ).alias("__edges")
    )
    inner = F.slice(F.col("__edges"), 2, bins - 1)  # exclusive upper edges
    bin_idx = F.size(F.filter(inner, lambda e: v > e)).cast("long")
    counts = (
        df.where(v.isNotNull())
        .crossJoin(F.broadcast(edges))
        .groupBy(bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # edge labels attach AFTER the count (first(array) inside the agg
    # would force a SortAggregate; this keeps the count a hash aggregate)
    return counts.crossJoin(F.broadcast(edges)).select(
        "bin",
        F.round(F.element_at("__edges", F.col("bin").cast("int") + 1), 6).alias("lo"),
        F.round(F.element_at("__edges", F.col("bin").cast("int") + 2), 6).alias("hi"),
        "n",
    )

"""Ordered-step funnel analysis over an event stream.

The classic product-analytics operator: for an ordered step sequence
(view -> click -> purchase), find each user's FIRST completion of step
1, then the first step-2 event strictly after it (optionally within a
max gap), then the first step-3 event after that, and report per-step
reach + conversion. The ordering constraint is what distinguishes a
funnel from k independent filters.

Shape at 100 TB: each step is one equi-join of the (user, t_prev)
stage table onto the typed event slice plus one map-side-combined
groupBy(user) min — the stage table only SHRINKS step over step, and
every shuffle is keyed on user (AQE reuses the partitioning across
steps). No windows over unbounded per-user partitions, no
collect_list of event histories, state per user is one timestamp per
step. Event-time skew (one bot user with millions of events) is
absorbed by the partial min.

Timestamps compare exactly (microsecond integers); no float is
involved until the final conversion ratio.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    steps: Sequence[str] = (),
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Per-user stage-completion times: (user, t1, ..., tk) where t_i
    is the first step-i event strictly after t_{i-1} (and within
    ``max_gap_seconds`` of it when set); NULL once a user drops out."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("steps must name at least two ordered steps")
    if max_gap_seconds is not None and max_gap_seconds < 1:
        raise ValueError(f"max_gap_seconds must be >= 1, got {max_gap_seconds}")

    e = events.select(user_col, ts_col, type_col)
    t_prev = (
        e.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    chain = t_prev
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        cond = F.col(ts_col) > F.col(prev)
        if max_gap_seconds is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col(prev) + F.expr(f"INTERVAL {int(max_gap_seconds)} SECOND")
            )
        t_cur = (
            e.where(F.col(type_col) == step)
            .join(t_prev.select(user_col, prev), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        chain = chain.join(t_cur, user_col, "left")
        t_prev = t_cur
    return chain


def funnel_summary(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    steps: Sequence[str] = (),
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """One row per step: (step_index, step, users, conv_from_prev).
    conv is round(users_i / users_{i-1}, 6) (step 1 converts from
    itself -> 1.0); NULL if the previous stage is empty."""
    steps = list(steps)
    times = funnel_times(
        events, user_col, ts_col, type_col, steps, max_gap_seconds
    )
    wide = times.agg(
        *[F.count(F.col(f"t{i}")).alias(f"u{i}") for i in range(1, len(steps) + 1)]
    )
    rows = []
    for i, step in enumerate(steps, start=1):
        prev = f"u{i - 1}" if i > 1 else f"u{i}"
        rows.extend(
            [
                F.lit(i).cast("long").alias(f"si_{i}"),
                F.lit(step).alias(f"sn_{i}"),
                F.col(f"u{i}").alias(f"uu_{i}"),
                F.round(
                    F.try_divide(F.col(f"u{i}").cast("double"), F.col(prev)), 6
                ).alias(f"cv_{i}"),
            ]
        )
    stack_args = ", ".join(
        f"si_{i}, sn_{i}, uu_{i}, cv_{i}" for i in range(1, len(steps) + 1)
    )
    return wide.select(*rows).selectExpr(
        f"stack({len(steps)}, {stack_args}) AS "
        "(step_index, step, users, conv_from_prev)"
    )

"""Deterministic batch-schedule generation for a target domain mix.

The missing last step between a PLANNED mix (ops/sampling.py,
ops/allocate.py emit per-domain weights) and a TRAINING RUN: the exact,
reproducible order in which the data loader should draw batches from
each domain so that every prefix of training sees the target mix. This
is stride scheduling (Waldspurger & Weihl, OSDI 1995) — domain d's k-th
batch carries virtual time ``vt = (k+1) / weight_d``; executing in
global vt order bounds every domain's lag behind its entitlement by a small
constant, which is exactly the guarantee curriculum reproducibility needs
(the same property proportional-share CPU schedulers prove).

Integer contract: ``vt = ((k+1) * total_weight * 1000) div weight_d``
— exact longs, ties broken by domain name, so the schedule is a pure
function of (weights, n_steps) and identical in both engines.

Scale shape: candidates are ``(domain, k)`` pairs — the bounded domain
dim times at most ``n_steps * w/total + 2`` each, so ~n_steps rows
total, NOT corpus rows. The global order materializes via
ops/rank.scalable_rank (range buckets + partitioned row_number +
broadcast offsets) — no single-partition WindowExec at any n_steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.rank import scalable_rank

__all__ = ["mix_schedule"]


def mix_schedule(domains: DataFrame, n_steps: int) -> DataFrame:
    """Emit the first ``n_steps`` of the stride schedule.

    Input ``domains``: ``(domain, weight_milli)`` with positive integer
    weights (any scale). Output ``(step, domain, k)`` — at step
    ``step`` (1-based) the loader draws domain ``domain``'s ``k``-th
    batch (0-based). Every domain's count through any prefix stays
    within a small constant (< 2 batches) of
    ``prefix_len * w_d / total_w`` (stride scheduling's lag bound;
    pinned by test).
    """
    if not 0 < n_steps <= 1_000_000_000:
        raise ValueError(f"n_steps must be in (0, 1e9], got {n_steps}")
    tot = domains.agg(
        F.sum(F.col("weight_milli").cast("long")).alias("__tw")
    )
    base = domains.where(F.col("weight_milli") > 0).join(F.broadcast(tot))
    # Enough candidates per domain to cover n_steps, +2 safety margin.
    cnt = F.expr(
        f"(CAST({int(n_steps)} AS BIGINT) * weight_milli) div __tw + 2"
    )
    cands = base.select(
        "domain",
        "weight_milli",
        "__tw",
        F.explode(F.sequence(F.lit(0).cast("long"), cnt)).alias("k"),
    ).select(
        "domain",
        "k",
        F.expr("((k + 1) * __tw * 1000) div weight_milli").alias("vt"),
    )
    ranked = scalable_rank(
        cands, [F.asc("vt"), F.asc("domain")], rank_col="step"
    )
    return ranked.where(F.col("step") <= n_steps).select(
        F.col("step").cast("long"),
        "domain",
        F.col("k").cast("long").alias("k"),
    )

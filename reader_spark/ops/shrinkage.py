"""Empirical-Bayes shrinkage of per-group quality rates.

The crawl-prioritization input a raw rate cannot be: a domain with 2/2
good pages must NOT outrank one with 9,500/10,000 — small-sample rates
need pulling toward the corpus rate. This is m-estimate smoothing
(Cestnik, "Estimating probabilities: a crucial task in machine
learning", ECAI 1990; the m-probability of Mitchell's ML textbook
§6.9.1.1), i.e. a Beta(K*m, K*(1-m)) prior centred on the pooled rate
m with prior strength K pseudo-observations:

    shrunk_g = (x_g + K * m) / (n_g + K)

Exact integers: the pooled rate rides as ONE micro-unit scalar
(1-row broadcast dim — the price_histogram pattern), and the shrunk
rate is a single trunc-div of non-negative longs, so both engines
agree bit-for-bit.

Shape at 100 TB: one map-side-combined groupBy to the bounded group
dim (domains/sources), one scalar aggregate for the pool, one
broadcast join. Nothing wider than (group, two counters) shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def shrunk_rates(
    flags: DataFrame,
    group_col: str = "source",
    flag_col: str = "is_good",
    prior_strength: int = 100,
) -> DataFrame:
    """Per-group smoothed success rates.

    Input: one row per item with a 0/1 ``flag_col``. Output per group:
    ``(group, n_items, n_good, raw_milli, shrunk_milli, delta_milli)``
    where ``shrunk_milli`` is the m-estimate in milli-units and
    ``delta_milli = shrunk - raw`` (positive = the prior pulled the
    group UP: it was small and below the pool, or above it and tiny).
    """
    if not 1 <= prior_strength <= 1_000_000:
        raise ValueError(
            f"prior_strength must be in [1, 1e6], got {prior_strength}"
        )
    k = int(prior_strength)
    per_group = flags.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("n_good"),
    )
    pool = per_group.groupBy().agg(
        F.expr(f"sum(n_good) * {_MICRO}L div sum(n_items)")
        .cast("long")
        .alias("pool_micro")
    )
    return (
        per_group.crossJoin(F.broadcast(pool))
        .select(
            group_col,
            "n_items",
            "n_good",
            F.expr("n_good * 1000 div n_items").cast("long").alias(
                "raw_milli"
            ),
            F.expr(
                f"(n_good * {_MICRO}L + {k}L * pool_micro)"
                f" div ((n_items + {k}) * 1000)"
            ).cast("long").alias("shrunk_milli"),
        )
        .withColumn(
            "delta_milli", F.col("shrunk_milli") - F.col("raw_milli")
        )
    )

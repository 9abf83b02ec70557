"""Poisson-bootstrap confidence intervals for corpus statistics.

Every curation decision in this engine compares corpus statistics
(mean quality, mean length, kept-fraction) across pipeline variants —
but a point estimate over a sampled fixture says nothing about whether
a 2% difference is real. The online/streaming form of the bootstrap
(Poisson bootstrap: Chamandy et al. 2012, "Estimating Uncertainty for
Massive Data Streams", Google TR; Owen & Eckles 2012) replaces the
resample-with-replacement loop with independent Poisson(1) weights per
(row, replicate): one scan computes ALL replicates, which is the only
bootstrap that works when rows can't be enumerated twice.

Determinism + portability: the Poisson(1) draw is the inverse-CDF
applied to ``u = uint32(md5(key || ':' || replicate)[:8]) % 10^6``
(the repo's portable md5 register discipline) against HARD-CODED
micro-unit CDF thresholds — integer comparisons only, identical in
both engines; no RNG state anywhere.

Scale shape (10^12 rows, R replicates):
  * one ``posexplode(sequence(0, R-1))`` fans each row into R skinny
    (group, replicate, weight, weight*x) rows — then ONE
    groupBy(group, replicate) with map-side combine: the shuffle
    carries <= partitions x groups x R partial rows, never documents.
  * the percentile step runs over the bounded (group x R) frame:
    ``sort_array(collect_list(...))`` per group, R <= 64.

All means are integer milli-units (exact sums, floor division).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["poisson_weight", "bootstrap_mean_ci"]

# P(X <= k) for X ~ Poisson(1), in MICRO-units (floor), k = 0..6; draws
# above the last threshold produce weight 7 (P ~ 8e-5). Part of the
# spec: both engines compare the same integers.
POISSON1_CDF_MICRO: tuple[int, ...] = (
    367879,
    735758,
    919698,
    981011,
    996340,
    999405,
    999916,
)


def poisson_weight(key: Column, replicate: Column) -> Column:
    """Deterministic Poisson(1) weight for (key, replicate)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(":"),
                               replicate.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    w = F.lit(len(POISSON1_CDF_MICRO)).cast("long")
    for k in range(len(POISSON1_CDF_MICRO) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF_MICRO[k], F.lit(k).cast("long")).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    key_col: str,
    replicates: int = 32,
    alpha_milli: int = 50,
) -> DataFrame:
    """Per-group bootstrap CI of ``mean(value)``.

    Returns ``(<group_col>, n_rows, mean_milli, lo_milli, hi_milli,
    n_replicates)`` where lo/hi are the alpha/2 and 1-alpha/2 empirical
    percentiles of the R Poisson-replicate means (milli-units, exact
    integer math; percentile ranks floor/ceil to the nearest replicate
    — the conservative convention).
    """
    if not 2 <= replicates <= 64:
        raise ValueError(f"replicates must be in [2, 64], got {replicates}")
    if not 0 < alpha_milli < 500:
        raise ValueError(f"alpha_milli must be in (0, 500), got {alpha_milli}")
    r = F.posexplode(F.sequence(F.lit(0), F.lit(replicates - 1)))
    fanned = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(key_col).alias("__k"),
            F.col(value_col).cast("long").alias("__x"),
            r.alias("__p", "replicate"),
        )
        .select(
            "__g",
            "replicate",
            poisson_weight(F.col("__k"), F.col("replicate")).alias("__w"),
            "__x",
        )
        .groupBy("__g", "replicate")
        .agg(
            F.sum("__w").alias("sw"),
            F.sum(F.col("__w") * F.col("__x")).alias("swx"),
        )
        .select(
            "__g",
            "replicate",
            F.expr("(swx * 1000) div greatest(sw, 1)").alias("rep_mean"),
        )
    )
    # replicate ranks for the CI cut (0-indexed into the sorted array).
    lo_idx = (alpha_milli * replicates) // 1000
    hi_idx = replicates - 1 - lo_idx
    reps = fanned.groupBy("__g").agg(
        F.sort_array(F.collect_list("rep_mean")).alias("ms")
    )
    point = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr(f"(sum(CAST({value_col} AS BIGINT)) * 1000) div count(*)")
        .cast("long")
        .alias("mean_milli"),
    )
    return point.join(reps, "__g").select(
        F.col("__g").alias(group_col),
        "n_rows",
        "mean_milli",
        F.element_at("ms", lo_idx + 1).cast("long").alias("lo_milli"),
        F.element_at("ms", hi_idx + 1).cast("long").alias("hi_milli"),
        F.lit(replicates).cast("long").alias("n_replicates"),
    )

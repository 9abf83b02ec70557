"""Distribution-drift detectors: two-sample Kolmogorov-Smirnov and PSI.

The data-quality alarms a 100 TB ingest pipeline runs between crawl batches
(did the `value` distribution of a feed shift?) or between A/B arms. Both
are GROUPED — every window partitions by the drift key (event_type, source,
feed id), so there is no global sort anywhere; per-key work is one
sort-within-partition (KS needs an ordered ECDF by definition) plus
map-side-combined aggregates.

- KS: exact two-sample statistic D = max_x |F_a(x) - F_b(x)| with proper
  tie handling (ECDF evaluated on per-value aggregated counts), plus the
  large-sample alpha=0.05 critical value 1.358*sqrt((n_a+n_b)/(n_a*n_b))
  (Smirnov 1948 asymptotic).
- PSI: population stability index over deciles of the REFERENCE arm
  (industry-standard credit-scoring drift metric): add-1 smoothed bin
  shares, PSI = sum (p-q) ln(p/q); >0.2 is the conventional "significant
  shift" threshold. The term sum runs over the FULL n_bins grid (a bin
  empty in both arms still contributes (1/(n_ref+B) - 1/(n_cur+B)) *
  ln(...), which is nonzero whenever n_ref != n_cur) — the sparse
  observed-bins-only shortcut is exact only for equal arm sizes.

Engine-portable: ratios of integer counts, round-9 terms, integer
nano-unit sums where addition order could bite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_two_sample", "psi_deciles"]

_KS_C_05 = 1.358  # Smirnov asymptotic c(alpha) at alpha = 0.05


def ks_two_sample(
    df: DataFrame,
    key_col: str,
    value_col: str,
    in_a: Column,
) -> DataFrame:
    """Per-key exact two-sample KS between rows where `in_a` and the rest.

    Returns (key, n_a, n_b, ks, ks_crit, drifted). The only shuffle is the
    per-key hash exchange; the ECDF window sorts within each key partition.
    """
    pts = (
        df.groupBy(F.col(key_col).alias("key"), F.col(value_col).alias("v"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("a_c"),
            F.sum(F.when(in_a, 0).otherwise(1)).alias("b_c"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("key")
    cum = pts.select(
        "key",
        F.sum("a_c").over(w).alias("ca"),
        F.sum("b_c").over(w).alias("cb"),
        F.sum("a_c").over(wall).alias("n_a"),
        F.sum("b_c").over(wall).alias("n_b"),
    )
    d = F.round(
        F.abs(F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b")), 9
    )
    return (
        cum.groupBy("key")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.round(F.max(d), 6).alias("ks"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_a",
            "n_b",
            "ks",
            F.round(
                _KS_C_05
                * F.sqrt((F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))),
                6,
            ).alias("ks_crit"),
        )
        .withColumn(
            "drifted", F.when(F.col("ks") > F.col("ks_crit"), 1).otherwise(0)
        )
    )


def psi_deciles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    in_ref: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Per-key PSI of the non-reference arm against decile bins of the
    reference arm. Returns (key, n_ref, n_cur, psi, drifted).

    Edge computation is ONE exact-percentile aggregate per key (no global
    sort; swap `percentile` for `approx_percentile` at 100 TB — same twin
    discipline as ops.profile.numeric_profile). The per-key edge arrays are
    a tiny dim joined back on the key.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    ref_v = F.when(in_ref, F.col(value_col))
    edges = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.transform(
                F.percentile(ref_v, F.array(*[F.lit(q) for q in qs])),
                lambda e: F.round(e, 9),
            ).alias("__edges")
        )
    )
    tagged = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("v"),
        in_ref.alias("__ref"),
    )
    binned = (
        tagged.join(F.broadcast(edges), "key")
        .select(
            "key",
            "__ref",
            F.size(F.filter(F.col("__edges"), lambda e: F.col("v") > e)).alias("bin"),
        )
        .groupBy("key", "bin")
        .agg(
            F.sum(F.when(F.col("__ref"), 1).otherwise(0)).alias("r_c"),
            F.sum(F.when(F.col("__ref"), 0).otherwise(1)).alias("c_c"),
        )
    )
    # Densify to the full n_bins grid: a bin empty in BOTH arms still
    # carries a nonzero smoothed term when n_ref != n_cur (ADVICE r3) —
    # the edges dim already has exactly one row per key, so the grid is a
    # cheap per-key explode, joined back onto the observed bin counts.
    grid = edges.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    dense = grid.join(binned, ["key", "bin"], "left").select(
        "key",
        F.coalesce("r_c", F.lit(0)).alias("r_c"),
        F.coalesce("c_c", F.lit(0)).alias("c_c"),
    )
    wall = Window.partitionBy("key")
    sm = dense.select(
        "key",
        "r_c",
        "c_c",
        F.sum("r_c").over(wall).alias("n_ref"),
        F.sum("c_c").over(wall).alias("n_cur"),
    )
    p = (F.col("r_c") + 1) / (F.col("n_ref") + n_bins)
    q = (F.col("c_c") + 1) / (F.col("n_cur") + n_bins)
    term_units = F.round(F.round((p - q) * F.log(p / q), 9) * 1e9).cast("long")
    return (
        sm.groupBy("key")
        .agg(
            F.max("n_ref").cast("long").alias("n_ref"),
            F.max("n_cur").cast("long").alias("n_cur"),
            F.round(F.sum(term_units) / 1e9, 6).alias("psi"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_ref",
            "n_cur",
            "psi",
            F.when(F.col("psi") > 0.2, 1).otherwise(0).alias("drifted"),
        )
    )

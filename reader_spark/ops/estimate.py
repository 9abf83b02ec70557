"""Capture-recapture estimators of crawl coverage — "how big is the
part of the site/web we have NOT seen?", the question a crawl-budget
planner must answer before allocating refresh vs discovery budget.
Two classic estimators over capture logs:

* **Chao1** (Chao 1984, "Nonparametric estimation of the number of
  classes in a population"): from ONE crawl's per-URL capture counts,
  richness ≈ D + f1^2 / (2 f2) with f1/f2 the singleton/doubleton
  counts; implemented in the bias-corrected form
  D + f1(f1-1) / (2(f2+1)) which is defined even when f2 = 0. Heavy
  revisit skew (f1 -> 0) correctly signals "we've seen it all".

* **Good-Turing unseen mass** (Good 1953): P(next capture is a NEW
  URL) ≈ f1 / n_captures — the discovery-rate dual of Chao1's "how
  many URLs exist", emitted alongside it in exact milli units.

* **Lincoln-Petersen / Chapman** (Chapman 1951): two INDEPENDENT crawl
  samples A and B; N ≈ (|A|+1)(|B|+1)/(|A∩B|+1) - 1. The overlap of
  two crawler fleets estimates the frontier neither has covered.

Engine parity: both estimators are exact integer arithmetic to the
final 2 dp — counts are BIGINTs and the estimate is rendered as
(integer centi-units) / 100. Shape at 100 TB: Chao1 is two map-side-
combined aggregates (per-key count, then the f-profile); Chapman is
two distincts + one equi-join overlap count — no windows, no
all-pairs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chao1_estimate(
    captures: DataFrame, key_col: str = "url"
) -> DataFrame:
    """One row: (n_captures, n_observed, f1, f2, est_richness,
    gt_unseen_milli) from a capture log with one row per fetch
    (duplicates = revisits); gt_unseen_milli = Good-Turing P(new) in
    exact milli units."""
    per_key = captures.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    prof = per_key.agg(
        F.sum("c").cast("long").alias("n_captures"),
        F.count(F.lit(1)).cast("long").alias("n_observed"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    est = (
        F.col("n_observed") * 100
        + F.expr("(f1 * (f1 - 1) * 100) div (2 * (f2 + 1))")
    ) / F.lit(100.0)
    gt = F.expr("(f1 * 1000) div n_captures")
    return prof.select(
        "n_captures",
        "n_observed",
        "f1",
        "f2",
        est.alias("est_richness"),
        gt.alias("gt_unseen_milli"),
    )


def chapman_estimate(
    a: DataFrame, b: DataFrame, key_col: str = "url"
) -> DataFrame:
    """One row: (n_a, n_b, n_both, est_total) from two independent
    capture samples (Chapman's bias-corrected Lincoln-Petersen)."""
    da = a.select(F.col(key_col).alias("k")).distinct()
    db = b.select(F.col(key_col).alias("k")).distinct()
    na = da.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = db.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    m = da.join(db, "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    est = (
        F.expr("((n_a + 1) * (n_b + 1) * 100) div (n_both + 1)") - 100
    ) / F.lit(100.0)
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(m))
        .select("n_a", "n_b", "n_both", est.alias("est_total"))
    )

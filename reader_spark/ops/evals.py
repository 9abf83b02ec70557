"""Filter/classifier calibration over big tables — threshold sweeps.

A training-data pipeline gates on scores (quality logits, LM perplexity,
centroid distances); choosing the cut needs the precision/recall trade-off
AT EVERY THRESHOLD against a labeled sample. The sweep is one groupBy
(bounding the output to distinct rounded scores) + one cumulative window
over that SMALL aggregate — never a per-row sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pr_curve"]


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 3,
) -> DataFrame:
    """Precision/recall sweep: one row per distinct rounded score
    (descending thresholds; a row is predicted positive when its score
    >= the threshold). Returns (threshold, tp, fp, fn, precision,
    recall, f1) with exact integer counts and round-6 ratios.

    Scale shape: scores round to ``round_dp`` first, so the groupBy
    map-side-combines the corpus down to at most ~10^round_dp * range
    threshold rows; only that aggregate crosses the cumulative window
    (a single-partition sort of a few hundred rows, not of the data).
    """
    if round_dp < 0:
        raise ValueError(f"round_dp must be >= 0, got {round_dp}")
    agg = (
        df.select(
            F.round(F.col(score_col), round_dp).alias("threshold"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .where(F.col("threshold").isNotNull())
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").alias("__p"),
        )
    )
    w = (
        Window.orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = agg.agg(F.sum("__p").alias("__tp_all"))
    cum = (
        agg.withColumn("tp", F.sum("__p").over(w).cast("long"))
        .withColumn("fp", (F.sum("__n").over(w) - F.col("tp")).cast("long"))
        .crossJoin(F.broadcast(totals))
    )
    fn = (F.col("__tp_all") - F.col("tp")).cast("long")
    return cum.select(
        "threshold",
        "tp",
        "fp",
        fn.alias("fn"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision"
        ),
        F.round(F.try_divide(F.col("tp"), F.col("__tp_all")), 6).alias(
            "recall"
        ),
        F.round(
            F.try_divide(
                2 * F.col("tp"),
                2 * F.col("tp") + F.col("fp") + fn,
            ),
            6,
        ).alias("f1"),
    )

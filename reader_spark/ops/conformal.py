"""Split-conformal calibration of a quality classifier (Vovk et al.
2005 "Algorithmic Learning in a Random World"; Papadopoulos et al. 2002
inductive/split form; Angelopoulos & Bates 2023 survey) — the
distribution-free answer to "what score cutoff keeps at least 1-alpha
of the genuinely good documents?". A fixed 0.5 cutoff on a quality
logit makes an UNCALIBRATED promise; the conformal threshold converts
the promise into a finite-sample guarantee using only exchangeability:

    t = the k-th smallest calibration score among label-good docs,
        k = floor(alpha * (n_cal + 1))
    =>  P(score(new good doc) >= t) >= 1 - alpha.

Engine parity: scores arrive round-6 (the certified quality-logit
contract), the order statistic is selected by an exact (score asc,
id asc) rank, and the coverage/exclusion audit renders exact integer
milli fractions. Shape at 100 TB: the calibration/eval split is an
md5 predicate on the scan; the k-th order statistic uses
ops/rank.scalable_rank — range buckets + partitioned row_number +
triangular offsets, NO single-partition window; the audit is one
aggregate. k and n ride 1-row broadcast dims, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.rank import scalable_rank


def conformal_quality_threshold(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "label",
    alpha_milli: int = 100,
) -> DataFrame:
    """One row: (n_cal_pos, k, threshold, n_eval_pos, n_eval_neg,
    coverage_milli, exclusion_milli).

    `scored` carries per-doc (id, round-6 score, binary label); docs
    split calibration/eval by md5(id) parity. threshold falls back to
    0.0 (keep everything) when k = 0 — too little calibration data to
    promise anything at this alpha.
    """
    if not 0 < alpha_milli < 1000:
        raise ValueError(f"alpha_milli must be in (0,1000), got {alpha_milli}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("conf:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    base = scored.select(
        F.col(id_col).alias("id"),
        F.col(score_col).alias("score"),
        F.col(label_col).cast("int").alias("label"),
        (F.pmod(h, F.lit(2)) == 0).alias("is_cal"),
    )

    cal_pos = base.where(F.col("is_cal") & (F.col("label") == 1))
    nk = cal_pos.agg(
        F.count(F.lit(1)).cast("long").alias("n_cal_pos")
    ).select(
        "n_cal_pos",
        F.expr(f"({alpha_milli} * (n_cal_pos + 1)) div 1000").alias("k"),
    )
    ranked = scalable_rank(
        cal_pos, [F.asc("score"), F.asc("id")], rank_col="crank"
    )
    # agg keeps this a guaranteed 1-row dim even when k = 0 matches
    # nothing (NULL threshold -> coalesced to keep-everything below)
    thr = (
        ranked.join(F.broadcast(nk), F.col("crank") == F.col("k"))
        .agg(F.max("score").alias("threshold"))
    )

    ev = base.where(~F.col("is_cal"))
    audit = ev.crossJoin(
        F.broadcast(
            nk.crossJoin(F.broadcast(thr))
            .select("n_cal_pos", "k", "threshold")
        )
    ).select(
        "n_cal_pos",
        "k",
        F.coalesce(F.col("threshold"), F.lit(0.0)).alias("threshold"),
        "label",
        "score",
    )
    return (
        audit.groupBy("n_cal_pos", "k", "threshold")
        .agg(
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_eval_pos"),
            F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_eval_neg"),
            F.sum(
                F.when(
                    (F.col("label") == 1)
                    & (F.col("score") >= F.col("threshold")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("__cov"),
            F.sum(
                F.when(
                    (F.col("label") == 0)
                    & (F.col("score") < F.col("threshold")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("__exc"),
        )
        .select(
            "n_cal_pos",
            "k",
            "threshold",
            "n_eval_pos",
            "n_eval_neg",
            F.when(
                F.col("n_eval_pos") > 0,
                F.expr("(__cov * 1000) div n_eval_pos"),
            ).alias("coverage_milli"),
            F.when(
                F.col("n_eval_neg") > 0,
                F.expr("(__exc * 1000) div n_eval_neg"),
            ).alias("exclusion_milli"),
        )
    )

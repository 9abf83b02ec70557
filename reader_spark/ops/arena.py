"""Pairwise-comparison analytics for post-training evaluation: the
arena layer above ops/preference.py.

Three published primitives over a stream of judged model-vs-model
battles (the Chatbot-Arena shape: one row per comparison with a first
and second position and a winner):

* :func:`bt_ratings` — Bradley-Terry strength estimation (Bradley &
  Terry 1952) via the MM fixed-point of Hunter ("MM algorithms for
  generalized Bradley-Terry models", Annals of Statistics 2004):
  ``p_i' = W_i / sum_j n_ij / (p_i + p_j)``, the standard way arena
  leaderboards turn battles into ratings. Unrolled fixed iterations in
  EXACT integer micro-units (the ops/kmeans.py discipline): every
  division is a trunc-div of non-negative longs, so Spark's ``div`` ==
  DuckDB's ``//`` and ratings match the oracle bit-for-bit — no float
  crosses an engine boundary.
* :func:`position_bias` — the first-position win rate per judge, the
  standard LLM-judge order-bias probe (Zheng et al. 2023, "Judging
  LLM-as-a-Judge"): a judge whose first-position rate strays from the
  graph-wide rate is order-sensitive and needs position-swapped
  re-judging.
* :func:`fleiss_kappa` — inter-rater chance-corrected agreement
  (Fleiss 1971) over (item, rater, category) labels, the QA gate for
  preference-label collection. All moment sums are exact BIGINTs; the
  final kappa is ONE IEEE division of two exact integers (exactly
  rounded, hence engine-identical), because kappa may be negative and
  a negative trunc-div diverges between engines.

Shape at 100 TB: raw battles reduce to the (model x model) pair dim in
ONE map-side-combined groupBy — 10^9 comparisons become at most
|models|^2 rows, and every MM iteration joins only that bounded dim
against the |models|-row ratings dim (broadcast). Integer headroom:
pair terms scale by 10^9, so models with up to ~9.2e9 games each stay
inside BIGINT; beyond that, pre-divide the pair counts by a constant
(BT is scale-invariant in the count matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000
_SCALE9 = 1_000_000_000


def battle_stats(
    battles: DataFrame,
    first_col: str = "model_a",
    second_col: str = "model_b",
    win_first_col: str = "win_a",
) -> DataFrame:
    """Reduce raw battles to the unordered pair dim: one row per
    ``(lo, hi)`` model pair with ``n_games`` and ``wins_lo``. The only
    full-data shuffle in the arena layer (map-side combined)."""
    lo = F.least(F.col(first_col), F.col(second_col))
    hi = F.greatest(F.col(first_col), F.col(second_col))
    win_lo = F.when(
        F.col(first_col) < F.col(second_col),
        F.col(win_first_col).cast("long"),
    ).otherwise(1 - F.col(win_first_col).cast("long"))
    return (
        battles.select(lo.alias("lo"), hi.alias("hi"), win_lo.alias("wl"))
        .groupBy("lo", "hi")
        .agg(
            F.count("*").cast("long").alias("n_games"),
            F.sum("wl").cast("long").alias("wins_lo"),
        )
    )


def win_matrix(
    battles: DataFrame,
    first_col: str = "model_a",
    second_col: str = "model_b",
    win_first_col: str = "win_a",
) -> DataFrame:
    """Directed head-to-head matrix: per ordered (model, opponent),
    games, wins and the win rate in milli-units."""
    stats = battle_stats(battles, first_col, second_col, win_first_col)
    directed = stats.select(
        F.col("lo").alias("model"),
        F.col("hi").alias("opponent"),
        "n_games",
        F.col("wins_lo").alias("wins"),
    ).unionByName(
        stats.select(
            F.col("hi").alias("model"),
            F.col("lo").alias("opponent"),
            "n_games",
            (F.col("n_games") - F.col("wins_lo")).alias("wins"),
        )
    )
    return directed.withColumn(
        "win_rate_milli",
        F.expr("wins * 1000 div n_games").cast("long"),
    )


def bt_ratings(battles: DataFrame, iters: int = 3,
               first_col: str = "model_a",
               second_col: str = "model_b",
               win_first_col: str = "win_a") -> DataFrame:
    """Bradley-Terry ratings via ``iters`` unrolled MM updates.

    Output: ``(model, n_games, wins, p_micro, rating_milli)`` where
    ``p_micro`` is the fixed-point strength (start 10^6) and
    ``rating_milli = p_micro * 1000 div p_anchor`` anchors the scale to
    the lexicographically-first model (BT is identifiable only up to a
    positive factor). Assumes the comparison graph gives every model at
    least one win (MM's support condition); strengths are clamped to
    >= 1 micro-unit so a pathological fixture cannot divide by zero.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    directed = win_matrix(battles, first_col, second_col, win_first_col)
    totals = directed.groupBy("model").agg(
        F.sum("n_games").cast("long").alias("n_games"),
        F.sum("wins").cast("long").alias("wins"),
    )
    ratings = totals.select(
        "model", F.lit(_MICRO).cast("long").alias("p_micro")
    )
    pair = directed.select("model", "opponent", "n_games")
    for _ in range(iters):
        joined = (
            pair.join(
                F.broadcast(ratings.select("model", "p_micro")), "model"
            )
            .join(
                F.broadcast(
                    ratings.select(
                        F.col("model").alias("opponent"),
                        F.col("p_micro").alias("q_micro"),
                    )
                ),
                "opponent",
            )
            .withColumn(
                "term",
                F.expr(f"n_games * {_SCALE9}L div (p_micro + q_micro)"),
            )
        )
        denom = joined.groupBy("model").agg(
            F.sum("term").cast("long").alias("denom")
        )
        ratings = (
            totals.join(denom, "model")
            .select(
                "model",
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(f"wins * {_SCALE9}L div denom"),
                ).alias("p_micro"),
            )
        )
    anchor = ratings.groupBy().agg(
        F.min_by("p_micro", "model").alias("p_anchor")
    )
    return (
        totals.join(ratings, "model")
        .crossJoin(F.broadcast(anchor))
        .select(
            "model",
            "n_games",
            "wins",
            "p_micro",
            F.expr("p_micro * 1000 div p_anchor").cast("long").alias(
                "rating_milli"
            ),
        )
    )


def position_bias(
    battles: DataFrame,
    judge_col: str = "judge",
    win_first_col: str = "win_a",
) -> DataFrame:
    """Per-judge first-position win rate (milli-units) — the
    order-sensitivity probe for LLM judges."""
    return battles.groupBy(judge_col).agg(
        F.count("*").cast("long").alias("n_games"),
        F.sum(F.col(win_first_col).cast("long")).cast("long").alias(
            "first_wins"
        ),
    ).withColumn(
        "first_win_milli",
        F.expr("first_wins * 1000 div n_games").cast("long"),
    )


def fleiss_kappa(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    category_col: str = "category",
    n_raters: int = 3,
) -> DataFrame:
    """Fleiss' kappa over (item, rater, category) labels.

    Classic Fleiss assumes a CONSTANT number of raters per item; items
    with a different rater count are excluded and reported in
    ``n_items_dropped``. Accidentally duplicated label rows (same
    item, rater AND category) are collapsed before counting; a rater
    voting two DIFFERENT categories on one item remains the caller's
    contract violation and counts as two raters. Returns ONE row with
    the exact integer moment sums (``po_num/po_den``,
    ``pe_num/pe_den``), the two proportions as exactly-rounded IEEE
    divisions (``po``, ``pe``), and ``kappa = (po - pe) / (1 - pe)``
    — a fixed three-op double tree over exact inputs, identical in
    both engines, NULL when every label is a single category (Pe = 1,
    kappa undefined). Integer headroom: ``pe_num <= (N*n)^2``, so up
    to ~3e9 kept labels before the BIGINT ceiling (documented bound).
    """
    if n_raters < 2:
        raise ValueError(f"n_raters must be >= 2, got {n_raters}")
    labels = labels.dropDuplicates([item_col, rater_col, category_col])
    per_item = labels.groupBy(item_col).agg(
        F.count("*").cast("long").alias("n_i")
    )
    kept_items = per_item.where(F.col("n_i") == n_raters).select(item_col)
    dropped_dim = per_item.where(F.col("n_i") != n_raters).groupBy().agg(
        F.count("*").cast("long").alias("n_items_dropped")
    )
    kept = labels.join(kept_items, item_col)

    cell = kept.groupBy(item_col, category_col).agg(
        F.count("*").cast("long").alias("n_ik")
    )
    moments = cell.groupBy().agg(
        F.countDistinct(item_col).cast("long").alias("n_items"),
        F.countDistinct(category_col).cast("long").alias("n_categories"),
        F.sum(F.col("n_ik") * F.col("n_ik")).cast("long").alias("sum_sq"),
    )
    cat_tot = cell.groupBy(category_col).agg(
        F.sum("n_ik").cast("long").alias("c_k")
    )
    cat_moment = cat_tot.groupBy().agg(
        F.sum(F.col("c_k") * F.col("c_k")).cast("long").alias("pe_num")
    )
    n = F.lit(int(n_raters)).cast("long")
    out = (
        moments.crossJoin(F.broadcast(cat_moment))
        .crossJoin(F.broadcast(dropped_dim))
        .select(
            "n_items",
            F.lit(int(n_raters)).cast("long").alias("n_raters"),
            "n_categories",
            "n_items_dropped",
            (F.col("sum_sq") - F.col("n_items") * n).alias("po_num"),
            (F.col("n_items") * n * (n - 1)).alias("po_den"),
            "pe_num",
            (F.col("n_items") * n * F.col("n_items") * n).alias("pe_den"),
        )
        .select(
            "*",
            (F.col("po_num").cast("double") / F.col("po_den").cast("double"))
            .alias("po"),
            (F.col("pe_num").cast("double") / F.col("pe_den").cast("double"))
            .alias("pe"),
        )
        .select(
            "*",
            # (po - pe) / (1 - pe): no BIGINT cross-products, so no
            # overflow at any corpus scale the moment sums support.
            F.when(
                F.col("pe_den") > F.col("pe_num"),
                (F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")),
            ).alias("kappa"),
        )
    )
    return out


def krippendorff_alpha(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    category_col: str = "category",
    max_raters: int = 12,
) -> DataFrame:
    """Krippendorff's alpha for nominal data (Krippendorff 2004,
    "Content Analysis", §11) — the variable-rater complement to
    :func:`fleiss_kappa`: items may have DIFFERENT rater counts; only
    single-rated items are unusable (no pairable values).

    Exactness: the per-item observed-disagreement terms
    ``u_i / (m_i - 1)`` are made integral by scaling with
    ``L = lcm(1..max_raters-1)`` (every ``m_i - 1`` divides ``L``):

        Do_num = sum_i [sum_c n_ic*(m_i - n_ic)] * (L div (m_i - 1))
        De_num = n^2 - sum_c n_c^2,  n = sum_i m_i  (pairable values)
        D_o = Do_num / (L*n);  D_e = De_num / (n*(n-1))
        alpha = 1 - D_o / D_e

    ``d_o`` and ``d_e`` are each ONE exactly-rounded IEEE division of
    exact BIGINTs and ``alpha`` a fixed two-op double tree — identical
    in both engines, with no BIGINT cross-products (the moment sums
    themselves bound the scale: ``n*(n-1)`` caps pairable labels at
    ~3e9; documented). ``max_raters`` caps at 12 so L = 27720 keeps
    ``Do_num`` far from the long ceiling. Accidentally duplicated
    (item, rater, category) rows are collapsed before counting.

    Items with more than ``max_raters`` raters would break the LCM
    trick; they are dropped and counted (``n_items_over_cap``) — a
    documented deviation from the unbounded textbook form. NULL alpha
    when every pairable label is one category (De = 0).

    Shape at 100 TB: two bounded groupBys (item dim, category dim) and
    scalar aggregates; nothing wider than the label stream ever
    shuffles.
    """
    import math

    if not 2 <= max_raters <= 12:
        raise ValueError(f"max_raters must be in [2, 12], got {max_raters}")
    lcm = math.lcm(*range(1, max_raters))

    labels = labels.dropDuplicates([item_col, rater_col, category_col])
    per_item = labels.groupBy(item_col).agg(
        F.count("*").cast("long").alias("m_i")
    )
    usable = per_item.where(
        (F.col("m_i") >= 2) & (F.col("m_i") <= max_raters)
    )
    dropped = per_item.groupBy().agg(
        F.sum((F.col("m_i") < 2).cast("long")).cast("long").alias(
            "n_items_single"
        ),
        F.sum((F.col("m_i") > max_raters).cast("long")).cast("long").alias(
            "n_items_over_cap"
        ),
    )
    kept = labels.join(usable, item_col)

    cell = kept.groupBy(item_col, category_col, "m_i").agg(
        F.count("*").cast("long").alias("n_ic")
    )
    per_item_u = cell.groupBy(item_col, "m_i").agg(
        F.sum(F.col("n_ic") * (F.col("m_i") - F.col("n_ic")))
        .cast("long")
        .alias("u_i")
    )
    do_dim = per_item_u.groupBy().agg(
        F.sum(
            F.col("u_i") * F.expr(f"{lcm}L div (m_i - 1)")
        ).cast("long").alias("do_num"),
        F.sum("m_i").cast("long").alias("n_pairable"),
        F.count("*").cast("long").alias("n_items_used"),
    )
    cat_dim = (
        cell.groupBy(category_col)
        .agg(F.sum("n_ic").cast("long").alias("n_c"))
        .groupBy()
        .agg(F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("sum_nc_sq"))
    )
    return (
        do_dim.crossJoin(F.broadcast(cat_dim))
        .crossJoin(F.broadcast(dropped))
        .select(
            "n_items_used",
            "n_items_single",
            "n_items_over_cap",
            "n_pairable",
            "do_num",
            (
                F.col("n_pairable") * F.col("n_pairable") - F.col("sum_nc_sq")
            ).cast("long").alias("de_num"),
            F.lit(int(lcm)).cast("long").alias("scale_l"),
        )
        .select(
            "*",
            (
                F.col("do_num").cast("double")
                / (F.lit(int(lcm)) * F.col("n_pairable")).cast("double")
            ).alias("d_o"),
            (
                F.col("de_num").cast("double")
                / (F.col("n_pairable") * (F.col("n_pairable") - 1)).cast(
                    "double"
                )
            ).alias("d_e"),
        )
        .select(
            "*",
            F.when(
                F.col("de_num") > 0,
                F.lit(1.0) - F.col("d_o") / F.col("d_e"),
            ).alias("alpha"),
        )
    )

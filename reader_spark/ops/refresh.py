"""Crawl-budget refresh allocation (Cho & Garcia-Molina 2003,
"Effective page refresh policies for web crawlers").

:func:`reader_spark.ops.delta.change_rate` estimates each page's change
rate; this module answers the follow-up question a crawler actually
has: given a total recrawl budget of B accesses per period, how many
accesses does each page get? The paper's famous result is that the
answer is NOT proportional-to-λ — under diminishing freshness returns,
rapidly-changing pages are down-weighted and the very hottest are
abandoned entirely.

Model: expected freshness of a page accessed f times per period with
change rate λ is F(f) = f / (f + λ) (the rational diminishing-returns
form of the paper's freshness curve — monotone, concave, and exact in
integer arithmetic, which the transcendental (1 - e^{-λ/f}) form is
not). The marginal gain of the k-th access is

    Δ_k = F(k) - F(k-1) = λ / ((k + λ)(k - 1 + λ)),

strictly decreasing in k, so the global greedy optimum is exactly the
top-B (page, k) slots by Δ — and greedy never selects slot k before
slot k-1 of the same page. Note Δ_1 = 1 / (1 + λ): the first access to
a rarely-changing page beats the first access to a churning one — the
paper's counterintuitive headline drops out of the arithmetic.

Engine-portable arithmetic: λ rides in milli-units (BIGINT); gains are
quantized to ``gain_q = λm · 10^15 div ((1000k + λm)(1000(k-1) + λm))``
(≈ Δ · 10^12; numerator ≤ 10^18 for λm ≤ 1000, safely in BIGINT), and
the selection orders by ``(gain_q DESC, doc_id ASC, k ASC)`` — the
quantization + tie-break IS the deterministic spec both engines run.

Shape at 100 TB: the slot explode is bounded (``max_slots`` per page);
the budget selection is one ``orderBy().limit(B)`` =
TakeOrderedAndProject (distributed partial top-K, never a
single-partition window). When B itself is page-scale, use
:func:`refresh_allocation_by_cutoff` — the dual threshold form — which
is purely scan-bound (binary-search the cutoff against the budget with
a handful of count jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAIN_SCALE = 1_000_000_000_000_000  # lam_milli * 1e15 / den ~ gain * 1e12


def refresh_gains(
    pages: DataFrame,
    max_slots: int = 8,
    id_col: str = "doc_id",
    lam_col: str = "lam_milli",
) -> DataFrame:
    """Per-(page, slot) marginal freshness gains: (doc_id, lam_milli,
    k, gain_q) for k in 1..max_slots. Pages with λ = 0 never change and
    emit nothing (their gain is undefined and a crawler never revisits
    them)."""
    if max_slots < 1:
        raise ValueError(f"max_slots must be >= 1, got {max_slots}")
    p = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(lam_col).cast("long").alias("lam_milli"),
    ).where(F.col("lam_milli") > 0)
    slots = p.select(
        "doc_id",
        "lam_milli",
        F.explode(F.sequence(F.lit(1), F.lit(max_slots))).alias("k"),
    )
    return slots.select(
        "doc_id",
        "lam_milli",
        "k",
        F.expr(
            f"lam_milli * {GAIN_SCALE} div "
            "((1000 * k + lam_milli) * (1000 * (k - 1) + lam_milli))"
        )
        .cast("long")
        .alias("gain_q"),
    )


def refresh_allocation(
    pages: DataFrame,
    budget: int,
    max_slots: int = 8,
    id_col: str = "doc_id",
    lam_col: str = "lam_milli",
) -> DataFrame:
    """Greedy-optimal accesses-per-page under a total budget: the top
    ``budget`` (page, slot) marginal gains, counted per page. Output
    (doc_id, lam_milli, f_slots, freshness_micro) for every positive-λ
    page (f_slots = 0 when the page lost out), with freshness_micro =
    10^6 · f/(f + λ) evaluated in exact integers."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    gains = refresh_gains(
        pages, max_slots=max_slots, id_col=id_col, lam_col=lam_col
    )
    sel = (
        gains.orderBy(
            F.desc("gain_q"), F.asc("doc_id"), F.asc("k")
        )
        .limit(budget)
        .groupBy("doc_id")
        .agg(F.count("*").alias("f_slots"))
    )
    base = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(lam_col).cast("long").alias("lam_milli"),
    ).where(F.col("lam_milli") > 0)
    return (
        base.join(sel, "doc_id", "left")
        .select(
            "doc_id",
            "lam_milli",
            F.coalesce(F.col("f_slots"), F.lit(0))
            .cast("long")
            .alias("f_slots"),
        )
        .withColumn(
            "freshness_micro",
            F.expr(
                "CASE WHEN f_slots = 0 THEN 0 ELSE "
                "1000000000 * f_slots div (1000 * f_slots + lam_milli) "
                "END"
            ).cast("long"),
        )
    )


def refresh_allocation_by_cutoff(
    pages: DataFrame,
    cutoff_q: int,
    max_slots: int = 8,
    id_col: str = "doc_id",
    lam_col: str = "lam_milli",
) -> DataFrame:
    """The dual threshold form: every slot whose quantized gain clears
    ``cutoff_q`` is funded. Purely scan-bound (bounded explode + filter
    + doc-keyed count — no global ordering anywhere), so it is the
    100 TB path: binary-search cutoff_q until the implied total budget
    matches, then run this once."""
    gains = refresh_gains(
        pages, max_slots=max_slots, id_col=id_col, lam_col=lam_col
    )
    sel = (
        gains.where(F.col("gain_q") >= cutoff_q)
        .groupBy("doc_id")
        .agg(F.count("*").alias("f_slots"), F.max("lam_milli").alias("lam_milli"))
    )
    return sel.select(
        "doc_id",
        "lam_milli",
        F.col("f_slots").cast("long").alias("f_slots"),
        F.expr(
            "1000000000 * f_slots div (1000 * f_slots + lam_milli)"
        )
        .cast("long")
        .alias("freshness_micro"),
    )

"""Crawl-refresh delta: added / changed / removed / unchanged between
two crawl snapshots.

The operation a refresh pipeline runs before re-extraction: diff the
new crawl against the previous one so only added+changed documents
enter the (expensive) extract→clean→dedup path, removed ones get
tombstoned downstream, and unchanged ones keep their committed spans —
the batch analogue of vakra-dev/reader's re-scrape decision, and the
input to the resume anti-join the extract job already has
(reader_spark/spark/job.py run_extraction).

Shape at 100 TB: each side is pre-projected to (id, md5(text)) BEFORE
the join, so the full-outer equi-join shuffles 32-hex digests + ids,
never payloads — same hash-only-shuffle contract as ops/dedup.py. One
shuffle per side, both keyed on the id; AQE plans the merge. The
summary is a map-side-combined groupBy over the 4-value status dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) for every id present in either snapshot.

    status: 'added' (new only), 'removed' (old only), 'changed' (both,
    content hash differs), 'unchanged' (both, hash equal). Content
    equality is md5-of-text — collision-safe at the same 128-bit level
    the dedup stack already relies on.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_old_md5")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_new_md5")
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_old_md5").isNull(), ADDED)
        .when(F.col("_new_md5").isNull(), REMOVED)
        .when(F.col("_old_md5") != F.col("_new_md5"), CHANGED)
        .otherwise(UNCHANGED)
    )
    return joined.select(F.col(id_col), status.alias("status"))


def crawl_delta_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per status with its count — the refresh-run lineage
    record (alongside the per-partition metrics sidecar)."""
    return (
        crawl_delta(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def refresh_frontier(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The applied pass: the NEW-snapshot rows that need (re)extraction
    — status in (added, changed). Join keys and partitioning are shared
    with crawl_delta, so the planner reuses the exchange; the payload
    columns of `new` ride through untouched."""
    work = crawl_delta(old, new, id_col, text_col).where(
        F.col("status").isin(ADDED, CHANGED)
    )
    return new.join(work, id_col).drop("status")


def change_rate(
    history: DataFrame,
    id_col: str = "doc_id",
    status_col: str = "status",
) -> DataFrame:
    """Per-document change-frequency estimation from repeated crawl
    deltas (Cho & Garcia-Molina 2003, "Estimating frequency of change"
    — the recrawl-scheduler input): over the rounds where the document
    was visited (status changed/unchanged; added/removed rounds carry
    no before/after pair), estimate the Poisson change rate λ per
    visit interval.

    Two estimators, both from the paper:
    - ``rate_naive`` = -ln(1 - X/n) — the intuitive estimator; NULL
      when X = n (every visit changed ⇒ unbounded).
    - ``rate_cho``   = -ln((n - X + 0.5) / (n + 0.5)) — the paper's
      bias-reduced estimator, defined for all X (its §4.2 form).

    A scheduler recrawls in rate order (or at interval ∝ 1/λ). One
    map-side-combined groupBy on the id; the estimate is closed-form —
    no iteration, nothing leaves the reducers but one row per doc.
    """
    visited = history.where(F.col(status_col).isin(CHANGED, UNCHANGED))
    agg = visited.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum((F.col(status_col) == CHANGED).cast("long")).alias("n_changes"),
    )
    n = F.col("n_visits")
    x = F.col("n_changes")
    naive = F.when(x < n, -F.log(1 - x / n))
    cho = -F.log((n - x + 0.5) / (n + 0.5))
    return agg.select(
        F.col(id_col),
        "n_visits",
        "n_changes",
        F.round(naive, 6).alias("rate_naive"),
        F.round(cho, 6).alias("rate_cho"),
    )


COSMETIC = "cosmetic"


def semantic_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """crawl_delta with 'changed' split into MATERIAL vs COSMETIC.

    A page whose template flips smart quotes, re-wraps whitespace or
    re-cases a header on every render is byte-different but
    content-identical; counting that as change drives the Cho
    change-rate estimator (change_rate) to its floor interval for
    pages that never really move. Rows are 'cosmetic' when the texts
    are equal after typographic folding (spark/columns.
    fold_typography_col) + whitespace collapse + case fold; only
    'changed' rows should feed change_rate and the re-extraction
    frontier.

    Same shuffle discipline as crawl_delta: each side pre-projects to
    TWO 128-bit digests (raw, normalized) before the full-outer join —
    payloads never shuffle."""
    from ..spark.columns import fold_typography_col

    def digests(df: DataFrame, prefix: str) -> DataFrame:
        t = F.col(text_col)
        norm = F.lower(
            F.trim(F.regexp_replace(fold_typography_col(t), r"\s+", " "))
        )
        return df.select(
            F.col(id_col),
            F.md5(t).alias(f"_{prefix}_raw"),
            F.md5(norm).alias(f"_{prefix}_norm"),
        )

    joined = digests(old, "old").join(
        digests(new, "new"), id_col, "full_outer"
    )
    status = (
        F.when(F.col("_old_raw").isNull(), ADDED)
        .when(F.col("_new_raw").isNull(), REMOVED)
        .when(F.col("_old_raw") == F.col("_new_raw"), UNCHANGED)
        .when(F.col("_old_norm") == F.col("_new_norm"), COSMETIC)
        .otherwise(CHANGED)
    )
    return joined.select(F.col(id_col), status.alias("status"))

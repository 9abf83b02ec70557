"""Privacy auditing over corpus metadata: k-anonymity of
quasi-identifier combinations.

The governance counterpart of PII redaction (ops/multimodal.py redacts
content; this audits METADATA): a row is k-anonymous when at least k
rows share its full quasi-identifier combination (Sweeney 2002,
"k-anonymity: a model for protecting privacy"). Publishing per-document
metadata (language x source x bucketed length, user locale x cohort,
...) where some combination isolates < k rows re-identifies the people
behind those rows — the audit finds every such combination before an
export ships.

Scale shape: ONE groupBy over the quasi columns with map-side combine
(the shuffle carries combo keys + counts, never content); the summary
is a second aggregate over the bounded combo dim. Pure counts — exact
in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit", "k_anonymity_summary"]


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-combination audit: ``(*quasi_cols, n_rows, violates)``.

    ``violates`` marks combinations shared by fewer than ``k`` rows —
    the groups an export at this granularity would re-identify.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("n_rows")
    ).select(
        *quasi_cols,
        "n_rows",
        (F.col("n_rows") < k).alias("violates"),
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row rollup: ``(k, n_groups, n_violating_groups,
    n_rows_at_risk, min_group_size)`` — the number that goes on the
    dataset card (and gates the export when n_rows_at_risk > 0)."""
    audit = k_anonymity_audit(df, quasi_cols, k)
    return audit.agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.col("violates").cast("long"))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("violates"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("n_rows").cast("long").alias("min_group_size"),
    )

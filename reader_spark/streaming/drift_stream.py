"""Streaming PSI drift monitor: static offline reference, streaming traffic.

The production shape of distribution monitoring at scale: the reference
model (decile edges + smoothed bin shares) is a small static ARTIFACT
trained offline from a trusted window (ops.drift.psi_deciles' edge pass /
`train_psi_reference` below), and the live traffic streams against it.
Per event-time window and key, the monitor emits the PSI of the window's
value distribution vs the reference — one watermarked streaming
aggregation (bin counts pivot into N columns inside the single groupBy, so
no chained stateful operators), then pure arithmetic.

Works identically on a batch DataFrame (the parity test runs both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_psi_reference", "psi_drift_stream"]


def train_psi_reference(
    df: DataFrame, value_col: str = "value", n_bins: int = 10
) -> tuple[list[float], list[float]]:
    """Offline reference builder: (decile edges, add-1-smoothed bin
    shares) over a trusted batch — the literal artifact the stream
    monitors against. One percentile aggregate + one binned count; the
    collect is n_bins scalars."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges_row = df.agg(
        F.transform(
            F.percentile(F.col(value_col), F.array(*[F.lit(q) for q in qs])),
            lambda e: F.round(e, 9),
        ).alias("ed")
    ).head()
    edges = [float(e) for e in edges_row["ed"]]
    ed = F.array(*[F.lit(e) for e in edges])
    b = F.size(F.filter(ed, lambda e: F.col(value_col) > e))
    counts = (
        df.groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_bin = {int(r["bin"]): int(r["c"]) for r in counts}
    n = sum(by_bin.values())
    probs = [(by_bin.get(i, 0) + 1) / (n + n_bins) for i in range(n_bins)]
    return edges, probs


def psi_drift_stream(
    events: DataFrame,
    edges: list[float],
    ref_probs: list[float],
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    threshold: float = 0.2,
) -> DataFrame:
    """(window_start, key, n, psi, drifted) per closed event-time window.

    `edges`/`ref_probs` are the offline artifact (length B-1 / B). The
    current window's shares are add-1 smoothed like the reference, so an
    empty bin never produces log(0).
    """
    n_bins = len(edges) + 1
    if len(ref_probs) != n_bins:
        raise ValueError("ref_probs must have len(edges) + 1 entries")
    ed = F.array(*[F.lit(float(e)) for e in edges])
    b = F.size(F.filter(ed, lambda e: F.col(value_col) > e))
    counts = [
        F.sum(F.when(b == i, 1).otherwise(0)).alias(f"__b{i}")
        for i in range(n_bins)
    ]
    agg = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"), *counts)
    )
    psi = None
    for i, p in enumerate(ref_probs):
        q = (F.col(f"__b{i}") + 1) / (F.col("n") + n_bins)
        term = F.round((F.lit(float(p)) - q) * F.log(F.lit(float(p)) / q), 9)
        psi = term if psi is None else psi + term
    psi = F.round(psi, 6)
    return agg.select(
        F.col("window.start").alias("window_start"),
        "key",
        "n",
        psi.alias("psi"),
        F.when(psi > threshold, 1).otherwise(0).alias("drifted"),
    )

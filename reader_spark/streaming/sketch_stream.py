"""Streaming bottom-k (KMV) distinct counting — mergeable sketch state.

The live twin of ops.sketch.kmv_distinct: per group, the state is the k
smallest key hashes seen so far (BOUNDED regardless of stream length —
the whole point of a sketch as stream state), updated per micro-batch via
applyInPandasWithState. Because bottom-k merges by "union then keep the k
smallest", the stream's final estimate equals the batch estimate over the
same rows no matter how the input was micro-batched (pinned by pytest).

Hashes ride as INTEGER nano-units (u * 1e9 is exact for round-9 values),
so state holds array<long> and the estimate math matches the batch op
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_u9_col", "kmv_distinct_stream"]


def kmv_u9_col(key_col: str):
    """The batch op's normalized hash u (round-9), scaled to exact integer
    nano-units — single source of truth for both engines of the twin."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = F.round((h + F.lit(1.0)) / F.lit(4294967296.0), 9)
    return F.round(u * 1e9).cast("long")


def kmv_distinct_stream(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 32,
    output_mode: str = "update",
) -> DataFrame:
    """(group, n_sketch, est_distinct) per group per micro-batch: the
    current distinct-count estimate after folding the batch into the
    bounded bottom-k state. output_mode="update" for dashboards (memory/
    console sinks); "append" turns the emissions into an estimate LOG —
    one row per group per batch — which file sinks accept (latest row per
    group is the current estimate)."""
    from typing import Any, Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{group_col} string, n_sketch int, est_distinct double"
    state_schema = "us array<long>"

    def upd(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeouts configured
            state.remove()
            return
        held = set(state.get[0]) if state.exists else set()
        for batch in batches:
            held.update(int(v) for v in batch["u9"])
        merged = sorted(held)[:k]
        state.update((merged,))
        n = len(merged)
        est = float(n) if n < k else round((k - 1) / (merged[-1] / 1e9), 6)
        yield pd.DataFrame(
            {
                group_col: [str(key[0])],
                "n_sketch": pd.Series([n], dtype="int32"),
                "est_distinct": pd.Series([est], dtype="float64"),
            }
        )

    narrow = df.select(
        F.col(group_col).cast("string").alias(group_col),
        kmv_u9_col(key_col).alias("u9"),
    )
    return narrow.groupBy(group_col).applyInPandasWithState(
        upd,
        out_schema,
        state_schema,
        output_mode,
        GroupStateTimeout.NoTimeout,
    )

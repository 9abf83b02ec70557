"""Streaming heavy hitters — bounded Misra-Gries state per group.

The live twin of ops.heavy.heavy_hitters: per group, the state is a
Misra-Gries summary (<= k counters plus the running total n and the
total decremented mass d), folded per micro-batch via
applyInPandasWithState. Where the batch op can afford an exact second
pass over the data, a stream cannot rescan — so the emission carries the
sketch's two-sided bound instead:

    counter <= true count <= counter + d,   with d <= n / (k + 1)

Every key whose true share exceeds 1/(k+1) is guaranteed present in the
summary (its counter cannot be decremented to zero), so the emitted set
with ``certified`` flags is sound:

* certified=True  (cnt_min clears the phi cut)  -> definitely heavy
* certified=False (only cnt_max clears the cut) -> possibly heavy; a
  batch rescan (the exact verify pass of ops.heavy) settles it offline.

Unlike the KMV stream, MG state is arrival-order dependent — the
COUNTERS may differ across micro-batchings, but the guarantee set does
not: completeness of true heavy hitters and bound containment are the
pinned invariants (see tests/test_streaming_heavy.py), not counter
equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters_stream"]


def heavy_hitters_stream(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 50,
    phi: float | None = None,
    output_mode: str = "update",
) -> DataFrame:
    """(group, value, cnt_min, cnt_max, n_seen, certified) per group per
    micro-batch for every key the bounded summary cannot rule out.

    ``phi`` defaults to the sketch guarantee 1/(k+1) (millionth-precision
    rational, same contract as ops.heavy.heavy_hitters); output_mode
    "update" for dashboards, "append" for file sinks (emission log —
    latest rows per group are current).
    """
    from typing import Any, Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if phi is None:
        num = -(-1_000_000 // (k + 1))
    else:
        num = int(round(phi * 1_000_000))
    if num * (k + 1) < 1_000_000:
        raise ValueError(
            f"phi={phi} below the sketch guarantee 1/(k+1): raise k or phi"
        )

    out_schema = (
        f"{group_col} string, value string, cnt_min long, cnt_max long, "
        "n_seen long, certified boolean"
    )
    state_schema = "vals array<string>, cnts array<long>, n long, d long"

    def upd(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeouts configured
            state.remove()
            return
        if state.exists:
            vals, cnts, n, d = state.get
            counters = dict(zip(list(vals), (int(c) for c in cnts)))
            n, d = int(n), int(d)
        else:
            counters, n, d = {}, 0, 0
        for batch in batches:
            vc = batch["value"].value_counts()
            n += int(vc.sum())
            for value, cnt in vc.items():
                counters[value] = counters.get(value, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                d += cut
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        state.update((list(counters), [counters[v] for v in counters], n, d))
        rows = [
            (v, c, c + d, (c + d) * 1_000_000 > num * n,
             c * 1_000_000 > num * n)
            for v, c in counters.items()
        ]
        keep = [(v, lo, hi, cert) for v, lo, hi, poss, cert in rows if poss]
        keep.sort(key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            {
                group_col: [str(key[0])] * len(keep),
                "value": [t[0] for t in keep],
                "cnt_min": pd.Series([t[1] for t in keep], dtype="int64"),
                "cnt_max": pd.Series([t[2] for t in keep], dtype="int64"),
                "n_seen": pd.Series([n] * len(keep), dtype="int64"),
                "certified": [t[3] for t in keep],
            }
        )

    narrow = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(value_col).cast("string").alias("value"),
    ).where(F.col("value").isNotNull())
    return narrow.groupBy(group_col).applyInPandasWithState(
        upd,
        out_schema,
        state_schema,
        output_mode,
        GroupStateTimeout.NoTimeout,
    )

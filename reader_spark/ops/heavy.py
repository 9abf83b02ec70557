"""Heavy hitters: exact frequent-item detection at stream scale.

The vocabulary / hot-key question every corpus pipeline asks — which
tokens, domains, or users exceed a support share phi — cannot be answered
at 100 TB by a full groupBy when the key space is unbounded (token
vocabularies run to billions of distinct keys, almost all singletons).
The classic two-pass fix (Misra-Gries 1982; mergeable-summaries form of
Agarwal et al., PODS'12):

1. CANDIDATES — each partition keeps at most ``k`` bounded counters via
   the Misra-Gries reduction (when full, subtract the (k+1)-th largest
   count from all and drop the non-positive). Pigeonhole guarantee: any
   key with partition share > 1/(k+1) survives its partition, so any key
   with GLOBAL share > 1/(k+1) survives in at least one partition. The
   candidate union is <= k x partitions rows — tiny.
2. VERIFY — exact counts of candidate keys only (semi-join then groupBy,
   a shuffle bounded by the candidate set, not the key space), filtered
   to true share > phi.

Because step 2 is exact and the step-1 guarantee covers every qualifying
key, the output is EXACTLY {key : count > phi * n} with exact counts —
deterministic under any partitioning or arrival order (the candidate SET
varies with order; the verified answer does not). That is what makes the
op oracle-checkable value-for-value against a plain SQL
GROUP BY ... HAVING on small data while remaining bounded-memory at scale.

Requires phi >= 1/(k+1), else the sketch cannot promise completeness and
the function raises.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_candidates(col_name: str, k: int):
    """mapInPandas partition function: Misra-Gries summary, <= k keys out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for batch in batches:
            for value, cnt in batch[col_name].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            if len(counters) > k:
                # mergeable MG reduction: subtract the (k+1)-th largest
                # count from every counter, drop the non-positive
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({col_name: list(counters.keys())})

    return fn


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 200,
    phi: float | None = None,
) -> DataFrame:
    """Keys of ``df[col]`` with exact frequency share > ``phi``.

    Returns (value, cnt) with EXACT counts, ordered-agnostic and
    deterministic. ``phi`` defaults to ``1/(k+1)`` (the tightest share the
    k-counter sketch can certify); a caller phi is interpreted to
    millionth precision and must stay >= the guarantee, otherwise keys
    between phi and 1/(k+1) could appear or vanish with partition layout.
    Nulls are ignored (a null key is missing data, not a frequent item).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if phi is None:
        # smallest millionths threshold the sketch certifies
        num, den = -(-1_000_000 // (k + 1)), 1_000_000
    else:
        num, den = int(round(phi * 1_000_000)), 1_000_000
    if num * (k + 1) < den:
        raise ValueError(
            f"phi={phi} below the sketch guarantee 1/(k+1)={1 / (k + 1)}: "
            "heavy keys could be missed; raise k or phi"
        )
    vals = df.select(F.col(col).alias("value")).where(F.col("value").isNotNull())
    n = vals.count()
    if n == 0:
        return (
            vals.groupBy("value")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    candidates = (
        vals.mapInPandas(_mg_candidates("value", k), schema=vals.schema)
        .distinct()
    )
    exact = (
        vals.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # strict >, integer-exact (cnt * den > num * n): no float share ever
    # touches the cut, so there is no decimal-boundary coin flip between
    # engines and no dependence on which extra candidates survived
    return exact.where(F.col("cnt") * F.lit(den) > F.lit(num) * F.lit(n))

"""Bloom filter (Bloom, CACM 1970) as a sparse set-bit DataFrame — the
100 TB companion to the crawler's exact visited-set anti-join (J1):
before shuffling a trillion-row frontier against the full visited table,
a Bloom pre-filter drops the overwhelmingly-unvisited majority with a
broadcast-sized structure; only possible-members pay the exact anti-join.
One-sided by construction: a false positive merely sends an unvisited URL
through the exact check; a false negative would re-crawl a visited URL,
and Bloom guarantees there are none.

Representation: the filter is rows of distinct set bit positions, at most
m of them — mergeable across days/partitions by union+distinct, broadcast
on the probe side. Deterministic under the portable md5 family, so build
and membership replicate bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, k: int, m: int, portable: bool) -> list[Column]:
    out = []
    for i in range(k):
        salted = F.concat_ws("|", F.lit(str(i)), key.cast("string"))
        if portable:
            h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
        else:
            h = F.xxhash64(salted)
        out.append(F.pmod(h, F.lit(m)))
    return out


def bloom_build(
    df: DataFrame,
    key_col: str,
    k: int = 3,
    m: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Set-bit rows (bit,) for the keys of `df` — at most m rows.
    Merge filters by union + distinct."""
    if k < 1 or m < 2:
        raise ValueError(f"need k >= 1 hashes and m >= 2 bits, got k={k} m={m}")
    pos = _positions(F.col(key_col), k, m, portable)
    return (
        df.select(F.explode(F.array(*pos)).alias("bit"))
        .distinct()
    )


def bloom_member(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = 3,
    m: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """keys + is_member (int 0/1): 1 iff ALL k bit positions are set.
    The filter side is <= m rows — broadcast; the keys side never
    shuffles except the final per-key all-hit check (map-side combined)."""
    pos = _positions(F.col(key_col), k, m, portable)
    probes = keys.select(key_col, F.explode(F.array(*pos)).alias("bit"))
    hit = F.when(F.col("__set").isNotNull(), 1).otherwise(0)
    return (
        probes.join(
            F.broadcast(bloom.withColumn("__set", F.lit(1))), ["bit"], "left"
        )
        .select(key_col, hit.alias("hit"))
        .groupBy(key_col)
        .agg(F.min("hit").alias("is_member"))
    )

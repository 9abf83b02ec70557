"""Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar 1998.

The shard assignner a crawl frontier / domain-partitioned store wants:
key k goes to argmax over shards s of hash(k, s). Unlike `pmod(hash, n)`,
changing the shard count from n to n+1 moves only ~1/(n+1) of the keys
(each key moves iff the NEW shard wins its rendezvous — nothing else
changes), so a re-shard never triggers a full data migration. Same
guarantee family as consistent hashing, but exact, stateless, and a pure
expression — no ring to store.

Engine-portable: the per-(key, shard) weight is the repo's md5-head hash;
argmax ties break on the smaller shard id (md5 collisions across two
different inputs are not observable at 32 bits x corpus sizes here, but
the rule is still pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rendezvous_shard", "reshard_movement"]


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Column: the winning shard id in [0, n_shards) for `key` (HRW)."""
    entries = F.array(
        *[
            F.struct(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"hrw:{s}:"), key.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("w"),
                F.lit(-s).alias("neg_shard"),
            )
            for s in range(n_shards)
        ]
    )
    # last element of the ascending sort = max (weight, -shard): highest
    # weight wins, ties go to the SMALLER shard id
    best = F.array_sort(entries)[n_shards - 1]
    return -best.getField("neg_shard")


def reshard_movement(
    df: DataFrame, key_col: str, n_from: int, n_to: int
) -> DataFrame:
    """Per-key assignment under both shard counts plus the movement
    accounting that proves minimal disruption: one row per key with
    (key, shard_a, shard_b, moved), where sum(moved)/count ~= the HRW
    bound (keys move only INTO new shards when growing)."""
    k = F.col(key_col)
    return df.select(k).distinct().select(
        k.alias("key"),
        rendezvous_shard(k, n_from).alias("shard_a"),
        rendezvous_shard(k, n_to).alias("shard_b"),
    ).withColumn(
        "moved",
        F.when(F.col("shard_a") != F.col("shard_b"), 1).otherwise(0),
    )

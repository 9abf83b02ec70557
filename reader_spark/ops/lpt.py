"""LPT (longest-processing-time-first) shard balancing — Graham 1969's
classic greedy with the 4/3-approximation guarantee for makespan: sort
groups by size descending, always assign to the currently-lightest
shard. The size-AWARE complement to ops/shard.py's rendezvous hashing:
rendezvous is the right tool for unbounded key spaces (stateless,
minimal movement), LPT is the right tool for a BOUNDED group dim with
wildly skewed sizes (per-source / per-language / per-topic token
masses, where hashing one 40%-of-corpus source next to two small ones
wrecks a training shard's balance).

Determinism / parity: sizes are exact longs; the descending order ties
on group id; the lightest-shard election ties to the lowest shard
index (first-occurrence semantics in both engines). The whole greedy
is ONE within-row fold over the sorted group array — correct because
the group dim is bounded (document: use rendezvous for unbounded key
spaces); the DuckDB twin replays the same fold as a recursive CTE.

Returns (group, size, shard, load_after): assignment order is the LPT
order, load_after the chosen shard's load including this group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lpt_shard_assignment(
    df: DataFrame,
    group_col: str = "group",
    size_col: str = "size",
    shards: int = 8,
) -> DataFrame:
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    g = df.select(
        F.col(group_col).alias("grp"),
        F.col(size_col).cast("long").alias("size"),
    )
    arr = g.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("size")).alias("neg"),
                    F.col("grp").alias("grp"),
                    F.col("size").alias("size"),
                )
            )
        ).alias("ws")
    )

    out_t = "array<struct<grp:string,size:bigint,shard:int,load_after:bigint>>"
    init = F.struct(
        F.array_repeat(F.lit(0).cast("long"), shards).alias("loads"),
        F.array().cast(out_t).alias("out"),
    )

    def step(a, x):
        idx = (
            F.array_position(a.loads, F.array_min(a.loads)) - 1
        ).cast("int")
        new_load = F.element_at(a.loads, idx + 1) + x.size
        loads = F.zip_with(
            a.loads,
            F.sequence(F.lit(0), F.lit(shards - 1)),
            lambda l, i: F.when(i == idx, l + x.size).otherwise(l),
        )
        row = F.struct(
            x.grp.alias("grp"),
            x.size.alias("size"),
            idx.alias("shard"),
            new_load.alias("load_after"),
        )
        return F.struct(
            loads.alias("loads"), F.concat(a.out, F.array(row)).alias("out")
        )

    folded = arr.select(
        F.explode(F.aggregate(F.col("ws"), init, step).getField("out")).alias(
            "x"
        )
    )
    return folded.select(
        F.col("x.grp").alias(group_col),
        F.col("x.size").alias("size"),
        F.col("x.shard").alias("shard"),
        F.col("x.load_after").alias("load_after"),
    )

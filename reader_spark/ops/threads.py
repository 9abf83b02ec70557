"""Reply-forest flattening: message trees -> root-to-leaf linear chains.

The dialogue-data assembly step for conversation corpora (the
Pushshift-Reddit shape: every message carries a nullable
``parent_id``): each LEAF message defines one training conversation —
the path from its thread root down to it, in order. This is how
comment forests become the linear chains SFT/preference pipelines
consume (ops/chat.py takes over from there).

Scale shape: pointer DOUBLING (pointer jumping, Wyllie 1979 — the
classic parallel list-ranking primitive; same discipline as
ops/graph.py's connected components): after k rounds every node knows
its 2^k-th ancestor AND the id path up to it (doubling concatenates
paths: ``path(v, 2k) = path(v, k) ++ path(anc_k(v), k)``), so a depth
cap of ``max_depth`` costs ceil(log2(max_depth)) self-joins — each a
plain equi-join on the ancestor key — instead of one join per level.
Payloads (role/text) never ride the doubling frame: ids only; one
final msg_id-keyed join attaches them to the exploded chain rows.

Chains deeper than ``max_depth`` (or whose walk hits a missing parent
— an orphan subtree) finish with a non-null ancestor and are emitted
flagged ``truncated = true`` rather than silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def thread_chains(
    messages: DataFrame,
    id_col: str = "msg_id",
    parent_col: str = "parent_id",
    max_depth: int = 16,
    payload_cols: tuple[str, ...] = ("role", "text"),
) -> DataFrame:
    """One row per (leaf, position): the root-to-leaf chain each leaf
    message closes.

    Input: ``(msg_id, parent_id, *payload_cols)`` with ``parent_id``
    NULL at thread roots. Output: ``(chain_id, pos, msg_id, root_id,
    depth, truncated, *payload_cols)`` where ``chain_id`` is the leaf
    id, ``pos`` counts from 0 at the root, and ``depth`` is the chain
    length (capped at ``max_depth``).
    """
    if not 1 <= max_depth <= 1024:
        raise ValueError(f"max_depth must be in [1, 1024], got {max_depth}")
    rounds = max(1, (max_depth - 1).bit_length())

    # Doubling frame invariant: ``path`` is the id chain from ``node``
    # upward, exclusive of ``anc``; anc NULL <=> path reaches the root.
    frame = messages.select(
        F.col(id_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.array(F.col(id_col)).alias("path"),
    )
    for _ in range(rounds):
        up = frame.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("path").alias("path2"),
        )
        # A missing parent (orphan walk) simply never matches a join —
        # this round or any later one — so the row keeps its dangling
        # anc unchanged and surfaces as truncated. No sentinel value is
        # injected, so ids of any type (long, string) are safe.
        unresolved = F.col("anc").isNull() | F.col("path2").isNull()
        frame = frame.join(up, "anc", "left").select(
            "node",
            F.when(unresolved, F.col("anc")).otherwise(F.col("anc2"))
            .alias("anc"),
            F.when(unresolved, F.col("path"))
            .otherwise(F.concat(F.col("path"), F.col("path2")))
            .alias("path"),
        )

    leaves = messages.select(F.col(id_col).alias("node")).join(
        messages.select(F.col(parent_col).alias("node")).where(
            F.col(parent_col).isNotNull()
        ),
        "node",
        "left_anti",
    )
    # Truncation keeps the LEAF side (the most recent max_depth
    # messages — the context-window convention); a truncated chain's
    # root_id is therefore the truncation point, not the thread root.
    chains = frame.join(leaves, "node").select(
        F.col("node").alias("chain_id"),
        F.reverse(F.slice("path", 1, max_depth)).alias("rpath"),
        (F.col("anc").isNotNull() | (F.size("path") > max_depth)).alias(
            "truncated"
        ),
    )
    exploded = chains.select(
        "chain_id",
        "truncated",
        F.element_at("rpath", 1).alias("root_id"),
        F.size("rpath").cast("long").alias("depth"),
        F.posexplode("rpath").alias("pos", "msg_id"),
    ).select(
        "chain_id",
        F.col("pos").cast("long").alias("pos"),
        "msg_id",
        "root_id",
        "depth",
        "truncated",
    )
    payload = messages.select(F.col(id_col).alias("msg_id"), *payload_cols)
    return exploded.join(payload, "msg_id").select(
        "chain_id", "pos", "msg_id", "root_id", "depth", "truncated",
        *payload_cols,
    )

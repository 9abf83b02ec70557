"""Exact-integer Lloyd k-means over embedding columns.

The clustering primitive the curation stack was missing between
SemDeDup's within-cell dedup (ops/semdedup.py, which ASSUMES cluster
assignments) and coreset k-center (ops/coreset.py, which picks
exemplars, not partitions): proper Lloyd iterations producing the
cluster table that cluster-balanced sampling, SemDeDup cells, and
per-cluster quality audits consume.

Float-free contract (the repo's integer-units discipline): embedding
components quantize once to integer MICRO-units
(``CAST(round(x * 1e6) AS BIGINT)``); every distance is then an exact
integer squared-L2 (within-row fold, order-independent), every
centroid update an exact integer sum + ``floor(sum / n)`` (double
division of exactly-representable integers — identical IEEE result in
Spark and DuckDB; ``div``/``//`` are AVOIDED because Spark truncates
toward zero while DuckDB floors, and sums go negative). No float ever
crosses an engine boundary, so the DuckDB oracle unrolls the same
iterations as CTEs and matches bit-for-bit.

Scale shape (10^9 vectors x 64 dims, k <= 64):
  * assignment is WITHIN-ROW — centroids ride as a k x dim literal
    (same bounded-collect family as the PQ codebooks, ops/ann.py); the
    argmin is ``array_min`` over packed ``dist * 64 + cluster`` longs.
    Zero shuffle, no crossJoin.
  * the update explodes to (cluster, pos, comp) skinny longs; the
    groupBy(cluster, pos) partial-aggregates map-side, so the shuffle
    carries <= partitions x k x dim rows, never vectors.
  * per-iteration driver traffic is ONE k x dim collect (bounded
    literal, the allowed family) — Lloyd on Spark with small k.
  * inertia is reported in KILO-units (``dist div 1024`` pre-sum,
    non-negative so trunc == floor) to stay overflow-safe at 10^9
    members; exact in both engines.

Empty clusters keep their previous centroid (deterministic COALESCE,
mirrored in the oracle). Ties in the argmin break to the smallest
cluster id via the packed long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_embeddings", "kmeans_fit", "kmeans_assign"]

_SCALE = 1_000_000
_K_RADIX = 64


def quantize_embeddings(
    embeds: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, v: array<long>) in exact micro-units."""
    v = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * _SCALE).cast("long"),
    )
    return embeds.select(F.col(id_col).alias("vec_id"), v.alias("v"))


def _centroid_lit(cents: list[list[int]]) -> Column:
    return F.array(*[F.array(*[F.lit(int(c)) for c in row]) for row in cents])


def _packed_argmin(cents: list[list[int]]) -> Column:
    """Within-row argmin over the centroid literal: min over clusters of
    ``squared_L2(v, c) * 64 + cluster`` — ties elect the smallest id."""
    dists = F.transform(
        _centroid_lit(cents),
        lambda c, i: (
            F.aggregate(
                F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            * _K_RADIX
            + i
        ),
    )
    return F.array_min(dists)


def kmeans_fit(
    embeds: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[int]], DataFrame]:
    """Lloyd k-means; returns ``(centroids, clusters)``.

    ``centroids`` is the final k x dim integer table (micro-units);
    ``clusters`` a DataFrame ``(cluster, n_members, inertia_kilo,
    centroid)`` from the final assignment. Seeds are the k smallest
    vec_ids' vectors (deterministic, oracle-mirrored).
    """
    if not 1 <= k <= _K_RADIX:
        raise ValueError(f"k must be in [1, {_K_RADIX}]")
    q = quantize_embeddings(embeds, vec_col, id_col).persist()
    seed_rows = q.orderBy("vec_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed_rows)}")
    cents = [list(r["v"]) for r in seed_rows]
    dim = len(cents[0])
    for _ in range(n_iter):
        assigned = q.select(
            "vec_id", "v", (_packed_argmin(cents) % _K_RADIX).alias("cluster")
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "comp"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("comp").alias("s"),
                F.count("*").alias("n"),
            )
            .select(
                "cluster",
                "pos",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("m"),
            )
            .collect()
        )
        new = {(r["cluster"], r["pos"]): r["m"] for r in sums}
        cents = [
            [new.get((ci, p), cents[ci][p]) for p in range(dim)]
            for ci in range(k)
        ]
    clusters = kmeans_assign(q, cents, quantized=True)
    q.unpersist()
    return cents, clusters


def kmeans_assign(
    embeds: DataFrame,
    cents: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantized: bool = False,
) -> DataFrame:
    """Final per-cluster rollup against a fixed centroid table:
    ``(cluster, n_members, inertia_kilo, centroid)``."""
    q = embeds if quantized else quantize_embeddings(embeds, vec_col, id_col)
    packed = _packed_argmin(cents)
    per_vec = q.select(
        (packed % _K_RADIX).cast("long").alias("cluster"),
        F.floor(packed / _K_RADIX).cast("long").alias("dist"),
    ).select(
        "cluster",
        # dist is non-negative, so trunc-div == floor-div in both engines.
        F.expr("dist div 1024").cast("long").alias("dist_kilo"),
    )
    cent_lit = _centroid_lit(cents)
    return (
        per_vec.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("dist_kilo").cast("long").alias("inertia_kilo"),
        )
        .select(
            "cluster",
            "n_members",
            "inertia_kilo",
            F.element_at(cent_lit, (F.col("cluster") + 1).cast("int")).alias(
                "centroid"
            ),
        )
    )

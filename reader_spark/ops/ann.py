"""Approximate-nearest-neighbor search over an embedding column
(array<float>) — Spark-native.

Two paths:
  * brute_force_topk — exact cosine top-k via F.aggregate/zip_with dot
    products (JVM-side, no Python). Baseline and oracle.
  * lsh_bucketed_topk — random-hyperplane LSH (Charikar STOC'02 sign-random
    projections; Indyk & Motwani STOC'98 LSH framing): deterministic
    sign-bit sketches bucket the corpus; only bucket-mates (and optionally
    neighbor buckets) are scored. The scale path: candidate scoring is a
    bucket equi-join, not a full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector (broadcast as a literal
    array — no shuffle at all; the scan streams once)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_sketch(vec: Column, dim: int, planes: int = 16) -> Column:
    """Random-hyperplane sign sketch with DETERMINISTIC pseudo-random planes:
    plane p's weight for dimension d = (xxhash64(p*dim+d) scaled to [-1,1]).
    Same planes on every executor with zero data movement."""
    bits = []
    for p in range(planes):
        weights = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d, p=p: (
                F.xxhash64(F.lit(p * 100003).cast("long") + d.cast("long"))
                .cast("double")
                / F.lit(float(2**63))
            ),
        )
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, p))
    sketch = bits[0]
    for b in bits[1:]:
        sketch = sketch + b
    return sketch


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query via LSH bucketing: join corpus and queries on the
    hyperplane sketch, score only bucket-mates, window top-k per query.

    Recall < 1.0 by construction (ANN); raise `planes` tables or probe
    neighboring buckets for higher recall.
    """
    from pyspark.sql import Window

    corpus = embeddings.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("corpus_vec"),
    ).withColumn("bucket", hyperplane_sketch(F.col("corpus_vec"), dim, planes))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    ).withColumn("bucket", hyperplane_sketch(F.col("query_vec"), dim, planes))
    scored = corpus.join(qs, "bucket").withColumn(
        "cosine", F.round(cosine_col(F.col("corpus_vec"), F.col("query_vec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )

"""k-NN-distance embedding outliers — the manifold-distance noise
filter for embedding-space curation (Ramaswamy et al. SIGMOD 2000
"Efficient algorithms for mining outliers from large data sets": rank
points by distance to their k-th nearest neighbour; SemDeDup prunes the
DENSE end of the same geometry, this flags the SPARSE end — mislabeled,
corrupted or off-manifold points a contrastive/cluster stage should
quarantine before they seed bad centroids or hard-negative pools).

Candidate generation is the certified hyperplane-bucket discipline
(ops/ann.md5_plane_weights literal planes: few planes => coarse
buckets => dense candidate sets): pairwise cosine runs ONLY inside a
bucket, never all-pairs. A point's k-th-highest candidate cosine (in
exact integer 1e-4 units) is its density score — LOW kth cosine =
isolated. Points with fewer than k bucket-mates surface with
low_support = true (they are themselves outlier-suspicious: an
almost-empty LSH bucket IS sparseness evidence, but the score is then
an under-sample — callers re-probe with more tables, not trust it).

Shape at 100 TB: bucket equi-join (the SemDeDup within-cell bound),
one map-side-combined groupBy(point) collecting the bounded
bucket-mate sims, kth by sorted-array index. No global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.ann import (
    cosine_col,
    hyperplane_sketch_literal,
    md5_plane_weights,
)


def embedding_knn_outliers(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    dim: int = 64,
    planes: int = 3,
) -> DataFrame:
    """Returns (vec_id, n_candidates, kth_cos_dm, low_support),
    ascending kth_cos_dm = most isolated first (callers sort/cut)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = md5_plane_weights(dim=dim, planes=planes)
    base = embeddings.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", hyperplane_sketch_literal(F.col("v"), w))
    a, b = base.alias("a"), base.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") != F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc"),
            F.coalesce(
                F.round(
                    F.round(cosine_col(F.col("a.v"), F.col("b.v")), 4)
                    * 10000,
                    0,
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("s"),
        )
    )
    per = sims.groupBy("doc").agg(
        F.sort_array(F.collect_list("s"), asc=False).alias("arr")
    )
    n = F.size("arr")
    kth = F.element_at(F.col("arr"), F.least(F.lit(k), n))
    scored = per.select(
        F.col("doc").alias(id_col),
        n.cast("long").alias("n_candidates"),
        kth.alias("kth_cos_dm"),
        (n < k).alias("low_support"),
    )
    # bucket singletons have NO pair rows: surface them, never drop
    lone = (
        base.select(F.col("doc").alias(id_col))
        .join(scored.select(id_col), id_col, "left_anti")
        .select(
            id_col,
            F.lit(0).cast("long").alias("n_candidates"),
            F.lit(None).cast("long").alias("kth_cos_dm"),
            F.lit(True).alias("low_support"),
        )
    )
    return scored.union(lone)

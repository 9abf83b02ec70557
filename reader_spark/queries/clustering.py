"""Registry queries for exact-integer Lloyd k-means (ops/kmeans.py).

``kmeans_clusters`` runs 3 Lloyd iterations (k=8, micro-unit integer
math throughout) over the embeddings table and returns the final
per-cluster rollup; the DuckDB twin unrolls the SAME iterations as
CTEs from the same seed rule (k smallest vec_ids), so centroids,
memberships and inertia match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reader_spark.ops.kmeans import kmeans_fit

KMEANS_K = 8
KMEANS_ITER = 3


def _q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Lloyd k-means (3 iterations, k=8, micro-unit quantization) over embeddings (ops.kmeans)."""
    embeds = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, clusters = kmeans_fit(embeds, k=KMEANS_K, n_iter=KMEANS_ITER)
    return clusters


def _q_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GreeDi facility-location subset selection (ops.submodular.
    facility_location_greedi, Mirzasoleiman et al. NeurIPS 2013): md5
    hash buckets (8), bucket-local greedy-k (pair joins stay inside the
    bucket), then exact greedy over the bounded local-winner pool
    against the FULL corpus via literal-explode scoring. Integer 1e-4
    cosine units end to end; (gain desc, id asc) elections."""
    from reader_spark.ops.submodular import facility_location_greedi

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return facility_location_greedi(emb, k=4, buckets=8)




def _q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN-distance outliers (ops.outliers.embedding_knn_outliers,
    Ramaswamy 2000) over the embeddings table: literal md5 hyperplane
    buckets confine the pairwise cosine, each point scored by its
    4th-highest bucket-mate cosine in exact 1e-4 units; sparse buckets
    surface low_support instead of dropping."""
    from reader_spark.ops.outliers import embedding_knn_outliers

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_knn_outliers(emb, k=4, planes=3)


QUERIES = {
    "facility_location": _q_facility_location,
    "embedding_outliers": _q_embedding_outliers,
    "kmeans_clusters": _q_kmeans_clusters,
}

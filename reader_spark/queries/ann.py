"""Registry queries for the ANN / vector-index family (ops/ann.py,
ops/evals.py) — factored out of __spark_entry__.py (VERDICT r4 #7
registry-hygiene ask; the entry file stays a reviewable registry).
Callables and names are unchanged — the driver contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    from reader_spark.ops.ann import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    query_vec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return brute_force_topk(emb, [float(v) for v in query_vec], k=10)


def _q_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (ops.ann.binary_hamming_topk): sign-bit codes
    packed into 32-bit words, Hamming candidate top-50 via TakeOrdered
    (scan-bound, no shuffle, deterministic (hamming, id) boundary cut),
    exact cosine rerank only within candidates. The 16-byte-per-vector
    compact-code path every vector store ships as its scale tier."""
    from reader_spark.ops.ann import binary_hamming_topk

    emb = _read(spark, sf_dir, "embeddings")
    query_vec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return binary_hamming_topk(
        emb, [float(v) for v in query_vec], k=10, candidates=50
    )


def _q_binary_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the binary sign-bit ANN path vs exact cosine ground
    truth over an 8-query sample (ops.evals.binary_recall_eval) — the
    index-quality dashboard row, fully value-oracled because both legs
    order deterministically. The exact leg is the documented eval-sample
    query x corpus shape, never a production join."""
    from reader_spark.ops.evals import binary_recall_eval

    return binary_recall_eval(_read(spark, sf_dir, "embeddings"))


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (approximate: rows-only check)."""
    from reader_spark.ops.ann import lsh_bucketed_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    return lsh_bucketed_topk(emb, queries, dim=64, k=5, planes=8)


def _q_ann_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN with ENGINE-PORTABLE literal planes (md5-derived
    weights embedded identically in the DuckDB oracle) — the fully
    oracle-checked twin of ann_lsh. Same physical shape: bucket equi-join,
    cosine on bucket-mates only, window top-k."""
    from reader_spark.ops.ann import lsh_bucketed_topk_literal, md5_plane_weights

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    return lsh_bucketed_topk_literal(
        emb, queries, md5_plane_weights(dim=64, planes=8), k=5
    )


def _q_ann_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search path with SEEDED centroids (8 fixed corpus vectors chosen
    by a portable rule: the 8 smallest vec_ids >= 100) — the fully
    oracle-checked twin of ann_ivf. Certifies the entire search machinery
    (argmin cell assignment, nprobe probing, cell equi-join, cosine top-k)
    value-for-value; the k-means trainer itself is recall-tested in pytest.
    """
    from reader_spark.ops.ann import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.where(F.col("vec_id") >= 100)
        .orderBy("vec_id")
        .limit(8)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    queries = emb.where(F.col("vec_id") < 4)
    return ivf_topk(emb, queries, centroids, k=5, nprobe=2)


def _q_pq_encode_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (m=8 subspaces, k=16 codes) with
    ENGINE-PORTABLE literal codebooks — oracle-checked code-for-code
    against DuckDB's argmin over the same literals. codes emitted as a
    comma-joined string for a portable value compare."""
    from reader_spark.ops.ann import md5_pq_codebooks, pq_encode

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    enc = pq_encode(emb, md5_pq_codebooks(dim=64, m=8, k=16))
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), ","
        ).alias("codes_str"),
    )


def _q_pq_adc_topk_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 over PQ codes (query = vec_id 0): the per-(subspace,
    code) distance table is literal on the Spark side and recomputed from
    the same codebook literals in the DuckDB oracle — scoring is m table
    lookups + a sum, no float vectors read."""
    from reader_spark.ops.ann import md5_pq_codebooks, pq_adc_topk, pq_encode

    emb = _read(spark, sf_dir, "embeddings")
    books = md5_pq_codebooks(dim=64, m=8, k=16)
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    enc = pq_encode(emb, books)
    return pq_adc_topk(enc, books, qv, topk=10)


def _q_ivfadc_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVFADC composition, oracle-checked end-to-end: seeded IVF
    centroids (portable rule) route queries to nprobe cells; PQ codes of
    the probed cells are scored by asymmetric distance against md5-literal
    codebooks. The DuckDB oracle rebuilds every stage from the same
    literals."""
    from reader_spark.ops.ann import ivfadc_topk, md5_pq_codebooks

    emb = _read(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.where(F.col("vec_id") >= 100)
        .orderBy("vec_id")
        .limit(8)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    queries = emb.where(F.col("vec_id") < 4)
    return ivfadc_topk(
        emb, queries, centroids, md5_pq_codebooks(dim=64, m=8, k=16), k=5, nprobe=2
    )


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: k-means coarse quantizer, nprobe-cell search
    (approximate: rows-only check; recall vs brute force tested in
    tests/test_ops.py::TestIvf)."""
    from reader_spark.ops.ann import ivf_topk, train_ivf_centroids

    emb = _read(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, n_cells=8, iters=2)
    queries = emb.where(F.col("vec_id") < 4)
    return ivf_topk(emb, queries, centroids, k=5, nprobe=2)


QUERIES = {
    "ann_topk": _q_ann_topk,
    "binary_hamming_topk": _q_binary_hamming_topk,
    "binary_recall_eval": _q_binary_recall_eval,
    "ann_lsh": _q_ann_lsh,
    "ann_lsh_md5": _q_ann_lsh_md5,
    "ann_ivf_seeded": _q_ann_ivf_seeded,
    "pq_encode_md5": _q_pq_encode_md5,
    "pq_adc_topk_md5": _q_pq_adc_topk_md5,
    "ivfadc_md5": _q_ivfadc_md5,
    "ann_ivf": _q_ann_ivf,
}

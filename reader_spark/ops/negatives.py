"""Hard-negative mining for contrastive retrieval training.

The DPR/ANCE data-prep step (Karpukhin et al. 2020 §5.2; Xiong et al.
2021): for each anchor vector, find the most-similar vectors carrying a
DIFFERENT label — the negatives near the decision boundary that actually
teach a margin, versus random negatives that are trivially far. Consumes
any (id, vector, label) frame: model embeddings, or
ops.vectorize.feature_hash_vectors output joined with labels.

Two paths, one output contract
``(anchor_id, anchor_label, neg_id, neg_label, cosine, rank)``:

- :func:`hard_negatives_brute` — anchors x pool theta-join
  (``anchor_label != neg_label`` is a non-equi predicate, so Spark plans a
  BroadcastNestedLoopJoin). EXACT, but quadratic when anchors = corpus —
  keep it for fixture-scale oracle checking and recall measurement only.
- :func:`hard_negatives_bucketed` — the 100 TB path: candidates come from
  a hyperplane-LSH **bucket equi-join** (the cross-label filter applies
  inside the bucket join), then exact cosine re-rank within candidates
  only. The shuffle is keyed by bucket; nothing is all-pairs. Recall < 1
  by construction; ``multiprobe=True`` additionally probes every
  Hamming-distance-1 bucket of each anchor (candidates x(planes+1),
  recall up — Lv et al. 2007 multi-probe LSH), and distinct probe values
  guarantee a (anchor, negative) pair is generated at most once.

Plane families: pass ``weights`` (literal planes, e.g.
ops.ann.md5_plane_weights — engine-portable, oracle-checkable) or omit it
for the seeded xxhash64 sketch (ops.ann.hyperplane_sketch — zero literal
bloat, production default).

Reference scope note: vakra-dev/reader ends at clean text; this module is
part of the training-data pipeline layer built over its corpus output
(SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reader_spark.ops.ann import (
    cosine_col,
    hyperplane_sketch,
    hyperplane_sketch_literal,
)

__all__ = ["hard_negatives_brute", "hard_negatives_bucketed"]


def _prep(
    anchors: DataFrame,
    pool: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> tuple[DataFrame, DataFrame]:
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).cast("array<double>").alias("av"),
        F.col(label_col).alias("anchor_label"),
    )
    p = pool.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        F.col(label_col).alias("neg_label"),
    )
    return a, p


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hard_negatives_brute(
    anchors: DataFrame,
    pool: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Exact cross-label top-k via the anchors x pool theta-join.

    Quadratic (BroadcastNestedLoopJoin) — fixture-scale oracle twin and
    recall reference for the bucketed path; never run with anchors=corpus.
    """
    a, p = _prep(anchors, pool, id_col, vec_col, label_col)
    scored = a.join(p, F.col("anchor_label") != F.col("neg_label")).select(
        "anchor_id",
        "anchor_label",
        "neg_id",
        "neg_label",
        F.round(cosine_col(F.col("av"), F.col("nv")), 4).alias("cosine"),
    )
    return _rank_topk(scored, k)


def hard_negatives_bucketed(
    anchors: DataFrame,
    pool: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
    planes: int = 8,
    weights: list[list[float]] | None = None,
    multiprobe: bool = False,
) -> DataFrame:
    """Cross-label top-k with LSH-bucketed candidate generation.

    Both sides are sketched with the same hyperplane family; candidates
    come from one bucket equi-join carrying the ``anchor_label !=
    neg_label`` filter, and only candidates pay the exact cosine. With
    ``multiprobe`` each anchor also probes its ``planes``
    Hamming-distance-1 buckets (a sign flip on one plane — where a
    near-boundary neighbor lands), trading candidate volume for recall.

    Scale shape: one shuffle keyed by bucket (AQE handles skewed buckets);
    per-bucket work is |bucket_a| x |bucket_p|, bounded by plane count —
    no BroadcastNestedLoopJoin anywhere (plan-tested).
    """
    if weights is None and dim is None:
        raise ValueError("provide literal `weights` or `dim` for seeded planes")
    n_planes = len(weights) if weights is not None else planes

    def sketch(vec):
        if weights is not None:
            return hyperplane_sketch_literal(vec, weights)
        return hyperplane_sketch(vec, dim, planes)

    a, p = _prep(anchors, pool, id_col, vec_col, label_col)
    p = p.withColumn("bucket", sketch(F.col("nv")))
    a = a.withColumn("__b0", sketch(F.col("av")))
    if multiprobe:
        # probe values are pairwise distinct (b0 xor distinct single bits),
        # so no (anchor, neg) pair can be emitted twice — no dedup pass.
        probes = F.array(
            F.col("__b0"),
            *[
                F.col("__b0").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        a = a.select(
            "anchor_id", "av", "anchor_label", F.explode(probes).alias("bucket")
        )
    else:
        a = a.withColumnRenamed("__b0", "bucket")
    scored = (
        a.join(p, "bucket")
        .where(F.col("anchor_label") != F.col("neg_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.round(cosine_col(F.col("av"), F.col("nv")), 4).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)

"""Greedy k-center coreset selection (Gonzalez 1985 farthest-point).

The diversity-coverage selector for training-data curation: pick k
exemplars such that every corpus vector is within the coverage radius of
some exemplar — 2-approximation to the optimal k-center cover. Where
SemDeDup removes redundancy (prune near-dups), k-center ADDS coverage
(pick maximally spread exemplars) — the two ends of the curation
spectrum; also the standard seeding for active learning batches
(Sener & Savarese 2018, "Active Learning for CNNs: A Core-Set Approach").

Scale shape: k driver iterations; each broadcasts ONE literal center
vector (the round's farthest point, a 1-row TakeOrdered — no global
sort), updates the running min-distance column scan-locally, and reads
back one (id, vector) row. Driver traffic is k x dim floats total — the
same sanctioned pattern as IVF centroid training. The corpus frame is
localCheckpoint'ed per round so lineage stays flat.

Determinism / portability: distances are round-9 squared L2 against
literal centers; farthest-point ties break on smallest id; the DuckDB
oracle replays the k rounds as unrolled MATERIALIZED CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.ann import _sq_l2

__all__ = ["k_center_select"]


def k_center_select(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns (rank, vec_id, radius): the k greedily-selected centers in
    pick order, with the corpus coverage radius (max over vectors of the
    round-9 min squared-L2 to the selected set, round 6) AFTER each pick.

    Seed = smallest id (deterministic); pick i+1 = argmax current
    min-distance, ties to smallest id.
    """
    spark = embeddings.sparkSession
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).localCheckpoint(eager=True)

    seed = base.orderBy("id").limit(1).head()
    centers = [(int(seed["id"]), list(seed["v"]))]
    cur = base.select(
        "id", "v", F.round(_sq_l2(F.col("v"), centers[0][1]), 9).alias("min_d")
    ).localCheckpoint(eager=True)
    out = []
    for rank in range(1, k + 1):
        radius = cur.agg(F.round(F.max("min_d"), 6).alias("r")).head()["r"]
        out.append((rank, centers[-1][0], float(radius)))
        if rank == k:
            break
        far = cur.orderBy(F.desc("min_d"), F.asc("id")).limit(1).head()
        centers.append((int(far["id"]), list(far["v"])))
        cur = cur.select(
            "id",
            "v",
            F.least(
                F.col("min_d"), F.round(_sq_l2(F.col("v"), centers[-1][1]), 9)
            ).alias("min_d"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(out, "rank int, vec_id long, radius double")

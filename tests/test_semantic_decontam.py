"""Semantic decontamination (ops/decontam.semantic_decontaminate):
planted leaks, the bucket-recall trade vs brute force, rollup counts."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.ann import md5_plane_weights
from reader_spark.ops.decontam import semantic_decontaminate

pytestmark = pytest.mark.spark

DIM = 8


def _v(*hot):
    v = [0.01] * DIM
    for i, x in hot:
        v[i] = x
    return v


@pytest.fixture(scope="module")
def frames(spark):
    evals = spark.createDataFrame(
        [
            Row(eval_id=900, embedding=_v((0, 1.0))),
            Row(eval_id=901, embedding=_v((1, 1.0))),
        ]
    )
    corpus = spark.createDataFrame(
        [
            # exact copy of eval 900 -> cosine 1.0
            Row(vec_id=1, embedding=_v((0, 1.0))),
            # near both evals -> two hits
            Row(vec_id=2, embedding=_v((0, 0.9), (1, 0.9))),
            # far from both
            Row(vec_id=3, embedding=_v((5, 1.0), (0, -0.5), (1, -0.5))),
        ]
    )
    return corpus, evals


def test_planted_leak_and_rollup(spark, frames):
    corpus, evals = frames
    w = md5_plane_weights(dim=DIM, planes=1)  # one plane: everything
    got = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            corpus, evals, w, tau_round4=0.5
        ).collect()
    }
    assert 1 in got and got[1]["max_cosine"] == 1.0
    assert got[1]["n_eval_hits"] >= 1
    # vec 2 is near BOTH evals, but hits only bucket-mates — with one
    # plane the two evals can land in different buckets, so the count
    # is 1 or 2 (the documented recall trade; subset-of-brute below)
    if 2 in got:
        assert 1 <= got[2]["n_eval_hits"] <= 2
    assert 3 not in got


def test_flags_subset_of_brute_force(spark, frames):
    corpus, evals = frames
    w = md5_plane_weights(dim=DIM, planes=2)
    flagged = {
        r["vec_id"]
        for r in semantic_decontaminate(
            corpus, evals, w, tau_round4=0.5
        ).collect()
    }
    from reader_spark.ops.ann import cosine_col

    brute = {
        r["vec_id"]
        for r in corpus.crossJoin(
            evals.select(F.col("embedding").alias("ev"))
        )
        .select(
            "vec_id",
            F.round(
                cosine_col(
                    F.col("embedding").cast("array<double>"),
                    F.col("ev").cast("array<double>"),
                ),
                4,
            ).alias("cos"),
        )
        .where(F.col("cos") >= 0.5)
        .collect()
    }
    assert flagged <= brute
    assert 3 not in brute


def test_empty_eval_set(spark, frames):
    corpus, _ = frames
    empty = corpus.sparkSession.createDataFrame(
        [], "eval_id long, embedding array<double>"
    )
    w = md5_plane_weights(dim=DIM, planes=2)
    assert semantic_decontaminate(corpus, empty, w).count() == 0

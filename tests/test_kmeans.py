"""Exact-integer Lloyd k-means (ops/kmeans.py): pinned against a pure-
Python reference on the same integer math, plus separation, empty-
cluster, and plan-shape checks."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.kmeans import (
    kmeans_assign,
    kmeans_fit,
    quantize_embeddings,
)

pytestmark = pytest.mark.spark


def _py_kmeans(vecs, k, n_iter):
    """Reference Lloyd on quantized integer vectors, same contracts:
    seed = k smallest ids, packed-argmin tie-break to smallest cluster,
    floor(sum/n) update, empty clusters keep previous centroid."""
    import math

    q = {i: [round(x * 1_000_000) for x in v] for i, v in vecs.items()}
    cents = [list(q[i]) for i in sorted(q)[:k]]

    def argmin(v):
        best = None
        for ci, c in enumerate(cents):
            d = sum((a - b) * (a - b) for a, b in zip(v, c))
            p = d * 64 + ci
            best = p if best is None or p < best else best
        return best % 64, best // 64

    for _ in range(n_iter):
        members = {ci: [] for ci in range(k)}
        for i, v in q.items():
            members[argmin(v)[0]].append(v)
        for ci in range(k):
            if members[ci]:
                n = len(members[ci])
                cents[ci] = [
                    math.floor(sum(col) / n) for col in zip(*members[ci])
                ]
    out = {}
    for i, v in q.items():
        c, d = argmin(v)
        agg = out.setdefault(c, [0, 0])
        agg[0] += 1
        agg[1] += d // 1024
    return cents, out


@pytest.fixture(scope="module")
def embeds(spark):
    # Two tight blobs around (1, 0, ...) and (-1, 0.5, ...), plus noise.
    rows = []
    for i in range(30):
        base = [1.0, 0.0, 0.25] if i % 2 == 0 else [-1.0, 0.5, -0.25]
        rows.append(
            Row(
                vec_id=i,
                embedding=[b + ((i * 7 + j) % 5 - 2) * 0.01
                           for j, b in enumerate(base)],
            )
        )
    return spark.createDataFrame(rows)


def test_matches_python_reference(spark, embeds):
    vecs = {r["vec_id"]: list(r["embedding"]) for r in embeds.collect()}
    ref_cents, ref_rollup = _py_kmeans(vecs, k=3, n_iter=3)
    cents, clusters = kmeans_fit(embeds, k=3, n_iter=3)
    assert cents == ref_cents
    got = {
        r["cluster"]: (r["n_members"], r["inertia_kilo"])
        for r in clusters.collect()
    }
    assert got == {c: tuple(v) for c, v in ref_rollup.items()}


def test_two_blobs_separate(spark, embeds):
    cents, clusters = kmeans_fit(embeds, k=2, n_iter=4)
    rows = clusters.collect()
    assert sorted(r["n_members"] for r in rows) == [15, 15]
    # Centroids land near the blob centers (micro-units).
    firsts = sorted(c[0] for c in cents)
    assert firsts[0] < -900_000 and firsts[1] > 900_000


def test_assign_rollup_consistency(spark, embeds):
    cents, clusters = kmeans_fit(embeds, k=2, n_iter=2)
    again = kmeans_assign(embeds, cents)
    a = {r["cluster"]: r["n_members"] for r in clusters.collect()}
    b = {r["cluster"]: r["n_members"] for r in again.collect()}
    assert a == b


def test_k_exceeding_corpus_raises(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[0.1, 0.2])])
    with pytest.raises(ValueError):
        kmeans_fit(df, k=4, n_iter=1)


def test_assignment_plan_zero_exchange(spark, embeds):
    """The per-iteration assignment must be WITHIN-ROW: centroids ride
    as a literal, no crossJoin, no Exchange before the update agg."""
    from tests.test_plans import plan_of

    q = quantize_embeddings(embeds)
    from reader_spark.ops.kmeans import _packed_argmin

    cents = [[0] * 3, [1_000_000] * 3]
    assigned = q.select(
        "vec_id", (_packed_argmin(cents) % 64).alias("cluster")
    )
    plan = plan_of(assigned)
    assert "Exchange" not in plan
    assert "Join" not in plan
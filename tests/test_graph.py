"""Weighted PageRank (reader_spark.ops.graph)."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(
        [Row(src=s, dst=d, w=float(w)) for s, d, w in rows]
    )


class TestPagerank:
    def test_symmetric_cycle_is_uniform(self, spark):
        e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
        pr = {r.node: r.pr for r in pagerank(e, iterations=5).collect()}
        assert pr == {"a": pytest.approx(1 / 3, abs=1e-6),
                      "b": pytest.approx(1 / 3, abs=1e-6),
                      "c": pytest.approx(1 / 3, abs=1e-6)}

    def test_dangling_node_one_iteration(self, spark):
        # A->B, B dangling: hand-computed first iteration at d=0.85
        e = _edges(spark, [("a", "b", 1)])
        pr = {r.node: r.pr for r in pagerank(e, iterations=1).collect()}
        assert pr["a"] == pytest.approx(0.2875, abs=1e-9)
        assert pr["b"] == pytest.approx(0.7125, abs=1e-9)

    def test_rank_conserved(self, spark):
        e = _edges(
            spark,
            [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("d", "a", 1)],
        )
        total = (
            pagerank(e, weight_col="w", iterations=6)
            .agg({"pr": "sum"})
            .head()[0]
        )
        assert total == pytest.approx(1.0, abs=1e-6)

    def test_edge_weights_matter(self, spark):
        # a splits 3:1 between b and c; b and c both return to a, so the
        # only asymmetry is the weight
        e = _edges(
            spark,
            [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        )
        pr = {r.node: r.pr for r in pagerank(e, weight_col="w", iterations=8).collect()}
        assert pr["b"] > pr["c"]

    def test_unweighted_parallel_edges_add(self, spark):
        # two parallel a->b edges behave like weight 2 vs one a->c
        e = _edges(spark, [("a", "b", 1), ("a", "b", 1), ("a", "c", 1),
                           ("b", "a", 1), ("c", "a", 1)])
        pr = {r.node: r.pr for r in pagerank(e, iterations=8).collect()}
        assert pr["b"] > pr["c"]

    def test_validation(self, spark):
        e = _edges(spark, [("a", "b", 1)])
        with pytest.raises(ValueError, match="iterations"):
            pagerank(e, iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(e, damping=1.0)

    def test_empty_edges_raise_cleanly(self, spark):
        e = spark.createDataFrame([], "src string, dst string, w double")
        with pytest.raises(ValueError, match="empty"):
            pagerank(e)


def test_pagerank_iterations_are_driver_free():
    """Dangling mass must fold in as a broadcast dim, not a per-iteration
    .head()/.collect() driver sync (VERDICT r2 #6) — on a 50-iteration
    convergence run each sync is an extra job launch on the critical
    path."""
    import inspect

    from reader_spark.ops import graph

    loop_body = inspect.getsource(graph.pagerank).split(
        "for _ in range(iterations):"
    )[1]
    assert ".head()" not in loop_body
    assert ".collect()" not in loop_body
    assert "broadcast" in loop_body

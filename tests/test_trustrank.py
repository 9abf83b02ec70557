"""TrustRank + spam mass (ops/graph.py, Gyongyi et al. 2004/2006)."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.graph import spam_mass, trustrank


def _graph(spark):
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="a"), Row(src="c", dst="b")]
    )
    seeds = spark.createDataFrame([Row(node="a")])
    return edges, seeds


def test_hand_computed_two_iterations(spark):
    # d=[a:1]; t1 = (.15, .85, 0); t2(a)=.15+.85*.85=.8725,
    # t2(b)=.85*.15=.1275, c unreachable from the seed: exactly 0
    edges, seeds = _graph(spark)
    got = {r["node"]: r["tr"] for r in trustrank(edges, seeds, iterations=2).collect()}
    assert got == {"a": 0.8725, "b": 0.1275, "c": 0.0}


def test_trust_is_conserved(spark):
    edges, seeds = _graph(spark)
    total = sum(
        r["tr"] for r in trustrank(edges, seeds, iterations=5).collect()
    )
    assert abs(total - 1.0) < 1e-6


def test_spam_mass_flags_untrusted_node(spark):
    edges, seeds = _graph(spark)
    rows = {r["node"]: r for r in spam_mass(edges, seeds).collect()}
    assert rows["c"]["tr"] == 0.0
    assert rows["c"]["rel_mass"] == 1.0
    assert rows["c"]["spam_candidate"]
    # the seed and its neighborhood are not spam candidates
    assert not rows["a"]["spam_candidate"]
    assert not rows["b"]["spam_candidate"]


def test_seed_outside_graph_is_clipped(spark):
    edges, _ = _graph(spark)
    seeds = spark.createDataFrame([Row(node="a"), Row(node="zzz-not-here")])
    got = {r["node"]: r["tr"] for r in trustrank(edges, seeds, iterations=2).collect()}
    # |S| after clipping is 1 — identical to the single-seed run
    assert got == {"a": 0.8725, "b": 0.1275, "c": 0.0}


def test_no_seed_in_graph_raises(spark):
    edges, _ = _graph(spark)
    seeds = spark.createDataFrame([Row(node="nope")])
    with pytest.raises(ValueError):
        trustrank(edges, seeds)


def test_tol_early_stop(spark):
    edges, seeds = _graph(spark)
    # an enormous tol stops after the first iteration
    one = {r["node"]: r["tr"] for r in trustrank(edges, seeds, iterations=1).collect()}
    early = {
        r["node"]: r["tr"]
        for r in trustrank(edges, seeds, iterations=50, tol=10.0).collect()
    }
    assert one == early


def test_registry_and_oracles(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in ("trustrank_domains", "spam_mass_domains"):
        assert name in qs and name in oracles
    df = qs["trustrank_domains"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) >= 20  # 20 source domains + synthetic dst nodes
    assert abs(sum(r["tr"] for r in rows) - 1.0) < 1e-4

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

    def test_tol_early_stop(self, spark, monkeypatch):
        """A symmetric cycle starts AT its fixed point, so with tol set a
        50-iteration request must stop after one round (observed by
        counting localCheckpoint calls: 2 setup + 1 iteration)."""
        # patch the CONCRETE class: pyspark 4's abstract pyspark.sql
        # DataFrame is overridden by the classic subclass at runtime
        e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
        cls = type(e)
        calls = {"n": 0}
        orig = cls.localCheckpoint

        def counting(df, eager=True):
            calls["n"] += 1
            return orig(df, eager=eager)

        monkeypatch.setattr(cls, "localCheckpoint", counting)
        pr = {r.node: r.pr for r in
              pagerank(e, iterations=50, tol=1e-9).collect()}
        assert calls["n"] == 3
        assert pr["a"] == pytest.approx(1 / 3, abs=1e-6)

    def test_tiny_tol_matches_fixed_count_exactly(self, spark):
        """tol small enough never fires, so the result is value-identical
        to the fixed-count twin — the oracle row is unaffected by the
        convergence machinery."""
        e = _edges(
            spark,
            [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("d", "a", 1)],
        )
        fixed = sorted(map(tuple, pagerank(e, weight_col="w",
                                           iterations=5).collect()))
        tol = sorted(map(tuple, pagerank(e, weight_col="w", iterations=5,
                                         tol=1e-15).collect()))
        assert fixed == tol

    def test_tol_validation(self, spark):
        e = _edges(spark, [("a", "b", 1)])
        with pytest.raises(ValueError, match="tol"):
            pagerank(e, tol=0.0)


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
    # the tol convergence check is the one permitted scalar readback, and
    # it must stay guarded so fixed-count runs never pay a driver sync
    assert loop_body.count(".first()") == 1
    guarded = loop_body.split("if tol is not None:")[1]
    assert ".first()" in guarded


class TestHits:
    def _edges(self, spark):
        from pyspark.sql import Row

        # classic hub: h links to a1,a2,a3; a1 also linked by x
        return spark.createDataFrame(
            [Row(src="h", dst="a1"), Row(src="h", dst="a2"),
             Row(src="h", dst="a3"), Row(src="x", dst="a1")]
        )

    def test_hub_and_authority_ordering(self, spark):
        from reader_spark.ops.graph import hits

        got = {r.node: r for r in hits(self._edges(spark), iterations=3).collect()}
        # h links to everything -> top hub; a1 has 2 in-links -> top authority
        assert got["h"].hub == max(r.hub for r in got.values())
        assert got["a1"].authority == max(r.authority for r in got.values())
        assert got["a2"].authority == got["a3"].authority
        # pure authorities have no out-links -> zero hub score
        assert got["a2"].hub == 0.0

    def test_scores_are_l1_normalized(self, spark):
        from reader_spark.ops.graph import hits

        rows = hits(self._edges(spark), iterations=2).collect()
        assert abs(sum(r.hub for r in rows) - 1.0) < 1e-6
        assert abs(sum(r.authority for r in rows) - 1.0) < 1e-6

    def test_no_driver_sync_in_loop(self):
        import inspect

        from reader_spark.ops import graph

        loop = inspect.getsource(graph.hits).split("for _ in range(iterations):")[1]
        assert ".head()" not in loop and ".collect()" not in loop
        assert "broadcast" in loop
        assert loop.count(".first()") == 1
        assert ".first()" in loop.split("if tol is not None:")[1]

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.graph import hits

        with _pytest.raises(ValueError, match="iterations"):
            hits(self._edges(spark), iterations=0)
        with _pytest.raises(ValueError, match="tol"):
            hits(self._edges(spark), tol=-1.0)
        empty = spark.createDataFrame([], "src string, dst string")
        with _pytest.raises(ValueError, match="empty"):
            hits(empty)

    def test_tol_converges_early_to_fixed_point(self, spark, monkeypatch):
        """HITS on the hub fixture converges geometrically; a 50-iteration
        request with tol must stop far earlier and still agree with a long
        fixed-count run at 4 dp."""
        from pyspark.sql import DataFrame

        from reader_spark.ops.graph import hits

        edges = self._edges(spark)
        cls = type(edges)
        calls = {"n": 0}
        orig = cls.localCheckpoint

        def counting(df, eager=True):
            calls["n"] += 1
            return orig(df, eager=eager)

        monkeypatch.setattr(cls, "localCheckpoint", counting)
        got = {r.node: r for r in
               hits(edges, iterations=50, tol=1e-7).collect()}
        # 2 setup checkpoints + 2 per iteration: well under 50 rounds
        iterations_run = (calls["n"] - 2) // 2
        assert iterations_run < 25
        ref = {r.node: r for r in
               hits(self._edges(spark), iterations=30).collect()}
        for n in ref:
            assert got[n].hub == pytest.approx(ref[n].hub, abs=1e-4)
            assert got[n].authority == pytest.approx(
                ref[n].authority, abs=1e-4)


class TestTriangles:
    def _tc(self, spark, pairs):
        from reader_spark.ops.graph import triangle_counts

        df = spark.createDataFrame(pairs, "src string, dst string")
        return {r.node: r for r in triangle_counts(df).collect()}

    def test_k4_every_node_in_three_triangles(self, spark):
        nodes = ["a", "b", "c", "d"]
        got = self._tc(spark, [(x, y) for x in nodes for y in nodes if x < y])
        for n in nodes:
            assert got[n].n_triangles == 3 and got[n].deg == 3
            assert abs(got[n].clustering - 1.0) < 1e-9

    def test_path_graph_has_none(self, spark):
        got = self._tc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert all(r.n_triangles == 0 for r in got.values())
        assert got["b"].clustering == 0.0

    def test_direction_and_duplicates_ignored(self, spark):
        got = self._tc(
            spark, [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "a")]
        )
        assert got["a"].n_triangles == 1 and got["a"].deg == 2

    def test_matches_brute_force_on_seeded_graph(self, spark):
        import itertools
        import random

        rng = random.Random(11)
        nodes = [f"n{i}" for i in range(12)]
        und = {tuple(sorted(p)) for p in itertools.combinations(nodes, 2) if rng.random() < 0.4}
        want = {n: 0 for n in nodes}
        for a, b, c in itertools.combinations(nodes, 3):
            if {tuple(sorted((a, b))), tuple(sorted((b, c))),
                    tuple(sorted((a, c)))} <= und:
                for n in (a, b, c):
                    want[n] += 1
        got = self._tc(spark, sorted(und))
        for n in nodes:
            if n in got:
                assert got[n].n_triangles == want[n], n


class TestLabelPropagation:
    """Deterministic synchronous LPA (Raghavan et al. 2007 variant)."""

    def _lpa(self, spark, edges, iterations=4):
        from reader_spark.ops.graph import label_propagation

        df = spark.createDataFrame(edges, "src string, dst string")
        return {
            r["node"]: r["community"]
            for r in label_propagation(df, iterations=iterations).collect()
        }

    def test_two_triangles_one_bridge_stay_separate(self, spark):
        # CC would merge everything through the bridge; the vote must
        # keep the two dense triangles as distinct communities.
        tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
        tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
        got = self._lpa(spark, tri1 + tri2 + [("c", "x")])
        assert got["a"] == got["b"] == got["c"] == "a"
        assert got["x"] == got["y"] == got["z"] == "x"

    def test_star_converges_to_anchor_min_label(self, spark):
        # self-vote + min-label election: round 1 already settles a
        # star on the lexicographic min of {anchor, leaves}.
        got = self._lpa(
            spark, [("m", "p"), ("m", "q"), ("m", "r")], iterations=1
        )
        assert set(got.values()) == {"m"}

    def test_self_loops_and_direction_ignored(self, spark):
        got = self._lpa(spark, [("a", "a"), ("b", "a"), ("a", "b")])
        assert got == {"a": "a", "b": "a"}

    def test_iterations_validated(self, spark):
        import pytest as _pytest

        from reader_spark.ops.graph import label_propagation

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with _pytest.raises(ValueError):
            label_propagation(df, iterations=0)

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        df = entrymod.queries()["lpa_communities"](
            spark, "/root/testdata/sf0.001"
        )
        assert df.columns == ["node", "community"]
        o = entrymod.oracle_sql()
        assert "lpa_communities" in o and "lpa_community_sizes" in o


class TestSalsa:
    """Closed-form SALSA authorities (Lempel & Moran 2000)."""

    def _salsa(self, spark, edges):
        from reader_spark.ops.graph import salsa_authorities

        df = spark.createDataFrame(edges, "src string, dst string")
        return {r["node"]: r for r in salsa_authorities(df).collect()}

    def test_hand_computed_two_components(self, spark):
        # h1->{a,b}, h2->{b,c}, h3->{d}: components {a,b,c} and {d}
        # a(i) = (n_c/4) * (d_in/D_c): a=.1875 b=.375 c=.1875 d=.25
        got = self._salsa(
            spark,
            [("h1", "a"), ("h1", "b"), ("h2", "b"), ("h2", "c"), ("h3", "d")],
        )
        assert got["a"]["salsa"] == 0.1875
        assert got["b"]["salsa"] == 0.375
        assert got["c"]["salsa"] == 0.1875
        assert got["d"]["salsa"] == 0.25
        assert got["d"]["component"] == "d"  # isolated: own component
        assert got["a"]["component"] == got["c"]["component"] == "a"

    def test_mass_sums_to_one(self, spark):
        edges = [
            (f"h{i % 5}", f"a{(i * 3) % 11}") for i in range(40)
        ]
        got = self._salsa(spark, edges)
        assert abs(sum(r["salsa"] for r in got.values()) - 1.0) < 1e-3

    def test_parallel_edges_collapse(self, spark):
        got = self._salsa(
            spark, [("h", "a"), ("h", "a"), ("h", "b")]
        )
        assert got["a"]["d_in"] == 1 and got["b"]["d_in"] == 1
        assert got["a"]["salsa"] == got["b"]["salsa"] == 0.5

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        df = entrymod.queries()["salsa_authorities"](
            spark, "/root/testdata/sf0.001"
        )
        assert df.columns == ["node", "d_in", "component", "n_c", "salsa"]
        assert "salsa_authorities" in entrymod.oracle_sql()

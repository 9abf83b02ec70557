"""Crawl-refresh delta (reader_spark.ops.delta)."""

from pyspark.sql import Row

from reader_spark.ops.delta import (
    crawl_delta,
    crawl_delta_summary,
    refresh_frontier,
)


def _snap(spark, rows):
    return spark.createDataFrame([Row(doc_id=d, text=t) for d, t in rows])


OLD = [(1, "alpha"), (2, "beta"), (3, "gamma")]
NEW = [(2, "beta"), (3, "gamma v2"), (4, "delta")]


class TestCrawlDelta:
    def test_statuses(self, spark):
        got = {
            r.doc_id: r.status
            for r in crawl_delta(_snap(spark, OLD), _snap(spark, NEW)).collect()
        }
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "changed",
            4: "added",
        }

    def test_summary_counts(self, spark):
        got = {
            r.status: r.n_docs
            for r in crawl_delta_summary(
                _snap(spark, OLD), _snap(spark, NEW)
            ).collect()
        }
        assert got == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}

    def test_identical_snapshots_all_unchanged(self, spark):
        old = _snap(spark, OLD)
        got = {r.status for r in crawl_delta(old, _snap(spark, OLD)).collect()}
        assert got == {"unchanged"}

    def test_frontier_is_added_plus_changed_with_payload(self, spark):
        out = refresh_frontier(_snap(spark, OLD), _snap(spark, NEW)).collect()
        got = {(r.doc_id, r.text) for r in out}
        assert got == {(3, "gamma v2"), (4, "delta")}

    def test_hash_only_shuffle(self, spark):
        """The join input projects (id, md5) — the payload column must
        not appear in any exchange."""
        df = crawl_delta(_snap(spark, OLD), _snap(spark, NEW))
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text#" not in line


class TestChangeRate:
    def _hist(self, spark, rows):
        return spark.createDataFrame(
            [Row(doc_id=d, status=s) for d, s in rows]
        )

    def test_estimators(self, spark):
        import math

        # doc 1: 2 changes in 4 visits; doc 2's 'added' round not a visit
        rows = (
            [(1, "changed")] * 2
            + [(1, "unchanged")] * 2
            + [(2, "added"), (2, "changed"), (2, "unchanged")]
        )
        from reader_spark.ops.delta import change_rate

        got = {r.doc_id: r for r in change_rate(self._hist(spark, rows)).collect()}
        assert (got[1].n_visits, got[1].n_changes) == (4, 2)
        assert abs(got[1].rate_naive - round(-math.log(1 - 2 / 4), 6)) < 1e-9
        assert abs(got[1].rate_cho - round(-math.log(2.5 / 4.5), 6)) < 1e-9
        assert (got[2].n_visits, got[2].n_changes) == (2, 1)

    def test_always_changed_doc_naive_undefined(self, spark):
        from reader_spark.ops.delta import change_rate

        rows = [(1, "changed")] * 3
        got = change_rate(self._hist(spark, rows)).collect()[0]
        assert got.rate_naive is None  # X = n -> unbounded
        assert got.rate_cho is not None  # bias-reduced stays finite

    def test_never_changed_doc_rate_zero_naive(self, spark):
        from reader_spark.ops.delta import change_rate

        rows = [(1, "unchanged")] * 5
        got = change_rate(self._hist(spark, rows)).collect()[0]
        assert got.rate_naive == 0.0
        assert got.rate_cho == 0.0  # (n - 0 + .5)/(n + .5) = 1 -> ln 1


class TestSemanticDelta:
    def _run(self, spark, old_rows, new_rows):
        from pyspark.sql import Row

        from reader_spark.ops.delta import semantic_delta

        old = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in old_rows])
        new = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in new_rows])
        return {r["doc_id"]: r["status"] for r in semantic_delta(old, new).collect()}

    def test_cosmetic_vs_material(self, spark):
        got = self._run(
            spark,
            [(1, "hello world"), (2, "keep me"), (3, "real change"),
             (4, "smart quote ‘x’"), (5, "bye")],
            [
                (1, "  HELLO  world "),  # case+nbsp+pad -> cosmetic
                (2, "keep me"),                      # unchanged
                (3, "real change v2"),               # material
                (4, "smart quote 'x'"),              # quotes folded -> cosmetic
                (6, "brand new"),                    # added
            ],
        )
        assert got[1] == "cosmetic"
        assert got[2] == "unchanged"
        assert got[3] == "changed"
        assert got[4] == "cosmetic"
        assert got[5] == "removed"
        assert got[6] == "added"

    def test_registry_query_all_statuses(self, spark):
        import __spark_entry__ as e

        df = e.queries()["semantic_delta"](spark, "/root/testdata/sf0.001")
        statuses = {r["status"] for r in df.select("status").distinct().collect()}
        assert statuses == {"added", "removed", "changed", "cosmetic", "unchanged"}

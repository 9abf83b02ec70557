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

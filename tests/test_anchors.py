"""Anchor-text corpus aggregation (reader_spark.ops.anchors)."""

from pyspark.sql import Row

from reader_spark.ops.anchors import anchor_corpus


def _links(spark, rows):
    """rows: (target_url, anchor, src_domain)."""
    return spark.createDataFrame(
        [Row(target_url=u, anchor=a, src_domain=s) for u, a, s in rows]
    )


class TestAnchorCorpus:
    def test_aggregation_and_election(self, spark):
        rows = [
            ("u1", "spark guide", "a.com"),
            ("u1", "spark guide", "b.com"),
            ("u1", "the guide", "a.com"),
            ("u2", "data docs", "a.com"),
        ]
        got = {r.url: r for r in anchor_corpus(_links(spark, rows)).collect()}
        u1 = got["u1"]
        assert u1.n_refs == 3
        assert u1.n_anchors == 2
        assert u1.n_domains == 2
        assert u1.top_anchor == "spark guide"
        assert u1.top_anchor_refs == 2
        assert got["u2"].n_domains == 1

    def test_generic_and_empty_anchors_filtered(self, spark):
        rows = [
            ("u1", "click here", "a.com"),
            ("u1", "Read More", "a.com"),  # blocklist is case-insensitive
            ("u1", "   ", "a.com"),
            ("u1", "x" * 200, "a.com"),  # over max_len
            ("u1", "real anchor", "a.com"),
        ]
        got = anchor_corpus(_links(spark, rows)).collect()
        assert len(got) == 1
        assert got[0].n_refs == 1
        assert got[0].top_anchor == "real anchor"

    def test_tie_breaks_to_lexicographically_largest(self, spark):
        rows = [("u1", "alpha", "a.com"), ("u1", "beta", "a.com")]
        got = anchor_corpus(_links(spark, rows)).collect()[0]
        assert got.top_anchor == "beta"  # equal counts -> larger string

    def test_anchor_whitespace_trimmed_before_grouping(self, spark):
        rows = [("u1", "  spark  ", "a.com"), ("u1", "spark", "b.com")]
        got = anchor_corpus(_links(spark, rows)).collect()[0]
        assert got.n_anchors == 1
        assert got.top_anchor == "spark"

    def test_url_without_surviving_anchors_absent(self, spark):
        rows = [("u1", "here", "a.com")]
        assert anchor_corpus(_links(spark, rows)).count() == 0

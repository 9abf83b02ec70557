"""Site-section rollup (reader_spark.ops.sections)."""

from pyspark.sql import Row

from reader_spark.ops.sections import section_rollup


def _docs(spark, rows):
    """rows: (domain, path, quality)."""
    return spark.createDataFrame(
        [Row(domain=d, path=p, quality=float(q)) for d, p, q in rows]
    )


class TestSectionRollup:
    def test_prefix_explosion_and_means(self, spark):
        rows = [
            ("d1", "/blog/post1", 0.9),
            ("d1", "/blog/post2", 0.7),
            ("d1", "/tag/x", 0.1),
        ]
        got = {
            (r.domain, r.section): r
            for r in section_rollup(_docs(spark, rows)).collect()
        }
        assert got[("d1", "/blog")].n_docs == 2
        assert abs(got[("d1", "/blog")].mean_quality - 0.8) < 1e-9
        assert got[("d1", "/blog/post1")].n_docs == 1
        assert got[("d1", "/tag")].mean_quality == 0.1
        assert got[("d1", "/blog")].depth == 1
        assert got[("d1", "/blog/post1")].depth == 2

    def test_root_path(self, spark):
        got = section_rollup(_docs(spark, [("d1", "/", 0.5)])).collect()
        assert len(got) == 1
        assert got[0].section == "/"
        assert got[0].depth == 0

    def test_depth_cap(self, spark):
        rows = [("d1", "/a/b/c/d/e/f/g", 1.0)]
        got = section_rollup(_docs(spark, rows), max_depth=3).collect()
        assert {r.section for r in got} == {"/a", "/a/b", "/a/b/c"}

    def test_domains_isolated(self, spark):
        rows = [("d1", "/a", 1.0), ("d2", "/a", 0.0)]
        got = {
            (r.domain, r.section): r.mean_quality
            for r in section_rollup(_docs(spark, rows)).collect()
        }
        assert got[("d1", "/a")] == 1.0
        assert got[("d2", "/a")] == 0.0

    def test_trailing_slash_ignored(self, spark):
        got = section_rollup(_docs(spark, [("d1", "/a/", 0.5)])).collect()
        assert {r.section for r in got} == {"/a"}

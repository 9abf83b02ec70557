"""q-gram-blocked fuzzy string join (reader_spark.ops.fuzzy)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.fuzzy import fuzzy_string_pairs


def _df(spark, col, values):
    return spark.createDataFrame([Row(**{col: v}) for v in values])


def _brute(spark, left_vals, right_vals, k):
    l = _df(spark, "a", left_vals).distinct()
    r = _df(spark, "b", right_vals).distinct()
    return sorted(
        tuple(row)
        for row in l.crossJoin(r)
        .withColumn("dist", F.levenshtein("a", "b").cast("long"))
        .where(F.col("dist") <= k)
        .collect()
    )


class TestFuzzyStringPairs:
    def test_equals_brute_force(self, spark):
        left = ["srk1", "src2x", "zrc10", "totally-different", "ab", "x"]
        right = ["src1", "src2", "src10", "src19", "abc", "xy"]
        got = sorted(
            tuple(r)
            for r in fuzzy_string_pairs(
                _df(spark, "a", left), _df(spark, "b", right), "a", "b", 1, 2
            ).collect()
        )
        assert got == _brute(spark, left, right, 1)
        assert got  # non-vacuous

    def test_short_strings_covered(self, spark):
        # lengths below the pigeonhole bound (q*(k+1)=4) must still match
        left, right = ["a", "ab", "abc"], ["b", "abd", "ax"]
        got = sorted(
            tuple(r)
            for r in fuzzy_string_pairs(
                _df(spark, "a", left), _df(spark, "b", right), "a", "b", 1, 2
            ).collect()
        )
        assert got == _brute(spark, left, right, 1)
        assert ("a", "b", 1) in got  # gram-free pair found via SHORT block

    def test_distance_two(self, spark):
        left, right = ["kitten"], ["kitsen", "sitten", "sittin", "sitting"]
        got = {
            (r.a, r.b)
            for r in fuzzy_string_pairs(
                _df(spark, "a", left), _df(spark, "b", right), "a", "b", 2, 2
            ).collect()
        }
        assert got == {("kitten", "kitsen"), ("kitten", "sitten"),
                       ("kitten", "sittin")}

    def test_exact_match_mode(self, spark):
        left, right = ["abc", "abd"], ["abc"]
        got = [
            tuple(r)
            for r in fuzzy_string_pairs(
                _df(spark, "a", left), _df(spark, "b", right), "a", "b", 0, 2
            ).collect()
        ]
        assert got == [("abc", "abc", 0)]

    def test_validation(self, spark):
        df = _df(spark, "a", ["x"])
        with pytest.raises(ValueError, match="max_dist"):
            fuzzy_string_pairs(df, df, "a", "a", max_dist=-1)
        with pytest.raises(ValueError, match="q"):
            fuzzy_string_pairs(df, df, "a", "a", q=0)


class TestContentAliases:
    def test_mirror_detection(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import content_aliases

        df = spark.createDataFrame(
            [
                Row(url="https://a.com/x", host="a.com", text="same body"),
                Row(url="https://b.com/y", host="b.com", text="same body"),
                Row(url="https://a.com/x2", host="a.com", text="same body"),
                Row(url="https://c.com/z", host="c.com", text="unique body"),
            ]
        )
        got = content_aliases(df).collect()
        assert len(got) == 1  # the unique body never surfaces
        g = got[0]
        assert g.n_copies == 3
        assert g.n_urls == 3
        assert g.n_hosts == 2
        assert g.first_url == "https://a.com/x"

    def test_same_url_twice_not_an_alias(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import content_aliases

        # recrawl of the SAME url is not a mirror (n_urls stays 1)
        df = spark.createDataFrame(
            [
                Row(url="https://a.com/x", host="a.com", text="body"),
                Row(url="https://a.com/x", host="a.com", text="body"),
            ]
        )
        assert content_aliases(df).count() == 0

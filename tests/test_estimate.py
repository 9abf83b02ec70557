"""Capture-recapture coverage estimators (ops/estimate.py; Chao 1984,
Chapman 1951)."""

from reader_spark.ops.estimate import chao1_estimate, chapman_estimate


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_chao1_hand_computed(spark):
    # counts: a:1 b:1 c:2 d:3 -> D=4, f1=2, f2=1
    # est = 4 + 2*1/(2*(1+1)) = 4.5
    caps = _urls(spark, ["a", "b", "c", "c", "d", "d", "d"])
    r = chao1_estimate(caps).head()
    assert (r["n_captures"], r["n_observed"], r["f1"], r["f2"]) == (
        7,
        4,
        2,
        1,
    )
    assert r["est_richness"] == 4.5
    # Good-Turing: f1/N = 2/7 -> 285 milli (trunc)
    assert r["gt_unseen_milli"] == 285


def test_chao1_no_singletons_means_fully_seen(spark):
    caps = _urls(spark, ["a", "a", "b", "b", "b"])
    r = chao1_estimate(caps).head()
    assert r["f1"] == 0
    assert r["est_richness"] == float(r["n_observed"])
    assert r["gt_unseen_milli"] == 0


def test_chapman_hand_computed(spark):
    # A = {a,b,c,d}, B = {c,d,e}; m=2
    # est = (5*4*100)//3 - 100 = 666 -> 5.66... -> 5.66
    a = _urls(spark, ["a", "b", "c", "d"])
    b = _urls(spark, ["c", "d", "e"])
    r = chapman_estimate(a, b).head()
    assert (r["n_a"], r["n_b"], r["n_both"]) == (4, 3, 2)
    assert r["est_total"] == 5.66


def test_chapman_disjoint_samples_defined(spark):
    r = chapman_estimate(
        _urls(spark, ["a"]), _urls(spark, ["b"])
    ).head()
    assert r["n_both"] == 0
    assert r["est_total"] == 3.0  # (2*2*100)//1 - 100 = 300


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for k in ("crawl_coverage_chao1", "crawl_coverage_chapman"):
        assert k in q and k in o
    df = q["crawl_coverage_chao1"](spark, "/root/testdata/sf0.001")
    assert df.columns == [
        "n_captures",
        "n_observed",
        "f1",
        "f2",
        "est_richness",
        "gt_unseen_milli",
    ]


class TestDateMining:
    """Free-text date mining (ops/dates.py)."""

    def _profile(self, spark, texts):
        from reader_spark.ops.dates import date_mention_years

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return {
            r["doc_id"]: (r["n_dates"], r["min_year"], r["max_year"])
            for r in date_mention_years(df).collect()
        }

    def test_three_formats_and_validation(self, spark):
        got = self._profile(
            spark,
            [
                "released 2021-07-14 and again on March 4, 1999",
                "meeting 7/14/2021 ok",
                "bogus 9999-99-99 and 45/77/2020 and 2021-13-40",
                "version 1.2.3 build 20210714 nothing here",
                "edge February 29, 2021 still counts (range rule only)",
            ],
        )
        assert got[0] == (2, 1999, 2021)
        assert got[1] == (1, 2021, 2021)
        assert got[2] == (0, None, None)
        assert got[3] == (0, None, None)
        assert got[4] == (1, 2021, 2021)

    def test_corpus_recency_rollup(self, spark):
        from reader_spark.ops.dates import corpus_recency

        df = spark.createDataFrame(
            [
                (0, "a 2001-05-05 b 2001-06-06"),
                (1, "c 2001-07-07"),
                (2, "d 1999-01-01"),
            ],
            "doc_id bigint, text string",
        )
        got = {
            r["year"]: (r["n_mentions"], r["n_docs"])
            for r in corpus_recency(df).collect()
        }
        assert got == {2001: (3, 2), 1999: (1, 1)}

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        for k in ("text_date_profile", "corpus_recency"):
            assert k in entrymod.queries()
            assert k in entrymod.oracle_sql()

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

"""Interpolated Kneser-Ney bigram LM (ops/kneser.py, Kneser & Ney 1995,
Chen & Goodman 1999 eq. 4.27)."""

from pyspark.sql import Row

from reader_spark.ops.kneser import kneser_ney_by_source, kneser_ney_scores


def _score(spark, rows):
    df = spark.createDataFrame([Row(**r) for r in rows])
    return {r["doc_id"]: r for r in kneser_ney_scores(df).collect()}


def test_hand_computed_kn(spark):
    # "a b a b c": bigrams (a,b)x2 (b,a) (b,c); T=3 types
    # c(a.)=2 t1(a)=1; c(b.)=2 t1(b)=2; n2(a)=n2(b)=n2(c)=1
    # p(b|a) = (2-.75)/2 + (.75*1/2)*(1/3) = 0.75
    # p(a|b) = p(c|b) = (1-.75)/2 + (.75*2/2)*(1/3) = 0.375
    # nano terms: 415037499 (x2) + 1415037499 (x2) -> s=3660149996
    # (s + 2000) div 4000 = 915037 -> 0.915037 bits
    out = _score(spark, [{"doc_id": 1, "text": "a b a b c"}])
    assert out[1]["n_bigrams"] == 4
    assert out[1]["kn_nll_bits"] == 0.915037


def test_short_docs_stay_with_null_score(spark):
    out = _score(
        spark,
        [
            {"doc_id": 1, "text": "a b a b c"},
            {"doc_id": 2, "text": "hello"},
            {"doc_id": 3, "text": "x1 2"},  # one alphabetic token
            {"doc_id": 4, "text": ""},
        ],
    )
    assert len(out) == 4
    for i in (2, 3, 4):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["kn_nll_bits"] is None


def test_single_continuation_word_scores_certain(spark):
    # "q q q": bigrams (q,q)x2, T=1, t1=1, n2=1, c1=2
    # p = (2000-750)*1 + 750*1*1 over 2000 = 2000/2000 = 1 -> 0 bits
    out = _score(spark, [{"doc_id": 1, "text": "q q q"}])
    assert out[1]["n_bigrams"] == 2
    assert out[1]["kn_nll_bits"] == 0.0


def test_continuation_beats_raw_frequency(spark):
    # The KN property: "f" is FREQUENT but always follows "s" (one
    # context), "v" is rarer but follows three distinct contexts, so
    # v's continuation mass is higher and the backoff rewards (b, v)
    # over (b, f) even though c(f) > c(v).  Both target bigrams occur
    # once from the same LHS "b", so the discounted term is equal and
    # only the continuation distribution separates them.
    rows = [
        {"doc_id": 1, "text": "s f s f s f s f b f"},
        {"doc_id": 2, "text": "x v y v z v b v"},
    ]
    out = _score(spark, rows)
    # corpus bigrams: doc1: tokens s f s f s f s f b f ->
    # bigrams: (s,f)x4, (f,s)x3, (f,b), (b,f)
    # doc2: (x,v),(v,y),(y,v),(v,z),(z,v),(v,b),(b,v)
    # T = 11 distinct types
    # n2(f) = |{s,b}| = 2 ; n2(v) = |{x,y,z,b}| = 4
    # c(b.) = 2, t1(b) = 2
    def p(c12, c1, t1, n2, T, d=750):
        return ((1000 * c12 - d) * T + d * t1 * n2) / (1000 * c1 * T)

    p_bf = p(1, 2, 2, 2, 11)
    p_bv = p(1, 2, 2, 4, 11)
    assert p_bv > p_bf  # continuation count dominates
    # and the engine agrees with the closed form on doc-level sums
    assert out[1]["n_bigrams"] == 9
    assert out[2]["n_bigrams"] == 7


def test_by_source_rollup_exact_integer_mean(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="s1", text="a b a b c"),
            Row(doc_id=2, source="s1", text="hello"),
            Row(doc_id=3, source="s2", text="a b a b c a b"),
        ]
    )
    out = {r["source"]: r for r in kneser_ney_by_source(df).collect()}
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["n_scored"] == 1
    assert out["s1"]["n_bigrams"] == 4
    # single scored doc -> mean == its per-doc score
    per_doc = {
        r["doc_id"]: r for r in kneser_ney_scores(df).collect()
    }
    assert out["s1"]["mean_nll_bits"] == per_doc[1]["kn_nll_bits"]
    assert out["s2"]["n_scored"] == 1


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["kneser_ney_bigram"]
    df = q(spark, "/root/testdata/sf0.001")
    assert df.columns == ["doc_id", "n_bigrams", "kn_nll_bits"]
    o = entrymod.oracle_sql()
    assert "kneser_ney_bigram" in o and "kneser_ney_by_source" in o
    q2 = entrymod.queries()["kneser_ney_by_source"]
    df2 = q2(spark, "/root/testdata/sf0.001")
    assert df2.columns == [
        "source",
        "n_docs",
        "n_scored",
        "n_bigrams",
        "mean_nll_bits",
    ]

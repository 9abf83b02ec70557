"""RAKE keyword extraction (ops/keywords.py, Rose et al. 2010)."""

from pyspark.sql import Row

from reader_spark.ops.keywords import rake_keywords, rake_word_scores

STOPS = ("the", "of")


def _rake(spark, text, k=10):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return sorted(
        rake_keywords(df, k=k, stopwords=STOPS).collect(),
        key=lambda r: r["rank"],
    )


def test_hand_computed_scores(spark):
    # phrases: [red apple], [red apple tree]
    # freq: red 2, apple 2, tree 1; deg: red 2+3=5, apple 5, tree 3
    # word milli: red 2500, apple 2500, tree 3000
    rows = _rake(spark, "red apple of the red apple tree")
    assert [(r["rank"], r["phrase"], r["score_milli"], r["n_words"]) for r in rows] == [
        (1, "red apple tree", 8000, 3),
        (2, "red apple", 5000, 2),
    ]


def test_all_stopword_doc_emits_nothing(spark):
    assert _rake(spark, "the of the the") == []
    assert _rake(spark, "") == []


def test_duplicate_phrase_instances_collapse(spark):
    # two identical [red apple] instances: freq 2/2, deg 4/4, word
    # scores 2000 each, phrase 4000 — ONE output row
    rows = _rake(spark, "red apple of red apple")
    assert [(r["rank"], r["phrase"], r["score_milli"]) for r in rows] == [
        (1, "red apple", 4000)
    ]


def test_tie_breaks_on_phrase_string(spark):
    rows = _rake(spark, "beta of alpha")
    assert [(r["rank"], r["phrase"], r["score_milli"]) for r in rows] == [
        (1, "alpha", 1000),
        (2, "beta", 1000),
    ]


def test_k_limits_output(spark):
    rows = _rake(spark, "beta of alpha of gamma of delta", k=2)
    assert len(rows) == 2
    assert rows[0]["phrase"] == "alpha"


def test_word_scores_table(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="red apple of the red apple tree")]
    )
    rows = {
        r["tok"]: r
        for r in rake_word_scores(df, stopwords=STOPS).collect()
    }
    assert (rows["red"]["freq"], rows["red"]["deg"]) == (2, 5)
    assert rows["red"]["word_milli"] == 2500
    assert (rows["tree"]["freq"], rows["tree"]["deg"]) == (1, 3)
    assert rows["tree"]["word_milli"] == 3000


def test_registry_and_plan(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["rake_keywords"]
    df = q(spark, "/root/testdata/sf0.001")
    assert df.columns == ["doc_id", "rank", "phrase", "score_milli", "n_words"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    tree = plan.split("\n\n")[0]
    # every window/shuffle is doc-keyed — no single-partition exchange
    assert "SinglePartition" not in tree
    assert "rake_keywords" in entrymod.oracle_sql()

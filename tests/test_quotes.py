"""Quoted-span extraction (ops/quotes.py)."""

from pyspark.sql import Row

from reader_spark.ops.quotes import quote_profile, quote_spans

TEXT = (
    'He said "hello there" and she replied "fine by me". '
    'Stray "x". No verb here "just quoted".'
)


def test_spans_in_document_order(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=TEXT)])
    rows = sorted(quote_spans(df).collect(), key=lambda r: r["quote_no"])
    assert [(r["quote_no"], r["quote"], r["n_words"]) for r in rows] == [
        (0, "hello there", 2),
        (1, "fine by me", 3),
        (2, "x", 1),
        (3, "just quoted", 2),
    ]


def test_profile_counts_and_ratio(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=TEXT), Row(doc_id=2, text="no quotes at all")]
    )
    rows = {r["doc_id"]: r for r in quote_profile(df).collect()}
    r1 = rows[1]
    assert r1["n_quotes"] == 4
    # 'said' and 'replied' attribute two of the four
    assert r1["n_attributed"] == 2
    assert r1["quote_chars"] == 11 + 10 + 1 + 11
    assert r1["quote_milli"] == 33 * 1000 // len(TEXT)
    assert tuple(rows[2])[1:] == (0, 0, 0, 0)


def test_unclosed_and_multiline_quotes_ignored(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text='open "never closed... and "across\nlines" end')]
    )
    rows = quote_spans(df).collect()
    # the first " pairs with the one before 'across'; the newline span
    # is rejected, leaving exactly that one span
    assert [r["quote"] for r in rows] == ["never closed... and "]


def test_registry_and_plan(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in ("quote_profile", "quote_spans"):
        assert name in qs and name in oracles
    df = qs["quote_profile"](spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    # pure per-row expressions: no Exchange at all
    assert "Exchange" not in plan
    rows = df.collect()
    planted = [r for r in rows if r["doc_id"] % 3 == 0]
    assert all(r["n_quotes"] >= 1 and r["n_attributed"] >= 1 for r in planted)
    clean = [r for r in rows if r["doc_id"] % 3 and r["doc_id"] % 9]
    assert all(r["n_quotes"] == 0 for r in clean)

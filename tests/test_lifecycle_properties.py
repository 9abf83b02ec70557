"""Property-based tests (hypothesis) for the session-3 lifecycle ops:
SURT canonicalization invariants, unigram Viterbi vs the pure-Python
reference on random words, Hilbert bijectivity at random bit widths.

Each property batches ALL hypothesis examples into ONE Spark job —
per-example Spark roundtrips would make the suite minutes-slow."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

hosts = st.lists(
    st.sampled_from(["Example", "sub", "WWW", "a1", "x"]), min_size=1,
    max_size=3,
)
paths = st.lists(
    st.sampled_from(["A", "b", "c2", ""]), min_size=0, max_size=3
)
params = st.lists(
    st.sampled_from(["a=1", "B=2", "z=9", "k="]), min_size=0, max_size=4
)


@given(host=hosts, path=paths, q=params, https=st.booleans())
@settings(**_SETTINGS)
def test_surt_invariant_under_case_port_and_param_order(
    spark, host, path, q, https
):
    from reader_spark.ops.cdx import surt_key_col

    scheme = "https" if https else "http"
    default_port = "443" if https else "80"
    h = ".".join(host) + ".com"
    p = "/" + "/".join(path) if path else ""
    base = f"{scheme}://{h}{p}" + (f"?{'&'.join(q)}" if q else "")
    # same URL with: case noise, the DEFAULT port made explicit,
    # params reversed, and a fragment — all must map to one key
    variant = (
        f"{scheme}://{h.upper()}:{default_port}{p}"
        + (f"?{'&'.join(reversed(q))}" if q else "")
        + "#frag"
    )
    df = spark.createDataFrame([Row(u=base, v=variant)])
    r = df.select(
        surt_key_col(F.col("u")).alias("a"),
        surt_key_col(F.col("v")).alias("b"),
    ).collect()[0]
    assert r["a"] == r["b"]
    assert r["a"] is not None and ")" in r["a"]


@given(
    words=st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_unigram_viterbi_matches_reference_on_random_words(spark, words):
    from reader_spark.ops.unigram import DEFAULT_PIECES, unigram_encode_words

    from test_unigram import ref_viterbi

    df = spark.createDataFrame([Row(word=w) for w in words])
    got = {r["word"]: r for r in unigram_encode_words(df).collect()}
    for w in words:
        res = ref_viterbi(w, DEFAULT_PIECES)
        assert res is not None  # full char coverage: always segmentable
        score, toks = res
        assert got[w]["score_milli"] == score, w
        assert got[w]["pieces"] == " ".join(toks), w


@given(bits=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_hilbert_bijective_and_adjacent_any_width(spark, bits):
    from reader_spark.ops.hilbert import hilbert_d_expr

    n = 1 << bits
    rows = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .withColumn("d", hilbert_d_expr(F.col("x"), F.col("y"), bits))
        .collect()
    )
    by_d = {r["d"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1

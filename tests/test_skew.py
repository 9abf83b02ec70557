"""Salted skew-join: result equality with the plain join on a skewed
fixture, fact-preserving left semantics, dim replication, and the salt
actually reaching the join keys."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.skew import salted_join

pytestmark = pytest.mark.spark

N_SALT = 8


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key owns 90% of the fact rows — the shape salting exists for
    facts = spark.createDataFrame(
        [("hot.example", i, float(i)) for i in range(900)]
        + [(f"tail{i}.example", 900 + i, float(i)) for i in range(100)],
        "domain string, fact_id long, v double",
    )
    dim = spark.createDataFrame(
        [("hot.example", "A"), ("tail3.example", "B"), ("absent.example", "C")],
        "domain string, grade string",
    )
    return facts, dim


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_inner_equals_plain_join(skewed):
    facts, dim = skewed
    got = salted_join(facts, dim, on=["domain"], n_salt=N_SALT)
    want = facts.join(dim, ["domain"], "inner")
    assert rows(got) == rows(want)


def test_left_equals_plain_join(skewed):
    facts, dim = skewed
    got = salted_join(facts, dim, on=["domain"], n_salt=N_SALT, how="left")
    want = facts.join(dim, ["domain"], "left")
    assert rows(got) == rows(want)
    assert got.count() == 1000  # fact-preserving


def test_null_fact_keys_survive_left(spark, skewed):
    _, dim = skewed
    facts = spark.createDataFrame(
        [(None, 1, 1.0), ("hot.example", 2, 2.0)],
        "domain string, fact_id long, v double",
    )
    got = salted_join(facts, dim, on=["domain"], n_salt=N_SALT, how="left")
    by_id = {r["fact_id"]: r["grade"] for r in got.collect()}
    assert by_id == {1: None, 2: "A"}


def test_salt_reaches_join_and_never_leaks(skewed):
    from tests.test_plans import plan_of

    facts, dim = skewed
    out = salted_join(facts, dim, on=["domain"], n_salt=N_SALT)
    assert "__salt" not in out.columns
    plan = plan_of(out)
    assert "__salt" in plan  # join really runs on (domain, salt)


def test_fact_side_spreads_hot_key(skewed):
    """The hot key's fact rows must actually scatter across salts —
    otherwise the skew survives intact."""
    facts, dim = skewed
    from reader_spark.ops.skew import SALT_COL
    from pyspark.sql import functions as F

    salted = facts.withColumn(
        SALT_COL, F.pmod(F.xxhash64("domain", F.monotonically_increasing_id()), F.lit(N_SALT))
    )
    used = salted.where(F.col("domain") == "hot.example").select(SALT_COL).distinct().count()
    assert used == N_SALT


def test_bad_args_rejected(skewed):
    facts, dim = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dim, on=["domain"], n_salt=1)
    with pytest.raises(ValueError):
        salted_join(facts, dim, on=["domain"], how="full")

"""Bloom filter: zero false negatives (the load-bearing guarantee), real
false positives at tight sizing, union-merge == rebuild, size bound."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.bloom import bloom_build, bloom_member

pytestmark = pytest.mark.spark

K, M = 3, 256


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame([(f"url{i}",) for i in range(400)], "key string")


@pytest.mark.parametrize("portable", [False, True])
def test_no_false_negatives_some_false_positives(keys, portable):
    inserted = keys.where(F.col("key").rlike("url[0-9]?[02468]$"))  # evens-ish
    bloom = bloom_build(inserted, "key", K, M, portable=portable)
    got = {r["key"]: r["is_member"] for r in
           bloom_member(bloom, keys, "key", K, M, portable=portable).collect()}
    ins = {r["key"] for r in inserted.collect()}
    assert all(got[k] == 1 for k in ins)                   # NO false negatives
    fps = [k for k in got if got[k] == 1 and k not in ins]
    assert fps                                             # tight sizing -> real FPs
    assert len(fps) < len(got) - len(ins)                  # but not everything


def test_size_bounded_and_mergeable(keys):
    a = keys.where(F.col("key") < "url2")
    b = keys.where(F.col("key") >= "url2")
    merged = bloom_build(a, "key", K, M).unionByName(
        bloom_build(b, "key", K, M)
    ).distinct()
    rebuilt = bloom_build(keys, "key", K, M)
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in rebuilt.collect()
    )
    assert rebuilt.count() <= M


def test_empty_filter_rejects_everything(spark, keys):
    empty = bloom_build(keys.where("key = 'nope'"), "key", K, M)
    got = bloom_member(empty, keys, "key", K, M)
    assert got.where(F.col("is_member") == 1).count() == 0


def test_bad_args_rejected(keys):
    with pytest.raises(ValueError):
        bloom_build(keys, "key", k=0)
    with pytest.raises(ValueError):
        bloom_build(keys, "key", m=1)

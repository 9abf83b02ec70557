"""Homoglyph / confusable detection (ops/confusables.py, UTS #39)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.confusables import (
    homoglyph_profile,
    skeleton_col,
    spoof_pairs,
)


def test_skeleton_maps_confusables_to_latin(spark):
    df = spark.createDataFrame(
        [Row(s="рaypal"), Row(s="gооgle"), Row(s="PayPal"), Row(s="bank01")]
    )
    got = [
        r["k"]
        for r in df.select(skeleton_col(F.col("s")).alias("k"))
        .orderBy("k")
        .collect()
    ]
    # Cyrillic р/о fold to latin, case folds, 0->o / 1->l
    assert got == ["bankol", "google", "paypal", "paypal"]


def test_profile_counts_mixed_and_suspects(spark):
    df = spark.createDataFrame(
        # mixed+confusable, pure-Cyrillic (not mixed), clean latin,
        # digit-confusable latin (not mixed-script)
        [Row(doc_id=1, text="рaypal.com письмо bank bank0")]
    )
    r = homoglyph_profile(df).collect()[0]
    assert r["n_tokens"] == 4
    assert r["n_mixed_script"] == 1
    assert r["n_spoof_suspects"] == 1
    # script confusables in the full text (digits excluded by design):
    # р(1) + письмо's с and о (2) = 3; the '0' in bank0 is not counted
    assert r["n_confusable_chars"] == 3


def test_clean_doc_profiles_zero(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="plain ascii words")])
    r = homoglyph_profile(df).collect()[0]
    assert r["n_mixed_script"] == 0
    assert r["n_spoof_suspects"] == 0
    assert r["n_confusable_chars"] == 0


def test_spoof_pairs_collide_on_skeleton_only(spark):
    names = spark.createDataFrame(
        [
            Row(name="paypal.com"),
            Row(name="рaypal.com"),  # Cyrillic р spoof
            Row(name="paypa1.com"),  # digit spoof
            Row(name="example.org"),  # no twin
        ]
    )
    rows = spoof_pairs(names).collect()
    got = sorted((r["name_a"], r["name_b"]) for r in rows)
    # three raw names share the 'paypal.com' skeleton -> 3 pairs; the
    # ascii name sorts first against each spoof
    assert got == [
        ("paypa1.com", "paypal.com"),
        ("paypa1.com", "рaypal.com"),
        ("paypal.com", "рaypal.com"),
    ]


def test_registry_and_oracles(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in ("homoglyph_profile", "domain_spoof_pairs"):
        assert name in qs and name in oracles
    pairs = qs["domain_spoof_pairs"](spark, "/root/testdata/sf0.001").collect()
    # every source domain pairs with exactly its Cyrillic-s twin
    assert len(pairs) == 20
    assert all(r["name_a"].startswith("src") for r in pairs)

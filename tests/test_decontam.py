"""Benchmark decontamination: hashed production path == raw-shingle oracle
path, short-item fallback, clean-corpus zero case, and the broadcast plan
shape that keeps the corpus side shuffle-free."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.decontam import contamination_flags, normalize_for_ngrams

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def corpus(spark):
    eight = "alpha bravo charlie delta echo foxtrot golf hotel"
    return spark.createDataFrame(
        [
            (1, f"intro words then {eight} and a tail"),
            (2, f"{eight.upper()}!!! punctuated, but same tokens"),  # normalization hit
            (3, "completely unrelated text with no overlap at all here"),
            (4, "tiny"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [
            (100, "alpha bravo charlie delta echo foxtrot golf hotel"),
            (101, "short item"),  # < n tokens: full-sequence fallback
        ],
        "bench_id long, bench_text string",
    )


def test_flags_hashed_equals_raw(corpus, bench):
    hashed = contamination_flags(corpus, bench, n=8, hashed=True)
    raw = contamination_flags(corpus, bench, n=8, hashed=False)
    assert sorted(map(tuple, hashed.collect())) == sorted(map(tuple, raw.collect()))


def test_flags_normalization_and_misses(corpus, bench):
    got = {r["doc_id"]: r["n_bench_items"] for r in
           contamination_flags(corpus, bench, n=8).collect()}
    assert got.get(1) == 1   # verbatim 8-gram
    assert got.get(2) == 1   # case/punctuation folded away
    assert 3 not in got and 4 not in got and 5 not in got


def test_short_bench_item_matches_via_fallback(spark, bench):
    """A 2-token benchmark item still flags a doc when the doc contains it
    as a window — requires matching the doc's n=2 grams, i.e. the caller
    runs a second pass at the item length. At n=8 the 2-token fallback
    gram can only match 2-token docs; pin that conservative behavior."""
    docs = spark.createDataFrame(
        [(1, "short item"), (2, "a short item inside longer text padded out")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in contamination_flags(docs, bench, n=8).collect()}
    assert 1 in got       # exact-length doc matches the fallback gram
    assert 2 not in got   # longer doc windows at n=8 never equal a 2-gram


def test_clean_corpus_zero_rows(spark, bench):
    docs = spark.createDataFrame(
        [(1, "zero shared vocabulary whatsoever in this document body")],
        "doc_id long, text string",
    )
    assert contamination_flags(docs, bench, n=8).count() == 0


def test_normalize_for_ngrams(spark):
    df = spark.range(1).select(
        normalize_for_ngrams(F.lit("  Hello,\tWORLD!!  42\n")).alias("t")
    )
    assert df.collect()[0]["t"] == "hello world 42"


def test_plan_broadcasts_benchmark_side(corpus, bench):
    from tests.test_plans import plan_of

    plan = plan_of(contamination_flags(corpus, bench, n=8))
    assert "BroadcastHashJoin" in plan          # tiny side ships to executors
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # only the final agg keys


def test_bloom_prefilter_equals_exact(corpus, bench):
    from reader_spark.ops.decontam import contamination_flags_bloom

    for hashed in (True, False):
        exact = sorted(
            map(tuple, contamination_flags(corpus, bench, n=8, hashed=hashed).collect())
        )
        bloom = sorted(
            map(
                tuple,
                contamination_flags_bloom(
                    corpus, bench, n=8, hashed=hashed
                ).collect(),
            )
        )
        assert bloom == exact  # no false negatives, exact confirm strips FPs


def test_bloom_tiny_filter_still_lossless(corpus, bench):
    """m=16 bits saturates the filter — everything becomes a maybe-hit,
    phase 2 still returns exactly the exact answer (degenerate but
    correct)."""
    from reader_spark.ops.decontam import contamination_flags_bloom

    exact = sorted(
        map(tuple, contamination_flags(corpus, bench, n=8, hashed=True).collect())
    )
    got = sorted(
        map(
            tuple,
            contamination_flags_bloom(
                corpus, bench, n=8, hashed=True, k=2, m=16
            ).collect(),
        )
    )
    assert got == exact


class TestWeightedMinhash:
    """Weighted-Jaccard MinHash via capped duplication expansion
    (ops/dedup.weighted_minhash_md5 / weighted_jaccard_pairs)."""

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )

    def test_expansion_caps_multiplicity(self, spark):
        from reader_spark.ops.dedup import _weighted_elements

        df = self._docs(spark, ["spam " * 50 + "ham"])
        got = {
            r["tok"]: r["w"]
            for r in _weighted_elements(df, "doc_id", "text", 8).collect()
        }
        assert got == {"spam": 8, "ham": 1}

    def test_identical_docs_reach_wj_1000(self, spark):
        from reader_spark.ops.dedup import weighted_jaccard_pairs

        df = self._docs(spark, ["a a a b c d e f", "a a a b c d e f"])
        rows = weighted_jaccard_pairs(df).collect()
        assert [(r["doc_a"], r["doc_b"], r["wj_milli"]) for r in rows] == [
            (0, 1, 1000)
        ]

    def test_repetition_beyond_cap_is_equivalent(self, spark):
        from reader_spark.ops.dedup import weighted_jaccard_pairs

        # both docs exceed the cap on 'x': capped counts equal -> 1000
        df = self._docs(spark, ["x " * 20 + "y", "x " * 9 + "y"])
        rows = weighted_jaccard_pairs(df, cap=8).collect()
        assert rows and rows[0]["wj_milli"] == 1000

    def test_multiplicity_separates_what_set_jaccard_cannot(self, spark):
        from reader_spark.ops.dedup import (
            _weighted_elements,
            weighted_minhash_md5,
        )

        # same token SET, different multiplicities: weighted signatures
        # must differ (plain set-minhash would collide on every hash)
        df = self._docs(spark, ["x x x x y", "x y"])
        sigs = {r["doc"]: r["sig_md5"] for r in weighted_minhash_md5(df).collect()}
        assert sigs[0] != sigs[1]
        # and the exact capped weighted jaccard is 2/5
        counts = {
            (r["doc"], r["tok"]): r["w"]
            for r in _weighted_elements(df, "doc_id", "text", 8).collect()
        }
        toks = {"x", "y"}
        mn = sum(min(counts.get((0, t), 0), counts.get((1, t), 0)) for t in toks)
        mx = sum(max(counts.get((0, t), 0), counts.get((1, t), 0)) for t in toks)
        assert (mn * 1000) // mx == 400

    def test_bands_must_divide_hashes(self, spark):
        import pytest as _pytest

        from reader_spark.ops.dedup import weighted_jaccard_pairs

        with _pytest.raises(ValueError):
            weighted_jaccard_pairs(None, num_hashes=16, bands=5)

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        o = entrymod.oracle_sql()
        q = entrymod.queries()
        for k in ("weighted_minhash_md5", "weighted_jaccard_pairs"):
            assert k in o and k in q

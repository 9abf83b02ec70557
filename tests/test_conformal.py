"""Split-conformal quality threshold (ops/conformal.py; Vovk 2005,
Papadopoulos 2002)."""

import hashlib

import pytest

from reader_spark.ops.conformal import conformal_quality_threshold


def _is_cal(doc_id) -> bool:
    h = int(
        hashlib.md5(f"conf:{doc_id}".encode()).hexdigest()[:8], 16
    )
    return h % 2 == 0


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, score double, label int"
    )


def test_matches_pure_python_reference(spark):
    rows = [
        (i, round(0.05 + (i * 37 % 100) / 120.0, 6), 1 if i % 3 else 0)
        for i in range(200)
    ]
    got = conformal_quality_threshold(_frame(spark, rows)).head()

    cal_pos = sorted(
        (s, i) for i, s, l in rows if _is_cal(i) and l == 1
    )
    n = len(cal_pos)
    k = (100 * (n + 1)) // 1000
    thr = cal_pos[k - 1][0] if k >= 1 else 0.0
    ev = [(s, l) for i, s, l in rows if not _is_cal(i)]
    n_pos = sum(1 for _, l in ev if l == 1)
    n_neg = len(ev) - n_pos
    cov = sum(1 for s, l in ev if l == 1 and s >= thr)
    exc = sum(1 for s, l in ev if l == 0 and s < thr)
    assert got["n_cal_pos"] == n
    assert got["k"] == k
    assert got["threshold"] == thr
    assert (got["n_eval_pos"], got["n_eval_neg"]) == (n_pos, n_neg)
    assert got["coverage_milli"] == (cov * 1000) // n_pos
    assert got["exclusion_milli"] == (exc * 1000) // n_neg
    # the guarantee is MARGINAL over calibration draws; one fixed draw
    # can undershoot 1-alpha, but not collapse (grid ties included)
    assert got["coverage_milli"] >= 800


def test_tiny_calibration_keeps_everything(spark):
    # k = floor(0.1 * (n+1)) = 0 for n <= 9 -> threshold 0.0
    rows = [(i, 0.5, 1) for i in range(6)]
    got = conformal_quality_threshold(_frame(spark, rows)).head()
    assert got["k"] == 0
    assert got["threshold"] == 0.0
    if got["n_eval_pos"]:
        assert got["coverage_milli"] == 1000


def test_alpha_validated(spark):
    with pytest.raises(ValueError):
        conformal_quality_threshold(None, alpha_milli=0)
    with pytest.raises(ValueError):
        conformal_quality_threshold(None, alpha_milli=1000)


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["conformal_threshold"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.columns == [
        "n_cal_pos",
        "k",
        "threshold",
        "n_eval_pos",
        "n_eval_neg",
        "coverage_milli",
        "exclusion_milli",
    ]
    assert "conformal_threshold" in entrymod.oracle_sql()


class TestLuhnCardAudit:
    """Payment-card PII audit (ops/textstats.card_count_columns,
    ISO/IEC 7812 Luhn)."""

    def _audit(self, spark, texts):
        from reader_spark.ops.textstats import card_count_columns

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return {r["doc_id"]: r for r in card_count_columns(df).collect()}

    def test_valid_pans_validate_near_misses_do_not(self, spark):
        got = self._audit(
            spark,
            [
                "pay 4111 1111 1111 1111 now",        # valid Visa test PAN
                "pay 4111-1111-1111-1112 now",        # last digit off
                "amex 3782 822463 10005 here",        # valid 15-digit Amex
                "order 123456789012345 ref",          # random run
                "no digits at all",
            ],
        )
        assert (got[0]["n_card_candidates"], got[0]["n_cards_luhn_valid"]) == (1, 1)
        assert (got[1]["n_card_candidates"], got[1]["n_cards_luhn_valid"]) == (1, 0)
        assert (got[2]["n_card_candidates"], got[2]["n_cards_luhn_valid"]) == (1, 1)
        assert (got[3]["n_card_candidates"], got[3]["n_cards_luhn_valid"]) == (1, 0)
        assert (got[4]["n_card_candidates"], got[4]["n_cards_luhn_valid"]) == (0, 0)

    def test_length_gate_excludes_short_and_long_runs(self, spark):
        got = self._audit(
            spark,
            [
                "short 4111 1111 1111",               # 12 digits: too short
                "long 41111111111111111111 x",        # 20 digits: too long
            ],
        )
        assert got[0]["n_card_candidates"] == 0
        assert got[1]["n_card_candidates"] == 0

    def test_luhn_column_directly(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.textstats import luhn_valid_col

        df = spark.createDataFrame(
            [("4111111111111111",), ("4111111111111112",), ("",)],
            "s string",
        )
        got = [
            r["v"]
            for r in df.select(luhn_valid_col(F.col("s")).alias("v")).collect()
        ]
        assert got == [True, False, False]

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        assert "pii_card_audit" in entrymod.queries()
        assert "pii_card_audit" in entrymod.oracle_sql()


class TestLexiconProfile:
    """LIWC-style category profile (ops/textstats.
    lexicon_category_profile)."""

    def _run(self, spark, texts, lexicon=None):
        from reader_spark.ops.textstats import lexicon_category_profile

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        out = lexicon_category_profile(df, lexicon=lexicon).collect()
        return {(r["doc_id"], r["category"]): r for r in out}

    def test_hand_counts_and_milli_shares(self, spark):
        lex = {"neg": ("no", "not"), "pos": ("yes",)}
        got = self._run(spark, ["no not no yes", "plain words"], lex)
        r = got[(0, "neg")]
        assert (r["n_hits"], r["n_distinct"]) == (3, 2)
        assert r["share_milli"] == 750  # 3 of 4 tokens
        assert got[(0, "pos")]["n_hits"] == 1
        # every (doc, category) pair emitted, zeros included
        assert got[(1, "neg")]["n_hits"] == 0
        assert got[(1, "neg")]["share_milli"] == 0
        assert len(got) == 4

    def test_empty_doc_share_is_null(self, spark):
        lex = {"neg": ("no",)}
        got = self._run(spark, ["..."], lex)
        assert got[(0, "neg")]["n_hits"] == 0
        assert got[(0, "neg")]["share_milli"] is None

    def test_lexicon_validated(self, spark):
        import pytest as _pytest

        from reader_spark.ops.textstats import lexicon_category_profile

        with _pytest.raises(ValueError):
            lexicon_category_profile(None, lexicon={"x": ()})

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        assert "lexicon_profile" in entrymod.queries()
        assert "lexicon_profile" in entrymod.oracle_sql()

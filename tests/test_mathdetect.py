"""Math-content prefilter (ops/mathdetect.py): pattern counts, the
display-also-counts-as-inline contract, score weights/cap, the flag."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.mathdetect import (
    IS_MATH_CUT,
    MATH_WEIGHTS,
    SCORE_CAP,
    math_signals,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="plain prose with no notation at all"),
        Row(doc_id=2, text="inline $x+1$ and $y_2$ only"),
        Row(doc_id=3, text="display $$\\int_0^1 x dx$$ block"),
        Row(doc_id=4, text="\\frac{a}{b} and \\sum \\alpha commands"),
        Row(doc_id=5, text="symbols 1+2=3 < 4 > 0 ∑ ∫ √ π"),
        Row(doc_id=6, text="$a$ " * 50),  # cap test: 50 inline spans
        Row(doc_id=7, text=""),
    ]
    return spark.createDataFrame(rows)


def test_signal_counts(spark, docs):
    got = {r["doc_id"]: r for r in math_signals(docs).collect()}
    r1 = got[1]
    assert (r1["n_display"], r1["n_inline"], r1["n_tex_cmds"],
            r1["n_math_symbols"]) == (0, 0, 0, 0)
    assert r1["math_score_milli"] == 0 and not r1["is_math"]
    assert got[2]["n_inline"] == 2 and got[2]["n_display"] == 0
    # one display block also yields exactly one faux-inline match
    assert got[3]["n_display"] == 1 and got[3]["n_inline"] == 1
    assert got[4]["n_tex_cmds"] == 3
    # + = < > ∑ ∫ √ π
    assert got[5]["n_math_symbols"] == 8
    assert got[7]["math_score_milli"] == 0


def test_score_weights_and_cap(spark, docs):
    got = {r["doc_id"]: r for r in math_signals(docs).collect()}
    r2 = got[2]
    # 2 inline spans + the symbols inside them (+ and _)
    expected = (
        MATH_WEIGHTS["n_inline"] * 2
        + MATH_WEIGHTS["n_math_symbols"] * r2["n_math_symbols"]
    )
    assert r2["math_score_milli"] == min(SCORE_CAP, expected)
    # 50 inline spans blow past the cap
    assert got[6]["math_score_milli"] == SCORE_CAP
    assert got[6]["is_math"]


def test_flag_cut(spark, docs):
    got = {r["doc_id"]: r for r in math_signals(docs).collect()}
    for r in got.values():
        assert r["is_math"] == (r["math_score_milli"] >= IS_MATH_CUT)

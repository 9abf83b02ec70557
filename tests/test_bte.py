"""BTE (Finn et al. 2001) — the Kadane/prefix-sum form must equal the
paper's O(n^2) window search exactly, window composition included."""

import random

from pyspark.sql import functions as F

from reader_spark.ops.bte import bte_extract, bte_window


def _brute(seq):
    """All-windows BTE objective: max T(i,j) = tags_outside + words_in."""
    total_tags = sum(seq)
    best = None
    for i in range(len(seq)):
        for j in range(i, len(seq)):
            words = sum(1 - x for x in seq[i : j + 1])
            tags = sum(seq[i : j + 1])
            t = total_tags - tags + words
            if best is None or t > best[0]:
                best = (t, i, j)
    return best


def _token_df(spark, cases):
    rows = [
        (d, t, f"w{d}_{t}", x)
        for d, seq in enumerate(cases)
        for t, x in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, tok_no long, token string, is_tag int"
    )


def test_bte_matches_bruteforce(spark):
    rng = random.Random(7)
    cases = [
        [rng.randint(0, 1) for _ in range(rng.randint(1, 25))]
        for _ in range(40)
    ]
    cases += [[1, 1, 1], [0], [1], [0, 0, 0], [1, 0, 1, 0, 1]]
    out = {r["doc_id"]: r for r in bte_window(_token_df(spark, cases)).collect()}
    assert len(out) == len(cases)
    for d, seq in enumerate(cases):
        t, _, _ = _brute(seq)
        r = out[d]
        assert r["bte_score"] == t, (d, seq, r)
        i, j = r["start_tok"], r["end_tok"]
        assert 0 <= i <= j < len(seq)
        assert r["words_inside"] == sum(1 - x for x in seq[i : j + 1])
        assert r["tags_inside"] == sum(seq[i : j + 1])


def test_bte_all_tags_elects_single_least_bad_token(spark):
    out = bte_window(_token_df(spark, [[1, 1, 1]])).collect()[0]
    # every window scores total_tags - tags_in; a single tag is optimal,
    # smallest end index wins the tie -> token 0.
    assert (out["start_tok"], out["end_tok"]) == (0, 0)
    assert out["bte_score"] == 2  # 3 total tags - 1 inside + 0 words


def test_bte_extract_orders_words_and_drops_tags(spark):
    # words w0..w5 with tags at 0 and 3; body = the full word run.
    seq = [1, 0, 0, 1, 0, 0]
    out = bte_extract(_token_df(spark, [seq])).collect()[0]
    assert out["content"] == "w0_1 w0_2 w0_4 w0_5"
    assert out["n_words"] == 4


def test_bte_window_plan_no_cartesian(spark):
    tokens = _token_df(spark, [[0, 1, 0]])
    plan = tokens.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        bte_window(tokens)._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # single-pass contract: one doc_id exchange, stacked windows, NO joins
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_bte_score_column_types(spark):
    df = bte_window(_token_df(spark, [[0, 1]]))
    kinds = dict(df.dtypes)
    assert kinds == {
        "doc_id": "bigint",
        "start_tok": "bigint",
        "end_tok": "bigint",
        "words_inside": "bigint",
        "tags_inside": "bigint",
        "bte_score": "bigint",
    }


def test_bte_window_rejects_over_cap_token_index(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 0, "a", 0), (1, 1 << 20, "b", 0)],
        "doc_id long, tok_no long, token string, is_tag int",
    )
    with pytest.raises(Exception, match="packing cap"):
        bte_window(df).collect()


def test_bte_extract_emits_empty_row_for_all_tag_docs(spark):
    out = {r["doc_id"]: r for r in bte_extract(
        _token_df(spark, [[1, 1, 1], [0, 1]])
    ).collect()}
    assert out[0]["content"] == "" and out[0]["n_words"] == 0
    assert out[1]["content"] == "w1_0" and out[1]["n_words"] == 1

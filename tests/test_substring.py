"""Exact substring dedup (duplicate_spans): planted-duplicate recovery,
maximal-extent merging, same-doc repeats, short-doc exclusion, hashed ==
raw twin, and the no-all-pairs plan shape."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.substring import duplicate_spans, positional_windows

pytestmark = pytest.mark.spark

L = 5  # small window for hand-checkable fixtures


def words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    shared = words("dup", 9)  # 9-token passage shared by docs 1 and 2
    return spark.createDataFrame(
        [
            (1, f"{words('a', 4)} {shared} {words('b', 6)}"),
            (2, f"{words('c', 7)} {shared}"),
            (3, words("solo", 30)),                      # no duplicates
            (4, "short doc only four"),                  # < L tokens
            (5, f"{words('r', 3)} {shared[:24]} {words('m', 2)} {shared[:24]}"),
        ],
        "doc_id long, text string",
    )


def spans_of(df):
    return {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in df.collect()
    }


def test_planted_duplicate_recovered_maximally(planted):
    got = spans_of(duplicate_spans(planted, min_tokens=L))
    # doc 1: shared passage at tokens 5..13 (1-based, after 4 'a' tokens)
    assert got[1] == (5, 13, 9)
    # doc 2: shared passage at tokens 8..16
    assert got[2] == (8, 16, 9)
    assert 3 not in got and 4 not in got


def test_same_doc_repeat_detected(planted):
    """Doc 5 repeats a 5-token phrase internally — both occurrences are
    duplicated extents even with no other doc involved."""
    rows = duplicate_spans(planted, min_tokens=L).where(F.col("doc_id") == 5)
    assert rows.count() == 2


def test_hashed_equals_raw(planted):
    h = sorted(map(tuple, duplicate_spans(planted, min_tokens=L).collect()))
    r = sorted(map(tuple, duplicate_spans(planted, min_tokens=L, hashed=False).collect()))
    assert h == r


def test_adjacent_windows_merge_to_one_span(spark):
    """Two distinct repeated substrings that abut in one doc merge into a
    single maximal span (the union-of-extents contract)."""
    p1, p2 = words("x", 5), words("y", 5)
    docs = spark.createDataFrame(
        [
            (1, f"{p1} {p2}"),        # abutting copies
            (2, f"{words('f', 6)} {p1}"),
            (3, f"{p2} {words('g', 6)}"),
        ],
        "doc_id long, text string",
    )
    got = spans_of(duplicate_spans(docs, min_tokens=L))
    assert got[1] == (1, 10, 10)  # one merged span, not two


def test_positional_windows_short_doc_empty(spark):
    docs = spark.createDataFrame([(1, "only three tokens")], "doc_id long, text string")
    assert positional_windows(docs, "doc_id", "text", 5).count() == 0


def test_absurd_window_length_rejected(spark):
    """length scales the expression tree (one slice per window token); an
    unbounded value wedges codegen instead of erroring — fail fast."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        positional_windows(docs, "doc_id", "text", 100_000)
    with pytest.raises(ValueError):
        duplicate_spans(docs, min_tokens=1)


def test_window_positions_one_based_contiguous(spark):
    docs = spark.createDataFrame([(1, words("t", 7))], "doc_id long, text string")
    got = [r["pos"] for r in
           positional_windows(docs, "doc_id", "text", 5).orderBy("pos").collect()]
    assert got == [1, 2, 3]


def test_plan_no_all_pairs(planted):
    from tests.test_plans import plan_of

    plan = plan_of(duplicate_spans(planted, min_tokens=L))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # survivor filter is a semi join, never a pair join
    assert "LeftSemi" in plan

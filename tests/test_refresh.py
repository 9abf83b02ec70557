"""Crawl-budget refresh allocation (ops/refresh.py, Cho &
Garcia-Molina 2003)."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.refresh import (
    refresh_allocation,
    refresh_allocation_by_cutoff,
    refresh_gains,
)


def _pages(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, lam_milli=100),  # rarely changes
            Row(doc_id=2, lam_milli=900),  # churns
            Row(doc_id=3, lam_milli=0),  # never changes
        ]
    )


def test_first_access_gain_favors_stable_pages(spark):
    # gain_1 = 1e15 / (1000 + lam): the paper's headline — the stable
    # page's first access beats the churner's
    gains = {
        (r["doc_id"], r["k"]): r["gain_q"]
        for r in refresh_gains(_pages(spark)).collect()
    }
    assert gains[(1, 1)] == 10**15 // 1100 == 909090909090
    assert gains[(2, 1)] == 10**15 // 1900 == 526315789473
    assert gains[(1, 1)] > gains[(2, 1)]
    # zero-lambda page emits nothing
    assert not any(d == 3 for d, _ in gains)


def test_greedy_allocation_hand_computed(spark):
    # top-3 gains: p1k1 (909e9) > p2k1 (526e9) > p2k2 (163e9) > p1k2 (43e9)
    rows = {
        r["doc_id"]: r
        for r in refresh_allocation(_pages(spark), budget=3).collect()
    }
    assert rows[1]["f_slots"] == 1
    assert rows[2]["f_slots"] == 2
    assert 3 not in rows
    # freshness = 1e9*f div (1000f + lam)
    assert rows[1]["freshness_micro"] == 10**9 // 1100
    assert rows[2]["freshness_micro"] == 2 * 10**9 // 2900


def test_budget_exceeding_slots_funds_everything(spark):
    rows = {
        r["doc_id"]: r["f_slots"]
        for r in refresh_allocation(
            _pages(spark), budget=10_000, max_slots=4
        ).collect()
    }
    assert rows == {1: 4, 2: 4}


def test_cutoff_dual_matches_budget_form(spark):
    # a cutoff at the 3rd-largest gain reproduces the budget=3 greedy
    rows = {
        r["doc_id"]: r["f_slots"]
        for r in refresh_allocation_by_cutoff(
            _pages(spark), cutoff_q=163339382940
        ).collect()
    }
    assert rows == {1: 1, 2: 2}


def test_validation(spark):
    with pytest.raises(ValueError):
        refresh_allocation(_pages(spark), budget=0)
    with pytest.raises(ValueError):
        refresh_gains(_pages(spark), max_slots=0)


def test_registry_and_plan(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert "refresh_allocation" in qs
    assert "refresh_allocation" in entrymod.oracle_sql()
    df = qs["refresh_allocation"](spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    # the budget selection is a distributed partial top-K, not a
    # single-partition window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    rows = df.collect()
    assert rows
    assert sum(r["f_slots"] for r in rows) <= 600
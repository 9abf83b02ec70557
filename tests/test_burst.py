"""Kleinberg two-state burst detection (ops/burst.py, KDD 2002)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from reader_spark.ops.burst import kleinberg_bursts


def _series(spark, counts, background=6):
    """counts[h] events of key 'x' in hour h, plus a steady background
    key 'y' to pin the corpus totals."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append(
                Row(event_type="x", ts=base + dt.timedelta(hours=h, seconds=i))
            )
        for i in range(background):
            rows.append(
                Row(
                    event_type="y",
                    ts=base + dt.timedelta(hours=h, seconds=1000 + i),
                )
            )
    return spark.createDataFrame(rows)


def _x_flags(spark, counts, **kw):
    out = (
        kleinberg_bursts(_series(spark, counts), **kw)
        .where("key = 'x'")
        .orderBy("win")
        .collect()
    )
    return [r["burst"] for r in out]


def test_planted_burst_recovered_exactly(spark):
    counts = [1, 1, 1, 1, 1, 1, 8, 8, 8, 1, 1, 1]
    assert _x_flags(spark, counts) == [0] * 6 + [1] * 3 + [0] * 3


def test_high_gamma_suppresses_single_spike(spark):
    counts = [1, 1, 1, 1, 1, 6, 1, 1, 1, 1, 1, 1]
    # one spiky hour: with a steep entry cost the detector stays calm
    assert 1 not in _x_flags(spark, counts, gamma_milli=8000)


def test_uniform_series_never_bursts(spark):
    assert _x_flags(spark, [3] * 10) == [0] * 10


def test_flat_key_with_bursting_neighbour_stays_flat(spark):
    counts = [1, 1, 1, 9, 9, 1, 1, 1]
    out = (
        kleinberg_bursts(_series(spark, counts))
        .where("key = 'y'")
        .collect()
    )
    assert all(r["burst"] == 0 for r in out)


def test_zero_fill_covers_missing_windows(spark):
    # key 'x' absent from some hours entirely: the grid must still
    # carry those windows with r = 0
    counts = [2, 0, 0, 2, 0, 2]
    out = (
        kleinberg_bursts(_series(spark, counts))
        .where("key = 'x'")
        .orderBy("win")
        .collect()
    )
    assert len(out) == 6
    assert [r["r"] for r in out] == [2, 0, 0, 2, 0, 2]


def test_validation(spark):
    with pytest.raises(ValueError):
        kleinberg_bursts(None, s_milli=1000)
    with pytest.raises(ValueError):
        kleinberg_bursts(None, gamma_milli=0)


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["event_bursts"](spark, "/root/testdata/sf0.001")
    assert df.columns == ["key", "win", "r", "d", "burst"]
    assert "event_bursts" in entrymod.oracle_sql()

"""GreeDi facility-location selection (ops/submodular.py,
Mirzasoleiman et al. 2013 / Nemhauser greedy)."""

import pytest

from reader_spark.ops.submodular import facility_location_greedi


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )


def test_hand_computed_two_cluster_pick(spark):
    # four copies of e1, one e2: greedy must take an e1 copy first
    # (gain 4 * 10000 + 0) then the e2 vector (gain 10000).
    vecs = [[1.0, 0.0]] * 4 + [[0.0, 1.0]]
    out = facility_location_greedi(
        _emb(spark, vecs), k=2, buckets=1
    ).collect()
    assert [(r["rank"], r["gain_dm"]) for r in out] == [
        (1, 40000),
        (2, 10000),
    ]
    assert out[0]["vec_id"] in {0, 1, 2, 3}
    assert out[1]["vec_id"] == 4
    assert out[1]["objective"] == 5.0


def test_marginal_gains_never_increase(spark):
    vecs = [
        [float(i % 3), float((i * 7) % 5), float((i * 11) % 4)]
        for i in range(24)
    ]
    out = facility_location_greedi(
        _emb(spark, vecs), k=5, buckets=3
    ).collect()
    gains = [r["gain_dm"] for r in sorted(out, key=lambda r: r["rank"])]
    assert all(a >= b for a, b in zip(gains, gains[1:]))  # submodularity


def test_deterministic_across_runs(spark):
    vecs = [[float(i), float(24 - i), 1.0] for i in range(24)]
    df = _emb(spark, vecs)
    a = facility_location_greedi(df, k=3, buckets=2).collect()
    b = facility_location_greedi(df, k=3, buckets=2).collect()
    assert a == b


def test_k_larger_than_corpus_stops_clean(spark):
    out = facility_location_greedi(
        _emb(spark, [[1.0, 0.0], [0.0, 1.0]]), k=5, buckets=2
    ).collect()
    assert len(out) == 2  # ran dry without error


def test_validation():
    with pytest.raises(ValueError):
        facility_location_greedi(None, k=0)
    with pytest.raises(ValueError):
        facility_location_greedi(None, k=2, buckets=0)


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["facility_location"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.columns == ["rank", "vec_id", "gain_dm", "objective"]
    assert "facility_location" in entrymod.oracle_sql()

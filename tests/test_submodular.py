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


class TestEmbeddingOutliers:
    """k-NN-distance outliers (ops/outliers.py, Ramaswamy 2000)."""

    def _run(self, spark, vecs, k=2, planes=1):
        from reader_spark.ops.outliers import embedding_knn_outliers

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<double>",
        )
        return {
            r["vec_id"]: r
            for r in embedding_knn_outliers(
                df, k=k, dim=len(vecs[0]), planes=planes
            ).collect()
        }

    def test_isolated_point_scores_lowest(self, spark):
        # tight cluster + one far point (planes=1 -> at most 2 buckets;
        # make all projections land together by sign)
        vecs = [[1.0, 0.05], [1.0, 0.1], [1.0, 0.0], [0.9, 4.0]]
        got = self._run(spark, vecs, k=2, planes=1)
        in_cluster = [got[i]["kth_cos_dm"] for i in (0, 1, 2)]
        if got[3]["kth_cos_dm"] is not None:
            assert got[3]["kth_cos_dm"] < min(in_cluster)
        assert min(in_cluster) > 9900  # the cluster is tight

    def test_low_support_flag_and_singletons_surface(self, spark):
        from reader_spark.ops.outliers import embedding_knn_outliers

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [-1.0, -0.5])],
            "vec_id bigint, embedding array<double>",
        )
        got = {
            r["vec_id"]: r
            for r in embedding_knn_outliers(
                df, k=3, dim=2, planes=1
            ).collect()
        }
        assert len(got) == 3  # nobody dropped
        for r in got.values():
            assert r["low_support"]  # k=3 > any bucket population

    def test_k_validated(self, spark):
        import pytest as _pytest

        from reader_spark.ops.outliers import embedding_knn_outliers

        with _pytest.raises(ValueError):
            embedding_knn_outliers(None, k=0)

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        assert "embedding_outliers" in entrymod.queries()
        assert "embedding_outliers" in entrymod.oracle_sql()

"""Max-min fair allocation (reader_spark.ops.allocate)."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.allocate import max_min_fair_allocation


def _demands(spark, pairs):
    return spark.createDataFrame([Row(k=k, d=float(d)) for k, d in pairs])


class TestWaterFilling:
    def test_textbook_example(self, spark):
        # demands 2, 2.6, 4, 5 with budget 10 -> level 2.7:
        # 2 fully met; 2.6 fully met; 4 and 5 capped at 2.7
        dem = _demands(spark, [("a", 2), ("b", 2.6), ("c", 4), ("d", 5)])
        got = {r.k: r for r in max_min_fair_allocation(dem, "k", "d", 10.0).collect()}
        assert got["a"].alloc == 2.0 and got["a"].capped == 0
        assert got["b"].alloc == 2.6 and got["b"].capped == 0
        assert got["c"].alloc == pytest.approx(2.7) and got["c"].capped == 1
        assert got["d"].alloc == pytest.approx(2.7) and got["d"].capped == 1

    def test_budget_exactly_spent(self, spark):
        dem = _demands(spark, [("a", 3), ("b", 7), ("c", 11), ("d", 2)])
        rows = max_min_fair_allocation(dem, "k", "d", 13.0).collect()
        assert sum(r.alloc for r in rows) == pytest.approx(13.0, abs=1e-6)

    def test_surplus_budget_satisfies_everyone(self, spark):
        dem = _demands(spark, [("a", 1), ("b", 2)])
        rows = max_min_fair_allocation(dem, "k", "d", 100.0).collect()
        assert all(r.alloc == r.demand and r.capped == 0 for r in rows)

    def test_equal_demands_split_evenly(self, spark):
        dem = _demands(spark, [(f"k{i}", 10) for i in range(5)])
        rows = max_min_fair_allocation(dem, "k", "d", 25.0).collect()
        assert all(r.alloc == pytest.approx(5.0) for r in rows)

    def test_validation(self, spark):
        dem = _demands(spark, [("a", 1)])
        with pytest.raises(ValueError, match="budget"):
            max_min_fair_allocation(dem, "k", "d", 0.0)


class TestUnimax:
    def _sizes(self, spark, pairs):
        return spark.createDataFrame(
            [Row(lang=k, n=float(v)) for k, v in pairs]
        )

    def test_small_langs_hit_epoch_cap(self, spark):
        # sizes 10, 100 with budget 140 and cap 4: small lang gets 4
        # epochs (40), big lang gets the remaining 100 = 1 epoch.
        sizes = self._sizes(spark, [("lo", 10), ("hi", 100)])
        from reader_spark.ops.allocate import unimax_allocation

        got = {
            r.lang: r
            for r in unimax_allocation(sizes, "lang", "n", 140.0).collect()
        }
        assert got["lo"].alloc == 40.0 and got["lo"].epochs == 4.0
        assert got["lo"].budget_limited == 0
        assert got["hi"].alloc == 100.0 and got["hi"].epochs == 1.0
        assert got["hi"].budget_limited == 1

    def test_surplus_budget_gives_cap_everywhere(self, spark):
        sizes = self._sizes(spark, [("a", 5), ("b", 50)])
        from reader_spark.ops.allocate import unimax_allocation

        rows = unimax_allocation(sizes, "lang", "n", 1e6, max_epochs=2.0).collect()
        assert all(r.epochs == 2.0 and r.budget_limited == 0 for r in rows)

    def test_budget_conserved(self, spark):
        sizes = self._sizes(spark, [("a", 7), ("b", 13), ("c", 29)])
        from reader_spark.ops.allocate import unimax_allocation

        rows = unimax_allocation(sizes, "lang", "n", 60.0).collect()
        assert sum(r.alloc for r in rows) == pytest.approx(60.0, abs=1e-5)

    def test_validation(self, spark):
        sizes = self._sizes(spark, [("a", 1)])
        from reader_spark.ops.allocate import unimax_allocation

        with pytest.raises(ValueError, match="max_epochs"):
            unimax_allocation(sizes, "lang", "n", 10.0, max_epochs=0.0)


class TestDoremiReweight:
    """One-step DoReMi (ops/allocate.doremi_reweight): fixed-point exp
    accuracy, zero-excess clamp, z cap, and weight ordering."""

    def _run(self, spark, rows):
        from pyspark.sql import Row

        from reader_spark.ops.allocate import doremi_reweight

        df = spark.createDataFrame(
            [Row(domain=d, proxy_loss_milli=p, ref_loss_milli=r)
             for d, p, r in rows]
        )
        return {x["domain"]: x for x in doremi_reweight(df).collect()}

    def test_taylor_tracks_real_exp(self, spark):
        import math

        got = self._run(
            spark,
            [("a", 2600, 2600), ("b", 3100, 2600), ("c", 4600, 2600)],
        )
        for dom, z in (("a", 0.0), ("b", 0.5), ("c", 2.0)):
            approx = got[dom]["exp_micro"] / 1e6
            assert abs(approx - math.exp(z)) / math.exp(z) < 1e-3

    def test_zero_excess_clamps_and_cap(self, spark):
        got = self._run(
            spark,
            [("low", 1000, 2600), ("huge", 99000, 2600)],
        )
        assert got["low"]["excess_milli"] == 0
        assert got["low"]["exp_micro"] == 1_000_000
        assert got["huge"]["z_milli"] == 5000  # clamped
        assert got["huge"]["weight_milli"] > got["low"]["weight_milli"]

    def test_weights_sum_to_milli(self, spark):
        got = self._run(
            spark,
            [("a", 2600, 2600), ("b", 2900, 2600), ("c", 3600, 2600)],
        )
        s = sum(x["weight_milli"] for x in got.values())
        assert 997 <= s <= 1000  # floor rounding loses < 1 milli/domain

"""Streaming heavy hitters: bounded Misra-Gries state per group.

MG counters are arrival-order dependent, so unlike the KMV stream the
pinned invariants are the sketch GUARANTEES, not counter equality:
every true heavy hitter is present (completeness), its bounds contain
the true count, and certified rows are never false positives against
the exact batch answer.
"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _truth(spark, src):
    rows = (
        spark.read.parquet(src)
        .groupBy("grp", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    totals = {}
    counts = {}
    for r in rows:
        totals[r.grp] = totals.get(r.grp, 0) + r.cnt
        counts[(r.grp, r.value)] = r.cnt
    return counts, totals


def _run(spark, src, qname, k=9, max_files=None):
    from reader_spark.streaming.heavy_stream import heavy_hitters_stream

    reader = spark.readStream.schema("grp string, value string")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src)
    q = (
        heavy_hitters_stream(stream, "grp", "value", k=k)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {qname}").collect()


def _skewed_rows():
    # per group: 'hot' 40%, 'warm' 25%, long singleton tail
    rows = []
    for grp in ("a", "b"):
        rows += [(grp, "hot")] * 80 + [(grp, "warm")] * 50
        rows += [(grp, f"t{i}") for i in range(70)]
    return rows


class TestHeavyHittersStream:
    def test_guarantees_against_exact_batch(self, spark, tmp_path):
        src = str(tmp_path / "hh")
        spark.createDataFrame(
            _skewed_rows(), "grp string, value string"
        ).write.parquet(src)
        counts, totals = _truth(spark, src)
        got = _run(spark, src, "hh_one", k=9)
        assert got, "stream emitted nothing"
        by_key = {(r.grp, r.value): r for r in got}
        # phi = ceil(1e6/10)/1e6 = 0.1 exactly
        for (grp, value), cnt in counts.items():
            if cnt * 10 > totals[grp]:
                assert (grp, value) in by_key, (grp, value)
        for r in got:
            true = counts[(r.grp, r.value)]
            assert r.cnt_min <= true <= r.cnt_max, r
            assert r.n_seen == totals[r.grp]
            if r.certified:
                assert true * 10 > totals[r.grp], r

    def test_multi_batch_keeps_guarantees(self, spark, tmp_path):
        """Split the same rows into two files (two micro-batches): the
        counters may differ from the single-batch run, but completeness
        and bound containment must hold after the final batch."""
        src = str(tmp_path / "hh2")
        df = spark.createDataFrame(
            [(g, v, i) for i, (g, v) in enumerate(_skewed_rows())],
            "grp string, value string, i long",
        )
        # one file per half in the SAME dir; maxFilesPerTrigger=1 makes
        # availableNow process them as two micro-batches
        df.where(F.col("i") % 2 == 0).drop("i").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        df.where(F.col("i") % 2 != 0).drop("i").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        counts, totals = _truth(spark, src)
        got = _run(spark, src, "hh_two", k=9, max_files=1)
        final = {}
        for r in got:  # update mode re-emits per batch; keep max-n rows
            cur = final.get((r.grp, r.value))
            if cur is None or r.n_seen > cur.n_seen:
                final[(r.grp, r.value)] = r
        finished = {g for g, n in totals.items()}
        for (grp, value), cnt in counts.items():
            if cnt * 10 > totals[grp] and grp in finished:
                assert (grp, value) in final, (grp, value)
        for r in final.values():
            if r.n_seen == totals[r.grp]:  # only judge completed groups
                true = counts[(r.grp, r.value)]
                assert r.cnt_min <= true <= r.cnt_max, r

    def test_validation(self, spark, tmp_path):
        from reader_spark.streaming.heavy_stream import heavy_hitters_stream

        empty = tmp_path / "hh-empty"
        empty.mkdir()
        df = spark.readStream.schema("grp string, value string").parquet(
            str(empty)
        )
        with pytest.raises(ValueError, match="k must"):
            heavy_hitters_stream(df, "grp", "value", k=0)
        with pytest.raises(ValueError, match="guarantee"):
            heavy_hitters_stream(df, "grp", "value", k=5, phi=0.001)

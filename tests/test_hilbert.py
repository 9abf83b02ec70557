"""Hilbert clustering keys (ops/hilbert.py): curve properties and the
locality win over Z-order."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.hilbert import hilbert_d_expr, hilbert_key


def _grid(spark, bits):
    n = 1 << bits
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )


def test_bijective_and_adjacent_on_full_grid(spark):
    # 16x16 grid: d must be a bijection onto [0, 256) and every
    # consecutive pair of cells Manhattan-adjacent — the property that
    # makes Hilbert file boxes tighter than Morton's.
    bits = 4
    rows = (
        _grid(spark, bits)
        .withColumn("d", hilbert_d_expr(F.col("x"), F.col("y"), bits))
        .collect()
    )
    by_d = {r["d"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_known_first_quadrant_walk(spark):
    # canonical 2x2 curve: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3
    rows = (
        _grid(spark, 1)
        .withColumn("d", hilbert_d_expr(F.col("x"), F.col("y"), 1))
        .collect()
    )
    got = {(r["x"], r["y"]): r["d"] for r in rows}
    assert got == {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}


def test_hilbert_beats_zorder_locality(spark):
    # mean Manhattan jump between consecutive keys: Hilbert = 1.0 by
    # construction; Morton is strictly worse on the same grid.
    from reader_spark.ops.zorder import interleave_bits

    bits = 4
    rows = (
        _grid(spark, bits)
        .withColumn("d", hilbert_d_expr(F.col("x"), F.col("y"), bits))
        .withColumn("z", interleave_bits(F.col("x"), F.col("y"), bits))
        .collect()
    )

    def mean_jump(key):
        seq = sorted(rows, key=lambda r: r[key])
        return sum(
            abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
            for a, b in zip(seq, seq[1:])
        ) / (len(seq) - 1)

    assert mean_jump("d") == 1.0
    assert mean_jump("z") > 1.5


def test_hilbert_key_bucketing_and_range(spark):
    df = spark.createDataFrame(
        [Row(id=i, a=i * 7 % 101, b=i * 13 % 89) for i in range(200)]
    )
    out = hilbert_key(df, "a", "b", bits=5).collect()
    n = 1 << 5
    for r in out:
        assert 0 <= r["a_bucket"] < n and 0 <= r["b_bucket"] < n
        assert 0 <= r["h"] < n * n


def test_registry_query(spark):
    import __spark_entry__ as e

    df = e.queries()["hilbert_events"](spark, "/root/testdata/sf0.001")
    assert df.columns == ["event_id", "user_id_bucket", "ts_us_bucket", "h"]
    assert df.count() > 0

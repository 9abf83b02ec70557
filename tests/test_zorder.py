"""Z-order clustering keys (reader_spark.ops.zorder)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.zorder import interleave_bits, zorder_key


class TestInterleave:
    def test_known_bit_patterns(self, spark):
        df = spark.createDataFrame([Row(x=0b11, y=0b00), Row(x=0b00, y=0b11),
                                    Row(x=0b10, y=0b01)])
        got = [
            r.z
            for r in df.select(
                interleave_bits(F.col("x"), F.col("y"), 2).alias("z")
            ).collect()
        ]
        # x bits land on even positions, y bits on odd
        assert got == [0b0101, 0b1010, 0b0110]


class TestZorderKey:
    def _grid(self, spark, n=32):
        return spark.createDataFrame(
            [Row(rid=i * n + j, a=i, b=j) for i in range(n) for j in range(n)]
        )

    def test_buckets_cover_range_exactly(self, spark):
        out = zorder_key(self._grid(spark), "a", "b", bits=5)
        stats = out.agg(
            F.min("a_bucket"), F.max("a_bucket"), F.min("z"), F.max("z")
        ).head()
        assert stats[0] == 0 and stats[1] == 31
        assert stats[2] == 0 and stats[3] == (1 << 10) - 1

    def test_constant_column_buckets_to_zero(self, spark):
        df = spark.createDataFrame([Row(rid=i, a=7, b=i) for i in range(10)])
        out = zorder_key(df, "a", "b", bits=4)
        assert out.agg(F.max("a_bucket")).head()[0] == 0

    def test_locality_beats_single_column_sort(self, spark):
        """Chunk the sorted table into 32 equal files: under z-order the
        second dimension's per-chunk min/max span must be far tighter than
        under a sort on the first dimension alone (where every chunk spans
        the full b range) — that span IS the data-skipping win."""
        out = zorder_key(self._grid(spark), "a", "b", bits=5)

        def avg_b_span(order_col):
            from pyspark.sql import Window

            w = Window.orderBy(order_col, "rid")
            chunked = out.withColumn(
                "chunk", ((F.row_number().over(w) - 1) / 32).cast("long")
            )
            spans = chunked.groupBy("chunk").agg(
                (F.max("b") - F.min("b")).alias("span")
            )
            return spans.agg(F.avg("span")).head()[0]

        z_span = avg_b_span("z")
        a_span = avg_b_span("a")
        assert z_span < a_span / 2

    def test_validation(self, spark):
        df = self._grid(spark, n=4)
        with pytest.raises(ValueError, match="bits"):
            zorder_key(df, "a", "b", bits=0)

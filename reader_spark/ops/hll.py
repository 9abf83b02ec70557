"""HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) as
DataFrame algebra, oracle-checkable to the final estimate.

Why it is exactly reproducible across engines (the part that usually
makes sketches un-oracle-able):
  * registers are integers — max over per-key rho values, deterministic
    given the hash family (portable md5-head, same family as
    ops/sampling and ops/sketch);
  * rho uses floor(log2(w)) where w < 2^26 — log2 of an integer is exact
    at powers of two and floor() is stable between them, identically in
    Spark and DuckDB doubles;
  * the harmonic sum adds at most m terms 2^-rho, each an exact power of
    two spanning < 53 bits of mantissa — the sum is EXACTLY representable,
    so partial-aggregation order cannot change a single bit.

Shape at 100 TB: one groupBy (group_cols, bucket) max — keyspace bounded
by groups x m — then a per-group rollup of <= m register rows. Registers
merge across partitions/days by max, the property that makes HLL the
standard distributed distinct sketch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 32


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    b: int = 6,
) -> DataFrame:
    """(group_cols..., bucket, register) — max rho per bucket; buckets
    nobody hashed into are absent (register 0 implicitly; the estimator
    accounts for them). Merge two register sets by max on bucket."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    group_cols = list(group_cols)
    rem = HASH_BITS - b  # bits left after the bucket index

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    bucket = F.floor(h / F.lit(float(2**rem))).cast("long")
    w = F.pmod(h, F.lit(2**rem))
    rho = (
        F.when(w == 0, F.lit(rem + 1))
        .otherwise(F.lit(rem) - F.floor(F.log2(w.cast("double"))))
        .cast("long")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    b: int = 6,
) -> DataFrame:
    """(group_cols..., hll_est) — the HLL estimate with the standard
    small-range (linear counting) correction, rounded to 4 dp."""
    group_cols = list(group_cols)
    m = 2**b
    alpha = 0.7213 / (1.0 + 1.079 / m)

    per_group = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("present_sum"),
        F.count("*").alias("n_present"),
    )
    zeros = F.lit(m) - F.col("n_present")  # absent buckets: register 0
    harmonic = F.col("present_sum") + zeros.cast("double")  # 2^-0 each
    raw = F.lit(alpha * m * m) / harmonic
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(*group_cols, F.round(est, 4).alias("hll_est"))


def hll_merge(
    registers: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Merge register sets down to a coarser grouping by per-bucket max —
    THE property that makes HLL the distributed distinct sketch: per-
    partition / per-day / per-type sketches union losslessly, so the
    merged estimate is IDENTICAL to sketching the union directly (not
    merely close). group_cols=[] merges everything into one sketch.

    One map-side-combined groupBy over at most |groups| x m rows."""
    return registers.groupBy(*list(group_cols), "bucket").agg(
        F.max("register").alias("register")
    )

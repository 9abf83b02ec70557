"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

Sorting a table by a single column gives tight min/max file statistics
on that column only; interleaving the bits of TWO dimensions' bucket
numbers gives a key whose sort order keeps BOTH dimensions locally
clustered, so parquet/Iceberg min-max pruning works for predicates on
either column (the OPTIMIZE ZORDER primitive in Delta/Iceberg,
cf. Morton 1966; Bayer's UB-tree).

Everything here is EXACT integer arithmetic — min/max normalization
uses integer division (`div`), never a float — so the key is
bit-identical across engines and oracle-checkable, and the whole
computation is scan-local after one 1-row min/max aggregate joins in
(no global sort, no window, no single-reducer rank). Writing is then
`repartitionByRange(z).sortWithinPartitions(z)` — the only shuffle —
followed by a plain parquet/Iceberg write.

At 100 TB the min/max dim comes from table statistics instead of a
scan, and `bits` caps the bucket count (256 buckets/dim at bits=8)
independent of cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton interleave: bit b of x -> bit 2b, bit b of y -> bit 2b+1."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        z = z + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return z


def zorder_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    out_col: str = "z",
) -> DataFrame:
    """df plus (``{col_x}_bucket``, ``{col_y}_bucket``, ``out_col``):
    both dimensions min/max-bucketed to ``bits`` bits — bucket =
    (v - min) * 2^bits div (max - min + 1), pure integer `div` — and
    Morton-interleaved. Columns must be integral (cast timestamps to
    epoch first); normalization is value-uniform, the standard z-order
    form.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mm = df.agg(
        F.min(F.col(col_x).cast("long")).alias("__minx"),
        F.max(F.col(col_x).cast("long")).alias("__maxx"),
        F.min(F.col(col_y).cast("long")).alias("__miny"),
        F.max(F.col(col_y).cast("long")).alias("__maxy"),
    )
    scale = 1 << bits
    out = (
        df.crossJoin(F.broadcast(mm))
        .withColumn(
            "__sx", (F.col(col_x).cast("long") - F.col("__minx")) * F.lit(scale)
        )
        .withColumn("__spanx", F.col("__maxx") - F.col("__minx") + F.lit(1))
        .withColumn(
            "__sy", (F.col(col_y).cast("long") - F.col("__miny")) * F.lit(scale)
        )
        .withColumn("__spany", F.col("__maxy") - F.col("__miny") + F.lit(1))
        .withColumn(f"{col_x}_bucket", F.expr("__sx div __spanx"))
        .withColumn(f"{col_y}_bucket", F.expr("__sy div __spany"))
        .withColumn(
            out_col,
            interleave_bits(
                F.col(f"{col_x}_bucket"), F.col(f"{col_y}_bucket"), bits
            ),
        )
    )
    return out.drop(
        "__minx", "__maxx", "__miny", "__maxy", "__sx", "__spanx", "__sy", "__spany"
    )

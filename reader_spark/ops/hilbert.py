"""Hilbert-curve clustering keys: the better-locality sibling of
Z-order (ops/zorder.py).

Morton interleaving is cheap but jumps: consecutive keys can be far
apart in (x, y), so a range of files along the sort order still spans
loose min/max boxes. The Hilbert curve (Hilbert 1891; the iterative
xy→d form popularized by Warren's Hacker's Delight) visits every cell
of the 2^bits × 2^bits grid with EVERY consecutive pair adjacent
(Manhattan distance exactly 1 — pinned by test), which is why Delta's
OPTIMIZE and Iceberg's rewrite strategies offer it above Z-order:
tighter file boxes → more min/max pruning per predicate.

Same determinism contract as zorder.py: min/max bucket normalization
with integer `div`, the curve walk in exact integer arithmetic — the
Spark side is a within-row fold over the bit levels (linear expression
size; the naive unrolled form doubles the tree per level), the DuckDB
twin the same walk as a recursive CTE. Key computation is scan-local
after the 1-row min/max dim joins in; writing is
repartitionByRange(h) + sortWithinPartitions(h), ONE shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hilbert_d_expr(x: Column, y: Column, bits: int) -> Column:
    """(x, y) on the 2^bits grid -> distance along the Hilbert curve.
    Iterative top-down walk: at each level s = 2^lvl, pick the quadrant
    (rx, ry), advance d by s²·(3rx XOR ry), and rotate/reflect the
    frame. Fold over levels so the expression stays linear in bits."""
    svals = F.array(*[F.lit(1 << lvl) for lvl in range(bits - 1, -1, -1)])
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc: Column, s: Column) -> Column:
        ax, ay, ad = acc["x"], acc["y"], acc["d"]
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        d2 = ad + (s * s).cast("long") * (rx * 3).bitwiseXOR(ry).cast("long")
        nx = F.when(
            ry == 0, F.when(rx == 1, s - 1 - ay).otherwise(ay)
        ).otherwise(ax)
        ny = F.when(
            ry == 0, F.when(rx == 1, s - 1 - ax).otherwise(ax)
        ).otherwise(ay)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(svals, init, step)["d"]


def hilbert_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    out_col: str = "h",
) -> DataFrame:
    """df plus (``{col_x}_bucket``, ``{col_y}_bucket``, ``out_col``):
    both dimensions min/max-bucketed to ``bits`` bits (integer `div`,
    same normalization as zorder_key — the keys are comparable) and
    mapped to the Hilbert distance."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mm = df.agg(
        F.min(F.col(col_x).cast("long")).alias("__minx"),
        F.max(F.col(col_x).cast("long")).alias("__maxx"),
        F.min(F.col(col_y).cast("long")).alias("__miny"),
        F.max(F.col(col_y).cast("long")).alias("__maxy"),
    )
    scale = 1 << bits
    xb = F.expr(
        f"(CAST({col_x} AS BIGINT) - __minx) * {scale}"
        f" DIV (__maxx - __minx + 1)"
    )
    yb = F.expr(
        f"(CAST({col_y} AS BIGINT) - __miny) * {scale}"
        f" DIV (__maxy - __miny + 1)"
    )
    out = (
        df.crossJoin(F.broadcast(mm))  # 1-row min/max dim
        .withColumn(f"{col_x}_bucket", xb)
        .withColumn(f"{col_y}_bucket", yb)
    )
    return out.withColumn(
        out_col,
        hilbert_d_expr(
            F.col(f"{col_x}_bucket"), F.col(f"{col_y}_bucket"), bits
        ),
    ).drop("__minx", "__maxx", "__miny", "__maxy")


def hilbert_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    num_files: int = 32,
) -> DataFrame:
    """Cluster for writing: range-partition on the Hilbert key and sort
    within partitions — ONE shuffle, then a plain parquet/Iceberg
    write gives each file a tight (x, y) box."""
    keyed = hilbert_key(df, col_x, col_y, bits)
    return keyed.repartitionByRange(num_files, "h").sortWithinPartitions("h")

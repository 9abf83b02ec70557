"""Temporal join operators Spark lacks as primitives: as-of join and
point-in-interval range join.

Both are expressed as compositions of built-in DataFrame ops (no UDFs),
chosen for their 100 TB shuffle shape:

  * as-of join — the naive formulation is a non-equi theta join
    (r.t <= l.t), which Spark can only execute as BroadcastNestedLoop or a
    cartesian product: O(|L|·|R|) per key at worst. The UNION + WINDOW
    form here shuffles each row exactly once on the join key, sorts within
    partitions, and resolves every match with a running `last(..., ignore
    nulls)` — the same merge-scan an ASOF-aware engine (kdb+, QuestDB,
    DuckDB ASOF JOIN) performs, with cost O((|L|+|R|) log) per key and no
    row blowup. This is the standard scalable Spark as-of pattern (cf.
    Databricks `tempo`).

  * range join — points-in-intervals via time bucketing: intervals are
    exploded onto the fixed-width buckets they cover, points map to one
    bucket, and the match becomes an equi-join on (key, bucket) plus an
    exact containment filter. With bucket width >= typical interval
    length each interval lands on <= 2 buckets, so the shuffle is
    O(|points| + 2·|intervals|) — never the O(|P|·|I|) nested loop Spark
    falls back to for raw non-equi predicates. (Same technique as
    Databricks' range-join bin hints.)

Reference parity: the reference engine has no temporal joins — these
extend the graft for training-data pipelines (event attribution, feature
as-of lookups) per the build brief.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach `value_cols` from the single right row
    with the greatest right_time <= left_time (direction='backward', the
    default) or the smallest right_time >= left_time ('forward'), matching
    on `on` keys. Rows with no qualifying right row keep NULL values
    (left-outer semantics). Ties on right_time are broken by the greatest
    (backward) / smallest (forward) `tiebreak` value, which callers must
    supply when right_time is not unique per key — determinism is a
    contract here, not a best effort.

    With `tolerance_seconds`, a backward match older than the tolerance
    (or a forward match further ahead than it) is discarded (NULLs).

    Output: all left columns plus value_cols (right's names, prefixed
    `matched_`) and `matched_time` (the matched right_time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not value_cols:
        raise ValueError("value_cols must name at least one right column")
    on = list(on)

    # Pack the right row's payload into ONE struct so every output column
    # comes from the SAME matched row (per-column last() could mix rows
    # when some right values are NULL).
    payload = F.struct(
        F.col(right_time).cast("timestamp").alias("__mt"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_time).cast("timestamp").alias("__t"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        F.lit(1).alias("__is_right"),
        payload.alias("__payload"),
    )
    l = left.select(
        *left.columns,
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # At equal __t the right row must sort BEFORE the left row so an
        # exactly-simultaneous observation matches (inclusive <=); among
        # tied right rows the LAST in tiebreak order (max) wins via last().
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_right").desc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__payload", ignorenulls=True).over(w)
    else:
        # Forward: right rows sort AFTER left at equal __t (inclusive >=);
        # the earliest, min-tiebreak match wins. Evaluated as a REVERSED
        # running frame — a (currentRow, unboundedFollowing) frame
        # re-scans the partition tail per row (O(n²)); last() over the
        # fully-reversed sort with a running frame is the same row at
        # O(n) (the total order is just flipped, so "first at-or-after
        # in ASC" == "last at-or-before in DESC").
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").desc(), F.col("__is_right").desc(), F.col("__tb").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__payload", ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).where(F.col("__is_right") == 0)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__t").cast("double") - F.col("__m.__mt").cast("double")
        )
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__m"))
        )

    keep = [F.col(c) for c in left.columns]
    keep.append(F.col("__m.__mt").alias("matched_time"))
    keep.extend(F.col(f"__m.{c}").alias(f"matched_{c}") for c in value_cols)
    return out.select(*keep)


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_time: str,
    interval_start: str,
    interval_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them:
    same `on` keys and interval_start <= point_time < interval_end.

    `bucket_seconds` should be >= the typical interval length so each
    interval explodes onto ~2 buckets (it is exploded onto every bucket it
    touches, so a pathological interval 100x the bucket width costs 100
    rows — size the bucket to the data, or cap interval length upstream).

    Column collisions between the two inputs are the caller's problem —
    select/alias before calling, as with any join.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    on = list(on)
    b = F.lit(int(bucket_seconds))

    def epoch(col: str) -> Column:
        # TIMESTAMP_NTZ won't cast to double directly; via "timestamp"
        # (session-LTZ, pinned UTC in get_spark) the mapping is exact
        # epoch seconds and monotonic.
        return F.col(col).cast("timestamp").cast("double")

    p = points.withColumn("__bucket", F.floor(epoch(point_time) / b))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(epoch(interval_start) / b),
                # end is exclusive: a point at exactly interval_end does not
                # match, but the end bucket itself must still be probed.
                F.floor(epoch(interval_end) / b),
            )
        ),
    )
    joined = p.join(i, on=on + ["__bucket"], how="inner").where(
        (F.col(point_time) >= F.col(interval_start))
        & (F.col(point_time) < F.col(interval_end))
    )
    # A point and interval share at most one bucket (the point's), so the
    # equi-join cannot duplicate a (point, interval) pair — no distinct
    # needed, which matters: distinct would be a second full shuffle.
    return joined.drop("__bucket")

"""Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
DataFrame-native frequency sketch.

Why a sketch at 100 TB: exact per-key counts of a high-cardinality column
shuffle one row per distinct key; a CMS shuffles into a FIXED depth x
width cell table (here 4 x 2^k cells) regardless of key cardinality, is
mergeable across partitions/days by cell-wise addition, and answers point
queries with the classic one-sided guarantee: estimate >= true count,
overcount <= e/width * total_rows with probability 1 - (1/2)^depth.

Everything is deterministic given the hash family, so the whole pipeline
(build -> point query -> error) is oracle-checkable in ANSI SQL:
`portable=True` uses the md5-hex-head hash (byte-identical in DuckDB),
production uses xxhash64 — same discipline as ops/sampling.

Build shape: one narrow projection computes all `depth` cell indices per
row, stack() unpivots to (d, w) pairs, ONE map-side-combined groupBy over
a keyspace bounded by depth*width. No per-key state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cell(key: Column, d: int, width: int, portable: bool) -> Column:
    salted = F.concat_ws("|", F.lit(str(d)), key.cast("string"))
    if portable:
        h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(salted)
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Sketch of key frequencies: (d, w, cnt) rows, at most depth*width of
    them. Merge two sketches by unioning and summing cnt on (d, w)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    key = F.col(key_col)
    cells = df.select(
        *[_cell(key, d, width, portable).alias(f"w{d}") for d in range(depth)]
    )
    stack = ", ".join(f"CAST({d} AS INT), w{d}" for d in range(depth))
    return (
        cells.selectExpr(f"stack({depth}, {stack}) AS (d, w)")
        .groupBy("d", "w")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Point-query the sketch for each row of `keys`: (key_col, est).

    est = min over d of the key's cell count (absent cell = 0). The
    sketch side is depth*width rows at most — broadcast, so querying any
    number of keys is shuffle-free on the keys side except the final
    per-key min (map-side combined, keys-bounded)."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        *[_cell(key, d, width, portable).alias(f"w{d}") for d in range(depth)],
    )
    stack = ", ".join(f"CAST({d} AS INT), w{d}" for d in range(depth))
    long = probes.selectExpr(key_col, f"stack({depth}, {stack}) AS (d, w)")
    return (
        long.join(F.broadcast(sketch), ["d", "w"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """Join-cardinality estimate from two CMS sketches (AGMS-family inner
    product; Cormode & Muthukrishnan 2005, section on inner-product
    queries): |A JOIN B on k| = sum_k f_A(k) * f_B(k), estimated as
    min over depth rows d of  sum_w cmsA[d][w] * cmsB[d][w].

    One-sided like CMS point queries (colliding keys only ADD mass), so
    est >= truth always. The entire estimate reads two depth*width-row
    sketches — the sketches can be persisted per table/partition and the
    estimate computed at PLANNING time without touching either fact table;
    this is how a query planner sizes a join before running it.
    """
    a = sketch_a.select("d", "w", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("d", "w", F.col("cnt").alias("cnt_b"))
    return (
        a.join(b, ["d", "w"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_join_size"))
    )


def kmv_bottom_k(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 32,
) -> DataFrame:
    """Bottom-k (KMV) sketch per group: the k smallest normalized hashes
    of the group's distinct keys — Bar-Yossef et al. 2002's k-minimum-
    values distinct-count sketch, and simultaneously a deterministic
    uniform SAMPLE of the group's key space (the same bottom-k set merges
    across partitions/batches by just keeping the k smallest again).

    Returns (group, pos, u) with pos = 1..k and u in (0, 1]. The shuffle
    carries only per-group candidate minima (the per-partition combine
    keeps k rows each side).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = F.round((h + F.lit(1.0)) / F.lit(4294967296.0), 9)
    w = Window.partitionBy("grp").orderBy("u")
    return (
        df.select(F.col(group_col).alias("grp"), u.alias("u"))
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(F.col("grp").alias(group_col), "pos", "u")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate from the KMV sketch:
    est = (k - 1) / u_(k) when the group has >= k distinct keys, else the
    exact count (the sketch holds every key). Returns
    (group, n_sketch, est_distinct, true form left to the caller)."""
    sk = kmv_bottom_k(df, group_col, key_col, k)
    return (
        sk.groupBy(group_col)
        .agg(
            F.max("pos").alias("n_sketch"),
            F.max(F.when(F.col("pos") == k, F.col("u"))).alias("uk"),
        )
        .select(
            group_col,
            "n_sketch",
            F.when(
                F.col("n_sketch") < k, F.col("n_sketch").cast("double")
            )
            .otherwise(F.round((k - 1) / F.col("uk"), 6))
            .alias("est_distinct"),
        )
    )


def kmv_jaccard_pairs(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard estimates between groups' key sets from bottom-k
    sketches alone (Broder 1997's single-permutation estimator):
    est(A, B) = |bottomk(A u B) ^ A ^ B| / |bottomk(A u B)|.

    The membership subtlety that makes this exact over the sketches: any
    y in bottomk(A u B) that belongs to A is necessarily within A's own
    bottom-k (y ranks <= k in the union, so <= k in A), so the two
    per-group sketches fully determine intersection membership for every
    union-sketch element. Pair work reads only groups x k rows — the fact
    table is touched once to build the sketches.
    """
    sk = kmv_bottom_k(df, group_col, key_col, k).select(
        F.col(group_col).alias("g"), "u"
    )
    ga = sk.select(F.col("g").alias("ga"), "u").withColumn("in_a", F.lit(1))
    gb = sk.select(F.col("g").alias("gb"), "u").withColumn("in_b", F.lit(1))
    pairs = (
        ga.select("ga").distinct()
        .join(gb.select("gb").distinct(), F.col("ga") < F.col("gb"))
    )
    left = pairs.join(ga, "ga")
    right = pairs.join(gb, "gb")
    merged = (
        left.select("ga", "gb", "u", "in_a")
        .unionByName(
            right.select("ga", "gb", "u").withColumn("in_a", F.lit(None).cast("int")),
            allowMissingColumns=False,
        )
        .groupBy("ga", "gb", "u")
        .agg(F.max(F.coalesce(F.col("in_a"), F.lit(0))).alias("in_a"))
    )
    in_b = right.select("ga", "gb", "u").withColumn("in_b", F.lit(1)).distinct()
    both = merged.join(in_b, ["ga", "gb", "u"], "left").select(
        "ga",
        "gb",
        "u",
        "in_a",
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    w = Window.partitionBy("ga", "gb").orderBy("u")
    topu = both.withColumn("pos", F.row_number().over(w)).where(F.col("pos") <= k)
    return (
        topu.groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).alias("union_k"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.col("union_k").cast("long").alias("union_k"),
            F.round(F.col("n_both") / F.col("union_k"), 6).alias("jaccard_est"),
        )
    )

"""Deterministic dataset splitting & sampling for training pipelines.

A 10^12-doc corpus can't be split with randomSplit (nondeterministic across
retries/partitions); splits must be a PURE FUNCTION of a stable key so every
re-run, backfill, and incremental batch lands each document in the same
split. Standard technique: hash the key to a uniform bucket, carve buckets
by cumulative fraction (cf. ML dataset-versioning practice).

Two hash families, same carve:
  * xxhash64 (production: fastest, 64-bit)
  * md5-hex head (portable: byte-identical in ANSI SQL -> oracle-checkable)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUCKETS = 10_000


def _bucket(key: Column, portable: bool) -> Column:
    if portable:
        # first 8 hex chars of md5 -> int; same expression exists in DuckDB
        # as ('0x' || substr(md5(key), 1, 8))::BIGINT
        h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(key.cast("string"))
    # pmod, not abs+%: abs(Long.MIN_VALUE) overflows negative in Java, which
    # would put that key in a negative "bucket" silently mapped to split 1
    return F.pmod(h, F.lit(BUCKETS))


def split_column(
    key: Column,
    fractions: dict[str, float],
    portable: bool = False,
) -> Column:
    """Label column assigning each key to a named split by hash bucket.

    fractions: ordered {name: fraction}; must sum to <= 1.0 (remainder, if
    any, labeled 'rest'). Assignment is stable under re-runs, repartitions,
    and corpus growth (a doc's split never changes when other docs arrive).
    """
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = _bucket(key, portable)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        bound = int(round(cum * BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit("rest"))


def stratified_sample_flag(
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    portable: bool = False,
) -> Column:
    """Deterministic per-stratum sampling flag: keep a row iff its hash
    bucket falls under its stratum's rate (e.g. downsample dominant
    languages, keep 100% of rare ones — the standard corpus-rebalancing
    step). Pure function of (key, stratum): stable under re-runs, retries,
    partitioning, and corpus growth, unlike df.sample(). No shuffle — a
    scan-local filter at any scale.
    """
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} is {rate}, outside [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate {default_rate} outside [0, 1]")
    bucket = _bucket(key, portable)
    bound = F.lit(int(round(default_rate * BUCKETS)))
    for name, rate in sorted(rates.items()):
        bound = F.when(stratum == name, int(round(rate * BUCKETS))).otherwise(bound)
    return bucket < bound


def temperature_mix_sample(
    df,
    key: Column,
    group_cols: list[str],
    alpha: float = 0.5,
    target_total: int = 1000,
    portable: bool = False,
):
    """Temperature-based corpus mixing: sample each group (language,
    domain, source) at a rate proportional to count^alpha instead of
    count, flattening the head (alpha < 1 upsamples rare groups
    relative to dominant ones — the standard re-weighting for training
    mixtures, cf. multilingual LM sampling). With group weight
    w_g = n_g^alpha and W = sum(w_g), the per-group keep rate is
    min(1, target_total * (w_g / W) / n_g), and a row survives iff its
    hash-uniform u(key) <= rate — a pure function of (key, group
    counts): re-runs, retries, and repartitions keep the same rows.

    Shape: one groupBy over group_cols (map-side combined counts), a
    scalar total, and an equi-join of the tiny rates dim back onto the
    corpus — AQE broadcasts it (group count is bounded by the number
    of languages/domains, not corpus rows). The keep test is
    scan-local.

    Float parity: alpha=0.5 routes through sqrt (IEEE correctly
    rounded, bit-identical across engines, unlike libm pow); rates are
    rounded to 9 dp before the comparison so the borderline is
    engine-stable.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if target_total < 1:
        raise ValueError(f"target_total must be >= 1, got {target_total}")
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must name at least one column")

    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_docs"))
    n_dbl = F.col("n_docs").cast("double")
    wt = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(alpha))
    weighted = counts.withColumn("__wt", wt)
    total = weighted.agg(F.sum("__wt").alias("__W"))
    rates = (
        weighted.crossJoin(total)
        .withColumn(
            "mix_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total)) * F.col("__wt") / F.col("__W") / n_dbl,
                ),
                9,
            ),
        )
        .drop("__wt", "__W")
    )

    if portable:
        h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(key.cast("string"))
    u = (F.pmod(h, F.lit(4294967296)) + 1) / F.lit(4294967296.0)

    return (
        df.withColumn("__u", u)
        .join(rates, group_cols)
        .where(F.col("__u") <= F.col("mix_rate"))
        .drop("__u")
    )


def weighted_sample_topk(
    df,
    key: Column,
    weight: Column,
    k: int,
    strata_cols: list[str] | None = None,
    portable: bool = False,
):
    """Deterministic weighted sampling WITHOUT replacement, k per stratum
    (Efraimidis & Spirakis, IPL 2006, A-ES): each row draws the exponential
    rank -ln(u)/w with u a hash-uniform of its key, and the k SMALLEST
    ranks win — inclusion probability proportional to weight, and the
    whole draw is a pure function of (key, weight), so re-runs, retries,
    and backfills select the same rows (df.sample() guarantees none of
    this). Rows with weight <= 0 are excluded by definition (never
    sampleable).

    Shape: one window per stratum (single shuffle on strata) — at 100 TB
    pre-aggregate candidates per stratum or raise k only as needed; the
    window state is O(k) per stratum with a TakeOrdered-style heap when
    followed by the rank filter.

    Returns df's rows (all columns) plus `sample_rank`, filtered to the
    winners; deterministic ties broken by the key itself.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    strata_cols = list(strata_cols or [])

    # hash-uniform in (0, 1]: (pmod(h, 2^32) + 1) / 2^32 — exact powers of
    # two keep u bit-identical between engines
    if portable:
        h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(key.cast("string"))
    u = (F.pmod(h, F.lit(4294967296)) + 1) / F.lit(4294967296.0)

    w = weight.cast("double")
    rank = (-F.log(u)) / w
    ranked = df.where(w > 0).withColumn("sample_rank", F.round(rank, 9))
    win = Window.partitionBy(*strata_cols).orderBy(
        F.col("sample_rank").asc(), key.cast("string").asc()
    )
    return (
        ranked.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def token_budget_mix(
    df,
    group_col: str,
    token_col: str,
    budget: int,
    weights: dict[str, float],
    score_col: str | None = None,
    id_col: str = "doc_id",
):
    """Greedy per-group selection to a global token budget — the "mix to
    N tokens" step of training-data assembly (cf. the domain-weighted
    mixtures of Pile/DoReMi-style recipes): each group g gets a budget
    floor(budget * w_g / sum(w)); its docs are taken best-first
    (score desc, id asc — or plain id order when score_col is None)
    until the budget is crossed, INCLUDING the straddling doc (greedy
    fill semantics: a group always reaches its budget when it has the
    tokens; integer token counts make the cut engine-exact).

    Groups not named in ``weights`` get budget 0 and are dropped — the
    mix is a whitelist, which is what a curated training recipe means.

    Scale shape: per-group window over (score, id) — one shuffle keyed by
    group; group budgets ride along as a literal map (driver-side dict,
    never a collect). Returns df's columns plus (cum_tokens,
    group_budget) provenance.
    """
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not weights:
        raise ValueError("weights must name at least one group")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    # A named group with positive weight must never floor to budget 0 —
    # the documented straddler-included greedy fill means a whitelisted
    # group always contributes at least its first doc (r4 advice).
    budgets = {
        g: max(1, int(budget * w / total_w)) if w > 0 else 0
        for g, w in weights.items()
    }
    mapping = F.create_map(
        *[F.lit(x) for g, b in sorted(budgets.items()) for x in (g, b)]
    )
    order = (
        [F.desc(score_col), F.asc(id_col)]
        if score_col is not None
        else [F.asc(id_col)]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    taken_before = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        df.withColumn("group_budget", mapping[F.col(group_col)])
        .where(F.col("group_budget").isNotNull())
        # window exprs can't sit in a WHERE clause — materialize the
        # running total as a column, filter on the column
        .withColumn("__before", taken_before.cast("long"))
        .withColumn(
            "cum_tokens",
            (F.col("__before") + F.col(token_col)).cast("long"),
        )
        .where(F.col("__before") < F.col("group_budget"))
        .drop("__before")
    )


def curriculum_order(
    df,
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
    buckets: int = 8,
    width: int = 256,
    seed: int = 0,
):
    """Curriculum ordering (Bengio et al., ICML'09; the short-to-long
    schedule LLM pretraining uses for warmup): docs are bucketed by a
    difficulty proxy (equi-width on ``cost_col``, capped at ``buckets``),
    buckets are consumed easiest-first, and WITHIN a bucket the order is
    a deterministic seeded shuffle (md5 of seed:id — portable, and
    reproducible across runs/engines, unlike rand()).

    Returns (id, bucket, position) with position the 1-based global
    curriculum index. Scale shape: bucketing is per-row math; the
    within-bucket rank windows key on the bucket (corpus/buckets rows
    per partition — the documented token_shards-style bound, and the
    schedule is usually materialized per-bucket anyway); the bucket
    offsets are a ``buckets``-row dim joined back broadcast-style. No
    global window anywhere."""
    from pyspark.sql import Window

    if buckets < 1 or width < 1:
        raise ValueError(f"buckets and width must be >= 1, got {buckets}, {width}")
    bucket = F.least(
        F.lit(buckets - 1), F.expr(f"{cost_col} div {width}")
    ).cast("long")
    sk = F.md5(F.concat(F.lit(f"cur{seed}:"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col), bucket.alias("bucket"), sk.alias("sk")
    )
    w = Window.partitionBy("bucket").orderBy(F.col("sk"), F.col(id_col))
    ranked = base.withColumn("rn", F.row_number().over(w).cast("long"))
    sizes = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    # cumulative offsets over the <= `buckets`-row dim as a bounded
    # self-join (not a no-partition window, which would put a
    # SinglePartition node in the corpus plan)
    lower = sizes.select(
        F.col("bucket").alias("__lb"), F.col("c").alias("__lc")
    )
    offsets = (
        sizes.join(lower, F.col("__lb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("__lc"), F.lit(0)).cast("long").alias("off")
        )
    )
    return ranked.join(F.broadcast(offsets), "bucket").select(
        F.col(id_col),
        F.col("bucket"),
        (F.col("off") + F.col("rn")).alias("position"),
    )

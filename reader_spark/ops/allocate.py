"""Max-min fair budget allocation (water-filling).

The crawl-politeness / quota scheduler: N consumers (domains, tenants,
shards) demand d_i units from a shared budget B. Max-min fairness
gives every consumer min(d_i, t) where the water level t is chosen so
the budget is exactly spent — small demands are fully satisfied, large
ones are capped at the common level (Bertsekas & Gallager, Data
Networks §6.5.2). Closed form, no iteration: sort demands ascending,
j = max { k : S_{k-1} + d_k*(N-k+1) <= B } consumers are fully met,
and t = (B - S_j) / (N - j) caps the rest.

Shape at scale: the window runs over the CONSUMER dim (domains), not
corpus rows — bounded by registry size; partition the window by pool
(region, tenant class) when each pool has its own budget. Demands are
aggregated upstream with a map-side-combined groupBy.

All arithmetic on exact integer demands until the single level
division; allocations rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def max_min_fair_allocation(
    demands: DataFrame,
    key_col: str,
    demand_col: str,
    budget: float,
) -> DataFrame:
    """(key, demand, alloc, capped): max-min fair split of ``budget``
    across the demand rows. If total demand <= budget everyone gets
    their demand (capped=0 everywhere)."""
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")

    d = F.col(demand_col).cast("double")
    w = Window.orderBy(F.col("demand").asc(), F.col("key").asc())
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        demands.select(F.col(key_col).alias("key"), d.alias("demand"))
        .withColumn("k", F.row_number().over(w))
        .withColumn("s", F.sum("demand").over(w))  # S_k inclusive
        .withColumn("n", F.count(F.lit(1)).over(w_all))
    )
    # row k is fully satisfiable iff S_{k-1} + d_k*(n-k+1) <= B
    feasible = ranked.withColumn(
        "fully",
        (
            (F.col("s") - F.col("demand"))
            + F.col("demand") * (F.col("n") - F.col("k") + 1)
            <= F.lit(float(budget))
        ).cast("int"),
    )
    # j = count of feasible rows (prefix property: feasibility is monotone
    # down the ascending sort); S_j = sum of their demands
    agg = feasible.agg(
        F.sum("fully").alias("j"),
        F.coalesce(
            F.sum(F.when(F.col("fully") == 1, F.col("demand"))), F.lit(0.0)
        ).alias("s_j"),
        F.count(F.lit(1)).alias("n"),
    )
    level = F.when(
        F.col("j") == F.col("n"), F.lit(None).cast("double")
    ).otherwise(
        (F.lit(float(budget)) - F.col("s_j")) / (F.col("n") - F.col("j"))
    )
    with_level = feasible.crossJoin(F.broadcast(agg.select(level.alias("t"))))
    return with_level.select(
        F.col("key").alias(key_col),
        "demand",
        F.round(
            F.when(F.col("t").isNull(), F.col("demand")).otherwise(
                F.least(F.col("demand"), F.col("t"))
            ),
            6,
        ).alias("alloc"),
        F.when(
            F.col("t").isNotNull() & (F.col("demand") > F.col("t")), 1
        ).otherwise(0).alias("capped"),
    )


def unimax_allocation(
    sizes: DataFrame,
    key_col: str,
    size_col: str,
    budget: float,
    max_epochs: float = 4.0,
) -> DataFrame:
    """UniMax language sampling (Chung et al., ICLR'23): split a total
    training-token ``budget`` as uniformly as possible across languages,
    capping every language at ``max_epochs`` passes over its corpus.

    UniMax's sequential allocator ("give each remaining language
    budget/remaining, unless its cap binds") is exactly max-min fair
    water-filling with per-key demand = max_epochs * size: small
    languages hit their epoch cap, the leftover pours uniformly into the
    big ones. Reuses the closed-form level from
    :func:`max_min_fair_allocation` — no iteration, window bounded by
    the language registry, corpus rows never shuffle.

    Returns (key, size, alloc, epochs, budget_limited): ``alloc`` in the
    same unit as ``size`` (chars/tokens), ``epochs = alloc / size``
    rounded 6 dp, ``budget_limited`` = 1 where the water level (not the
    epoch cap) binds.
    """
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    demands = sizes.select(
        F.col(key_col).alias(key_col),
        F.col(size_col).cast("double").alias("size"),
        (F.col(size_col).cast("double") * F.lit(float(max_epochs))).alias(
            "demand"
        ),
    )
    alloc = max_min_fair_allocation(
        demands.select(key_col, "demand"), key_col, "demand", budget
    )
    return alloc.join(demands.select(key_col, "size"), key_col).select(
        key_col,
        "size",
        "alloc",
        F.round(F.col("alloc") / F.col("size"), 6).alias("epochs"),
        F.col("capped").alias("budget_limited"),
    )


def epoch_schedule(
    domains: DataFrame,
    budget_tokens: int,
    max_epochs_milli: int = 4000,
) -> DataFrame:
    """Audit a TARGET mix: epochs each domain must repeat to meet it.

    :func:`unimax_allocation` derives a mix from a budget; this is the
    inverse audit — given a desired mix (``weight`` per domain, any
    positive scale, normalized internally) and a total training budget,
    report what the mix costs each domain in repetition:

    ``(domain, available_tokens, weight, target_tokens, epochs_milli,
    unique_tokens, repeated_tokens, excess_tokens, over_cap)`` where
    ``target_tokens = weight * budget div sum(weight)`` (integer,
    floor), ``epochs_milli = 1000 * target div available``,
    ``repeated_tokens = max(0, target - available)`` and
    ``excess_tokens = max(0, target - cap*available)`` — the tokens
    past the ``max_epochs_milli`` repetition cap, where repeating stops
    helping (Muennighoff et al. 2023, "Scaling Data-Constrained
    Language Models": ~4 epochs is as good as new data, beyond decays
    fast). ``over_cap`` flags those domains; the planner's fix is to
    shift their excess into under-repeated domains.

    Input ``domains``: ``(domain, available_tokens, weight)``. All
    integer milli-unit math; the weight normalizer rides as a 1-row
    broadcast dim (bounded domain registry, corpus rows never enter).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    if max_epochs_milli <= 0:
        raise ValueError(
            f"max_epochs_milli must be > 0, got {max_epochs_milli}"
        )
    total_w = domains.agg(
        F.sum(F.col("weight").cast("long")).alias("__tw")
    )
    target = F.expr(f"(weight * CAST({int(budget_tokens)} AS BIGINT)) div __tw")
    d = (
        domains.join(F.broadcast(total_w))
        .select(
            "domain",
            F.col("available_tokens").cast("long").alias("available_tokens"),
            F.col("weight").cast("long").alias("weight"),
            target.cast("long").alias("target_tokens"),
        )
    )
    cap_tokens = F.expr(
        f"(available_tokens * CAST({int(max_epochs_milli)} AS BIGINT)) "
        "div 1000"
    )
    return d.select(
        "domain",
        "available_tokens",
        "weight",
        "target_tokens",
        F.expr("(1000 * target_tokens) div greatest(available_tokens, 1)")
        .cast("long")
        .alias("epochs_milli"),
        F.least("target_tokens", "available_tokens")
        .cast("long")
        .alias("unique_tokens"),
        F.greatest(
            F.lit(0), F.col("target_tokens") - F.col("available_tokens")
        )
        .cast("long")
        .alias("repeated_tokens"),
        F.greatest(F.lit(0), F.col("target_tokens") - cap_tokens)
        .cast("long")
        .alias("excess_tokens"),
        (F.col("target_tokens") > cap_tokens).alias("over_cap"),
    )


def doremi_reweight(
    domains: DataFrame,
    eta_milli: int = 1000,
    z_cap_milli: int = 5000,
    taylor_terms: int = 12,
) -> DataFrame:
    """One-step DoReMi domain reweighting on excess proxy loss.

    DoReMi (Xie et al. 2023, "Doremi: Optimizing Data Mixtures Speeds
    Up Language Model Pretraining") multiplicatively upweights domains
    where the proxy model's loss exceeds the reference model's:
    ``w(domain) ∝ exp(eta * max(0, proxy_loss - ref_loss))``. This is
    the one-update-step form over a bounded domain dim (the full
    algorithm re-trains the proxy between steps — out of scope for a
    data engine; the reweight math is the reusable part).

    Float-free exp: ``exp(z)`` evaluates as a fixed-point Taylor series
    in EXACT integer arithmetic — ``t_0 = 10^6`` micro-units,
    ``t_n = t_{n-1} * z_milli div (1000 * n)``, summed over
    ``taylor_terms`` terms, with ``z_milli`` clamped to ``z_cap_milli``
    so every intermediate stays far from long overflow. Truncation is
    part of the spec: both engines run the identical integer recurrence
    (non-negative throughout, so Spark's trunc-div == DuckDB's
    floor-div), so weights match bit-for-bit — no libm exp ever runs.

    Input ``domains``: ``(domain, proxy_loss_milli, ref_loss_milli)``
    integer milli-nats. Output ``(domain, excess_milli, z_milli,
    exp_micro, weight_milli)``; the normalizer rides as a 1-row
    broadcast dim (bounded domain registry).
    """
    if eta_milli <= 0:
        raise ValueError(f"eta_milli must be > 0, got {eta_milli}")
    if not 0 < z_cap_milli <= 10_000:
        raise ValueError(f"z_cap_milli must be in (0, 10000], got {z_cap_milli}")
    excess = F.greatest(
        F.lit(0).cast("long"),
        (F.col("proxy_loss_milli") - F.col("ref_loss_milli")).cast("long"),
    )
    z = F.least(
        F.expr(f"(CAST({int(eta_milli)} AS BIGINT) * excess_milli) div 1000"),
        F.lit(int(z_cap_milli)).cast("long"),
    )
    base = domains.select(
        "domain",
        excess.alias("excess_milli"),
    ).select("domain", "excess_milli", z.alias("z_milli"))
    # Unrolled integer Taylor: exp_micro = sum_n t_n, pure long `div`.
    scored = base.withColumn(
        "__t", F.lit(1_000_000).cast("long")
    ).withColumn("__acc", F.col("__t"))
    for n in range(1, taylor_terms):
        scored = scored.withColumn(
            "__t", F.expr(f"(__t * z_milli) div {1000 * n}")
        ).withColumn("__acc", F.col("__acc") + F.col("__t"))
    scored = scored.select(
        "domain",
        "excess_milli",
        "z_milli",
        F.col("__acc").cast("long").alias("exp_micro"),
    )
    norm = scored.agg(F.sum("exp_micro").cast("long").alias("__z"))
    return scored.join(F.broadcast(norm)).select(
        "domain",
        "excess_milli",
        "z_milli",
        "exp_micro",
        F.expr("(exp_micro * 1000) div __z").cast("long").alias("weight_milli"),
    )

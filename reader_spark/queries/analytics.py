"""TPC-H-shaped analytics queries (scan/filter/agg/join/rollup coverage).

Factored out of __spark_entry__.py verbatim (VERDICT r3 #8: keep the entry
file a reviewable registry). Each function is a queries() entry; oracles
live in reader_spark/oracles.py under the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation (operator coverage: scan+filter+agg)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k.

    `orders` is a fact table that scales linearly with SF — no broadcast
    hint; AQE picks the strategy (sort-merge / shuffled-hash at scale,
    auto-broadcast only when the post-filter side is genuinely small).
    Only bounded dims (nation, region) get explicit broadcast hints.
    """
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


def _q_customer_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join (J3/J4 analogue) + rollup aggregate."""
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


def _q_part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (lineitem x part x supplier).

    part/supplier grow with SF (not bounded dims like nation/region), so no
    forced broadcast — AQE auto-broadcasts while they fit under the
    threshold and falls back to shuffle joins at scale.
    """
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    supplier = _read(spark, sf_dir, "supplier")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


def _q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-table join: revenue by nation where customer and
    supplier share the nation, restricted to one region and a date range.
    Catalyst exercise: join reordering + broadcast of the dim chain
    (region->nation tiny, customer/supplier small) under AQE."""
    region = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _read(spark, sf_dir, "nation")
    customer = _read(spark, sf_dir, "customer")
    supplier = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    lineitem = _read(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("n_name", "revenue")
    )


def _q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: per order-year, the fraction of regional
    revenue supplied by one nation, NATION_3 (conditional aggregation over a
    multi-join; sum(when)/sum is the map-side-combinable form)."""
    nation = _read(spark, sf_dir, "nation")
    supplier = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .select("o_year", "mkt_share")
    )


def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the checkpoint-resume join shape (J5)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_nationkey")
    )


def _q_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over returnflag/linestatus."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def _q_hilbert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (user_id, event time) — the
    better-locality sibling of zorder_events (every consecutive pair of
    curve cells is Manhattan-adjacent, so file min/max boxes are
    tighter). Same integer bucket normalization, the curve walk as a
    within-row fold; oracle twin walks the identical recursion as a
    recursive CTE. Scan-local after the 1-row min/max dim."""
    from reader_spark.ops.hilbert import hilbert_key

    events = _read(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    return hilbert_key(events, "user_id", "ts_us", bits=8).select(
        "event_id", "user_id_bucket", "ts_us_bucket", "h"
    )


def _q_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg two-state burst labeling over the hourly event stream
    (ops.burst.kleinberg_bursts, KDD 2002): round-9 nano-unit binomial
    window costs, gamma*ln(T) burst-entry cost, exact integer min-plus
    forward/backward folds WITHIN each key row (no global windows), and
    the optimal per-window burst flag — the flap-resistant error-spike
    / hot-topic detector."""
    from reader_spark.ops.burst import kleinberg_bursts

    events = _read(spark, sf_dir, "events")
    return kleinberg_bursts(events)

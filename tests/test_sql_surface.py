"""SQL API surface: the ANSI-subset oracle texts run unmodified through
spark.sql over temp views and must produce exactly what the DataFrame-API
queries produce — one logical query, three engines (DataFrame, Spark SQL,
DuckDB)."""

import pytest

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# oracle texts known to be ANSI-portable to Spark SQL (no DuckDB-only
# functions); representative of scans, joins, aggs, anti-joins, CASE.
PORTABLE = [
    "pricing_summary",
    "top_revenue_orders",
    "customer_nation_rollup",
    "customers_without_orders",
    "regional_supplier_volume",
    "nation_market_share",
    "events_user_stats",
    "funnel",
    "events_hourly",
    "dedup_exact",
    "resume_remaining",
    "url_keys",
    "batch_metadata",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)


@pytest.mark.parametrize("name", PORTABLE)
def test_dataframe_equals_spark_sql(spark, name):
    import __spark_entry__ as e

    df_rows = sorted(
        tuple(r) for r in e.queries()[name](spark, SF).collect()
    )
    sql_rows = sorted(tuple(r) for r in spark.sql(e.oracle_sql()[name]).collect())
    assert df_rows == sql_rows

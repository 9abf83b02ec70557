"""Bucketed co-located joins: the resume anti-join (J5) on bucketed tables
must run shuffle-free (no ShuffleExchange on either side) — the ddl/iceberg.sql
bucket(doc_id) layout exists exactly for this."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_anti_join_no_shuffle(spark, tmp_path):
    docs = spark.range(2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("payload").alias("payload"),
    )
    (
        docs.write.bucketBy(16, "doc_id")
        .sortBy("doc_id")
        .option("path", str(tmp_path / "docs"))
        .mode("overwrite")
        .saveAsTable("bdocs")
    )
    (
        docs.sample(0.5, seed=1)
        .select("doc_id")
        .write.bucketBy(16, "doc_id")
        .sortBy("doc_id")
        .option("path", str(tmp_path / "committed"))
        .mode("overwrite")
        .saveAsTable("bcommitted")
    )
    # Force the sort-merge path (at real scale the committed set is far past
    # any broadcast threshold) and inspect the bucketed plan.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        remaining = spark.table("bdocs").join(
            spark.table("bcommitted"), "doc_id", "left_anti"
        )
        plan = plan_of(remaining)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing co-locates
        assert remaining.count() == 2000 - spark.table("bcommitted").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bdocs")
        spark.sql("DROP TABLE IF EXISTS bcommitted")

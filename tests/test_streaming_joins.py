"""Stream-stream interval join must emit exactly the pairs the batch
bucketed range join produces over the same (fully-arrived) input."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_interval_join_stream_equals_batch(spark, tmp_path):
    from reader_spark.ops.joins import range_join_buckets
    from reader_spark.streaming.joins import attribution_interval_join

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    signups = events.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    s_path, p_path = str(tmp_path / "s"), str(tmp_path / "p")
    signups.write.parquet(s_path)
    purchases.write.parquet(p_path)

    batch_pairs = sorted(
        (r["signup_id"], r["pid_ts"])
        for r in range_join_buckets(
            purchases.select("user_id", F.col("ts").alias("p_ts"), "value"),
            signups.select(
                F.col("event_id").alias("signup_id"),
                "user_id",
                F.col("ts").alias("signup_ts"),
                (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("end_ts"),
            ),
            on=["user_id"],
            point_time="p_ts",
            interval_start="signup_ts",
            interval_end="end_ts",
            bucket_seconds=43200,
        )
        .select("signup_id", F.col("p_ts").alias("pid_ts"))
        .collect()
    )
    assert batch_pairs  # non-trivial

    s_stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(s_path)
    p_stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(p_path)
    q = (
        attribution_interval_join(s_stream, p_stream)
        .writeStream.format("memory")
        .queryName("attr_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_pairs = sorted(
        (r["signup_id"], r["p_ts"])
        for r in spark.sql("select * from attr_join_out").collect()
    )
    # Inner stream-stream join emits matches as they arrive (watermark only
    # gates state EVICTION, not emission) — one availableNow pass over fully
    # arrived input must produce the complete batch answer.
    assert stream_pairs == batch_pairs


def test_interval_join_plan_carries_watermarks(spark, tmp_path):
    """Both sides must carry event-time watermarks so join state is
    bounded — an unbounded stream-stream join is the scale failure mode."""
    from reader_spark.streaming.joins import attribution_interval_join

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s_path, p_path = str(tmp_path / "s"), str(tmp_path / "p")
    events.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    ).write.parquet(s_path)
    events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    ).write.parquet(p_path)
    # withWatermark is a no-op on batch frames — the state-bounding claim
    # only exists on STREAMING plans, so assert there.
    s = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(s_path)
    p = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(p_path)
    out = attribution_interval_join(s, p)
    logical = out._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    assert logical.count("EventTimeWatermark") == 2

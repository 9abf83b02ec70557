"""Streaming KMV distinct: bounded sketch state, batch parity, and
micro-batching invariance (mergeability is the property under test)."""

import pytest

pytestmark = pytest.mark.spark


def _run_stream(spark, src, qname):
    from reader_spark.streaming.sketch_stream import kmv_distinct_stream

    stream = spark.readStream.schema("event_type string, user_id long").parquet(src)
    q = (
        kmv_distinct_stream(stream, "event_type", "user_id", k=32)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_final_estimate_equals_batch(spark, tmp_path):
    from reader_spark.ops.sketch import kmv_distinct

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    batch = {
        r["event_type"]: (r["n_sketch"], r["est_distinct"])
        for r in kmv_distinct(events, "event_type", "user_id", k=32).collect()
    }
    _run_stream(spark, src, "kmv_one")
    got = {
        r["event_type"]: (r["n_sketch"], r["est_distinct"])
        for r in spark.sql(
            "select * from kmv_one"
        ).collect()
    }
    assert got == batch


def test_micro_batching_invariance(spark, tmp_path):
    """Two separate files (two micro-batches under availableNow file
    limits) must converge to the same final estimate as one batch —
    bottom-k state merges losslessly."""
    from pyspark.sql import functions as F

    from reader_spark.ops.sketch import kmv_distinct

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    src = str(tmp_path / "ev2")
    events.where(F.col("user_id") % 2 == 0).write.parquet(src + "/p1")
    events.where(F.col("user_id") % 2 != 0).write.parquet(src + "/p2")

    from reader_spark.streaming.sketch_stream import kmv_distinct_stream

    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/p*")
    )
    q = (
        kmv_distinct_stream(stream, "event_type", "user_id", k=32)
        .writeStream.format("memory")
        .queryName("kmv_two")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from kmv_two").collect()
    # update mode emits one row per group per micro-batch; the LAST row
    # per group is the final state
    final = {}
    for r in rows:
        final[r["event_type"]] = (r["n_sketch"], r["est_distinct"])
    batch = {
        r["event_type"]: (r["n_sketch"], r["est_distinct"])
        for r in kmv_distinct(events, "event_type", "user_id", k=32).collect()
    }
    assert final == batch


def test_restart_recovers_bottom_k_state(spark, tmp_path):
    """applyInPandasWithState recovery: stop after half the input, restart
    with the SAME checkpoint over new files — the recovered array<long>
    state must yield the same final estimates as one batch over all rows."""
    from pyspark.sql import functions as F

    from reader_spark.ops.sketch import kmv_distinct
    from reader_spark.streaming.sketch_stream import kmv_distinct_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(
            "event_type string, user_id long"
        ).parquet(src)
        q = (
            kmv_distinct_stream(
                stream, "event_type", "user_id", k=32, output_mode="append"
            )
            .withColumn("batch_ts", F.current_timestamp())
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    events.where(F.col("user_id") % 2 == 0).write.mode("append").parquet(src)
    run_once()
    events.where(F.col("user_id") % 2 != 0).write.mode("append").parquet(src)
    run_once()

    rows = spark.read.parquet(out).orderBy("batch_ts").collect()
    final = {}
    for r in rows:  # later batches overwrite: last write per group wins
        final[r["event_type"]] = (r["n_sketch"], r["est_distinct"])
    batch = {
        r["event_type"]: (r["n_sketch"], r["est_distinct"])
        for r in kmv_distinct(events, "event_type", "user_id", k=32).collect()
    }
    assert final == batch

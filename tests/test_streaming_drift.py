"""Streaming PSI drift monitor: stream==batch parity, fires on shift,
quiet on reference-like traffic."""

import pytest

pytestmark = pytest.mark.spark


def _reference(spark):
    from reader_spark.streaming.drift_stream import train_psi_reference

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return events, train_psi_reference(events, "value")


def test_stream_equals_batch(spark, tmp_path):
    from reader_spark.streaming.drift_stream import psi_drift_stream

    events, (edges, probs) = _reference(spark)
    src = str(tmp_path / "events")
    events.select("ts", "event_type", "value").write.parquet(src)

    batch = {
        (r["window_start"], r["key"]): (r["n"], r["psi"], r["drifted"])
        for r in psi_drift_stream(events, edges, probs).collect()
    }
    assert batch

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        psi_drift_stream(stream, edges, probs)
        .writeStream.format("memory")
        .queryName("psi_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from psi_out").collect()
    assert emitted
    for r in emitted:
        assert batch[(r["window_start"], r["key"])] == (
            r["n"],
            r["psi"],
            r["drifted"],
        )
    assert len(emitted) < len(batch)  # open windows withheld, not invented


def test_quiet_on_reference_traffic_fires_on_shift(spark):
    from pyspark.sql import functions as F

    from reader_spark.streaming.drift_stream import psi_drift_stream

    events, (edges, probs) = _reference(spark)
    # one window per key over the whole corpus (n~200/key): tiny PSI.
    # (Narrow windows at this SF have n~13, where add-1 smoothing bias
    # alone reaches ~0.24 — window sizing is part of monitor tuning.)
    quiet = psi_drift_stream(
        events, edges, probs, window_duration="90 days"
    ).agg(F.max("psi")).head()[0]
    assert quiet < 0.1
    # a 2x unit change in the same pipeline: every window fires
    shifted = events.withColumn("value", F.col("value") * 2.0)
    fired = psi_drift_stream(
        shifted, edges, probs, window_duration="90 days"
    ).agg(F.min("psi"), F.min("drifted")).head()
    assert fired[0] > 0.2 and fired[1] == 1


def test_ref_probs_length_validated(spark):
    from reader_spark.streaming.drift_stream import psi_drift_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError):
        psi_drift_stream(events, [1.0, 2.0], [0.5, 0.5])

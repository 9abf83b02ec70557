"""Watermarked event-time windows: streaming result must equal the batch
result over the same (fully-arrived) input."""

import pytest

pytestmark = pytest.mark.spark


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from reader_spark.streaming.windows import windowed_event_counts

    src = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "event_type", "value"
    )
    events.write.parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    assert batch  # non-trivial input

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Append mode only emits windows the watermark has CLOSED; with a single
    # microbatch the final watermark is max(ts) - 2h, so the last windows
    # stay open. Every emitted row must match its batch twin exactly.
    emitted = spark.sql("select * from win_out").collect()
    assert emitted
    for r in emitted:
        key = (r["window_start"], r["event_type"])
        assert batch[key] == (r["n"], r["sum_value"])
    assert len(emitted) < len(batch)  # open windows withheld, not invented

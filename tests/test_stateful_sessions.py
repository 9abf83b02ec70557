"""Custom stateful streaming operator: applyInPandasWithState session
windows (processing-time inactivity timeout)."""

import time

import pytest

pytestmark = pytest.mark.spark


def test_sessions_emit_on_timeout(spark, tmp_path):
    from reader_spark.streaming.sessions import sessionized_stream

    src = tmp_path / "events"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    write_batch(
        "b1",
        [
            (1, t0),
            (1, t0 + dt.timedelta(seconds=30)),
            (1, t0 + dt.timedelta(seconds=70)),
        ],
    )

    events = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(str(src))
    )
    q = (
        sessionized_stream(events)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        # Let the first microbatch absorb user 1, then idle past the 10s
        # inactivity timeout; a later microbatch (new file) fires the timer.
        time.sleep(13)
        write_batch("b2", [(2, t0 + dt.timedelta(hours=1))])
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from sessions_out").collect()
            if rows:
                break
            time.sleep(2)
    finally:
        q.stop()

    assert len(rows) == 1
    session = rows[0]
    assert session["user_id"] == 1
    assert session["n_events"] == 3
    assert (session["session_end"] - session["session_start"]).total_seconds() == 70


def test_event_time_sessions_split_and_timeout(spark, tmp_path):
    """Event-time sessionization: in-batch gap splits emit immediately;
    the open session emits when a LATER batch's watermark passes its
    timeout — deterministic in event time, replay-stable."""
    import pandas as pd

    from reader_spark.streaming.sessions import sessionized_stream_event_time

    src = str(tmp_path / "events")
    base = 1_700_000_000
    # file 1: user 1 has two bursts separated by > gap (60s) in ONE file
    spark.createDataFrame(
        [(1, base), (1, base + 10), (1, base + 200), (1, base + 210)],
        "user_id long, epoch long",
    ).selectExpr("user_id", "timestamp_seconds(epoch) as ts").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # file 2: much later event advances the watermark past burst 2's timeout
    spark.createDataFrame(
        [(2, base + 10_000)], "user_id long, epoch long"
    ).selectExpr("user_id", "timestamp_seconds(epoch) as ts").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionized_stream_event_time(stream, gap_seconds=60, watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("et_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r["user_id"], int(r["session_start"].timestamp()), r["n_events"])
        for r in spark.sql("select * from et_sessions").collect()
    )
    # user 1's burst A closed by the in-batch gap; burst B closed by the
    # watermark from file 2; user 2's session still open (no later watermark).
    assert (1, base, 2) in rows
    assert (1, base + 200, 2) in rows
    assert all(u != 2 for u, _s, _n in rows)


def test_event_time_sessions_subsecond_precision(spark, tmp_path):
    """Sub-second event times survive the state round-trip: a gap of
    gap+0.5s splits while gap-0.5s merges (flooring to whole seconds would
    decide both identically), and the emitted bounds keep the milliseconds."""
    from reader_spark.streaming.sessions import sessionized_stream_event_time

    src = str(tmp_path / "events")
    base_ms = 1_700_000_000_000
    # user 1: events 60.5s apart (split at gap=60); user 3: 59.5s apart (merge)
    spark.createDataFrame(
        [(1, base_ms + 250), (1, base_ms + 60_750), (3, base_ms + 250), (3, base_ms + 59_750)],
        "user_id long, ms long",
    ).selectExpr("user_id", "timestamp_millis(ms) as ts").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([(2, base_ms + 10_000_000)], "user_id long, ms long").selectExpr(
        "user_id", "timestamp_millis(ms) as ts"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionized_stream_event_time(stream, gap_seconds=60, watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("subsec_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["user_id"], int(r["session_start"].timestamp() * 1000), r["n_events"])
        for r in spark.sql("select * from subsec_sessions").collect()
    }
    # user 1 split into two 1-event sessions; user 3 merged into one 2-event
    # session; the emitted start keeps its 250 ms component.
    assert (1, base_ms + 250, 1) in rows
    assert (1, base_ms + 60_750, 1) in rows
    assert (3, base_ms + 250, 2) in rows

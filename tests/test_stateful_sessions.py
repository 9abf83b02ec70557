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

"""Streaming refresh routing (reader_spark.streaming.refresh_stream)."""

from pyspark.sql import functions as F

BATCH_EQUIV_NOTE = """streaming cannot see 'removed' (absence never
arrives); the batch lane (ops/delta.crawl_delta) owns removal."""


def _write_snapshot(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 100)
    )
    snap = str(tmp_path / "committed")
    docs.write.parquet(snap)
    return docs, snap


def test_stream_routing_matches_batch_delta(spark, tmp_path):
    from reader_spark.streaming.refresh_stream import refresh_route_stream

    docs, snap = _write_snapshot(spark, tmp_path)

    # arriving batch: docs 0..49 unchanged, 50..99 changed text,
    # 100..119 brand new
    arriving = (
        docs.where(F.col("doc_id") < 50)
        .unionByName(
            docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
            .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
        )
        .unionByName(
            docs.where(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 100).alias("doc_id"), "text"
            )
        )
    )
    src = str(tmp_path / "arrivals")
    arriving.write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    committed = spark.read.parquet(snap)
    q = (
        refresh_route_stream(stream, committed)
        .writeStream.format("memory")
        .queryName("refresh_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select doc_id, status from refresh_out").collect()
    got = {r.doc_id: r.status for r in rows}
    assert len(got) == 120
    assert all(got[d] == "unchanged" for d in range(0, 50))
    assert all(got[d] == "changed" for d in range(50, 100))
    assert all(got[d] == "added" for d in range(100, 120))


def test_stream_frontier_filters_unchanged(spark, tmp_path):
    from reader_spark.streaming.refresh_stream import refresh_frontier_stream

    docs, snap = _write_snapshot(spark, tmp_path)
    arriving = docs.unionByName(
        docs.where(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
    )
    src = str(tmp_path / "arrivals2")
    arriving.write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        refresh_frontier_stream(stream, spark.read.parquet(snap))
        .writeStream.format("memory")
        .queryName("frontier_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select doc_id, status, text from frontier_out").collect()
    # only the 5 new docs survive; payload columns ride through
    assert {r.doc_id for r in rows} == {1000, 1001, 1002, 1003, 1004}
    assert all(r.status == "added" and r.text for r in rows)

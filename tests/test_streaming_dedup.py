"""Streaming exact dedup (dropDuplicatesWithinWatermark): duplicates within
the watermark horizon are suppressed; each surviving hash appears once and
the survivor set equals the batch-dedup keeper set over the same input."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_stream_dedup_matches_batch_keepers(spark, tmp_path):
    from reader_spark.streaming.dedup_stream import dedup_stream

    src = str(tmp_path / "docs_stream")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        # synthesize arrival times + REAL duplicates (every doc arrives
        # twice, 1 minute apart — well inside the 1h watermark horizon)
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    dup = docs.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
    docs.unionByName(dup).write.parquet(src)

    n_unique_texts = docs.select("text").distinct().count()

    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    q = (
        dedup_stream(stream, ts_col="ts", content_col="text")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("select content_hash, text from dedup_out").collect()
    hashes = [r["content_hash"] for r in out]
    # one row per distinct content, no duplicate hash emitted
    assert len(hashes) == len(set(hashes)) == n_unique_texts
    # survivors carry the original payload columns
    assert all(r["text"] for r in out)

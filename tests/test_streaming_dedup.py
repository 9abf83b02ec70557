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


def test_stream_near_dup_flags_against_persisted_index(spark, tmp_path):
    """Recrawl on-arrival dedup: stream new docs, band them per-row with
    the batch minhash recipe, stream-static-join the persisted band
    index. Exact copies of indexed docs are flagged (all 16 bands hit);
    novel docs are not."""
    from pyspark.sql import Row

    from reader_spark.ops.dedup import build_band_index
    from reader_spark.streaming.dedup_stream import near_dup_flags_stream

    old = spark.createDataFrame(
        [Row(doc_id=i,
             text=" ".join(f"w{i}x{j}" for j in range(12)))
         for i in range(10)]
    )
    index_path = str(tmp_path / "index")
    build_band_index(old, "doc_id", "text").write.parquet(index_path)

    new_rows = [
        Row(doc_id=100, text=" ".join(f"w3x{j}" for j in range(12))),  # copy of 3
        Row(doc_id=101, text="completely novel content nothing like the corpus xyz"),
    ]
    src = str(tmp_path / "new_stream")
    spark.createDataFrame(new_rows).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        near_dup_flags_stream(
            stream, spark.read.parquet(index_path), "doc_id", "text"
        )
        .writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    flags = {r["doc_id"]: r for r in spark.sql("select * from neardup_out").collect()}
    assert 100 in flags and flags[100].sample_old_doc == 3
    assert flags[100].n_hits == 16  # identical text: every band collides
    assert 101 not in flags


def test_stream_banding_matches_batch_index_recipe(spark):
    """The per-row signature (array_min over transformed shingles) must
    equal the batch explode+groupBy minhash — same bands, same family."""
    from pyspark.sql import Row

    from reader_spark.ops.dedup import build_band_index
    from reader_spark.streaming.dedup_stream import near_dup_flags_stream

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"p{i}q{j}" for j in range(10)))
         for i in range(5)]
    )
    index = build_band_index(docs, "doc_id", "text")
    # run the STREAM op in batch mode (same expressions) against the index
    flags = {
        r["doc_id"]: (r["n_hits"], r["sample_old_doc"])
        for r in near_dup_flags_stream(docs, index, "doc_id", "text").collect()
    }
    # every doc matches ITSELF (and only itself) on all 16 bands —
    # bit-identical banding between the per-row and explode/groupBy forms
    assert flags == {i: (16, i) for i in range(5)}


def test_stream_rate_limiter_matches_batch_replay(spark, tmp_path):
    """The streaming token bucket (applyInPandasWithState) must reproduce
    the oracle-checked batch replay decision-for-decision on the same
    (ordered) input — integer micro-token state, no float divergence."""
    import datetime as dt

    from pyspark.sql import Row

    from reader_spark.ops.ratelimit import token_bucket_admission
    from reader_spark.streaming.dedup_stream import rate_limited_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=u, event_id=u * 100 + i,
            ts=base + dt.timedelta(seconds=i * gap))
        for u, gap in ((1, 1), (2, 60_000), (3, 200_000))
        for i in range(8)
    ]
    src = str(tmp_path / "rl_stream")
    spark.createDataFrame(rows).write.parquet(src)

    stream = spark.readStream.schema("user_id long, event_id long, ts timestamp").parquet(src)
    q = (
        rate_limited_stream(stream)
        .writeStream.format("memory")
        .queryName("rl_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = sorted(
        (r.user_id, r.event_id, r.admitted, r.token_units)
        for r in spark.sql("select * from rl_out").collect()
    )
    batch = sorted(
        (r.user_id, r.event_id, r.admitted, r.token_units)
        for r in token_bucket_admission(spark.createDataFrame(rows)).collect()
    )
    assert streamed == batch and len(streamed) == 24
    # both admission outcomes occur (bursty user 1 gets denials,
    # slow user 3 gets all admits)
    outcomes = {u: [a for (uu, _e, a, _t) in streamed if uu == u] for u in (1, 3)}
    assert False in outcomes[1] and all(outcomes[3])

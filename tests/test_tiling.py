"""TextTiling segmentation (ops/tiling.py, Hearst 1997)."""

from pyspark.sql import Row

from reader_spark.ops.tiling import texttiling_gaps, texttiling_segments

# Two topics of 4 blocks each (w=4): fruit vocabulary, then metal
# vocabulary. The only lexical break is between blocks 3 and 4, so gap 4
# is the deepest valley and must be the boundary.
TOPIC_A = "apple banana cherry plum "
TOPIC_B = "iron copper zinc nickel "
TWO_TOPIC = TOPIC_A * 4 + TOPIC_B * 4


def _gaps(spark, text, w=4, k=2):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return sorted(
        texttiling_gaps(df, w=w, k=k).collect(), key=lambda r: r["gap"]
    )


def test_two_topic_document_boundary_at_the_switch(spark):
    rows = _gaps(spark, TWO_TOPIC)
    assert [r["gap"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    by_gap = {r["gap"]: r for r in rows}
    # Away from the switch both windows share the full vocabulary.
    assert by_gap[2]["sim2_micro"] == 1_000_000
    # At the switch the windows are disjoint.
    assert by_gap[4]["sim2_micro"] == 0
    # Gap 4 is the unique deepest valley and the only boundary.
    deepest = max(rows, key=lambda r: r["depth_micro"])
    assert deepest["gap"] == 4
    assert [r["gap"] for r in rows if r["is_boundary"]] == [4]


def test_uniform_document_has_no_boundaries(spark):
    rows = _gaps(spark, "word " * 40)
    assert rows, "uniform doc still has gaps"
    assert all(r["sim2_micro"] == 1_000_000 for r in rows)
    assert all(r["depth_micro"] == 0 for r in rows)
    # zero-variance depth: strict Hearst cutoff marks nothing
    assert not any(r["is_boundary"] for r in rows)


def test_short_document_emits_nothing(spark):
    assert _gaps(spark, "only three words") == []
    assert _gaps(spark, "") == []


def test_segments_partition_the_gap_range(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=TWO_TOPIC)])
    gaps = texttiling_gaps(df, w=4, k=2)
    segs = sorted(
        texttiling_segments(gaps).collect(), key=lambda r: r["seg_id"]
    )
    assert [s["seg_id"] for s in segs] == [0, 1]
    # boundary at gap 4 splits [1..3] | [4..7]
    assert (segs[0]["start_gap"], segs[0]["end_gap"]) == (1, 3)
    assert (segs[1]["start_gap"], segs[1]["end_gap"]) == (4, 7)
    assert segs[0]["n_gaps"] + segs[1]["n_gaps"] == 7


def test_registry_queries(spark):
    import __spark_entry__ as e

    q = e.queries()
    g = q["texttiling_gaps"](spark, "/root/testdata/sf0.001")
    assert g.count() > 0
    s = q["texttiling_segments"](spark, "/root/testdata/sf0.001")
    assert 0 < s.count() <= g.count()

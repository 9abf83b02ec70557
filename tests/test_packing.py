"""pack_sequences: hand-checked chunking, conservation invariants, the
partitioned production path, and packing_stats."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.packing import pack_sequences, packing_stats

pytestmark = pytest.mark.spark


def _docs(spark):
    # token counts: d0=3, d1=5, d2=2, d3=4  (total 14; L=4 -> 4 sequences)
    rows = [
        Row(doc_id=0, text="a b c"),
        Row(doc_id=1, text="d e f g h"),
        Row(doc_id=2, text="i j"),
        Row(doc_id=3, text="k l m n"),
    ]
    return spark.createDataFrame(rows)


def test_hand_checked_layout(spark):
    got = sorted(
        map(tuple, pack_sequences(_docs(spark), "doc_id", "text", 4).collect())
    )
    # stream: d0[0..3) d1[3..8) d2[8..10) d3[10..14), cuts at 4,8,12
    assert got == [
        (0, 0, 0, 0, 3),  # d0 fully in seq0 at offset 0
        (1, 0, 0, 3, 1),  # d1 first token completes seq0
        (1, 1, 1, 0, 4),  # d1 rest fills seq1 exactly
        (2, 2, 0, 0, 2),  # d2 opens seq2
        (3, 2, 0, 2, 2),  # d3 straddles the seq2|seq3 cut
        (3, 3, 2, 0, 2),
    ]


def test_conservation_invariants(spark):
    """Per-doc segments sum to the doc's token count; every sequence but
    the last is exactly full; offsets chain contiguously."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"t{j}" for j in range((i * 7) % 13 + 1)))
         for i in range(50)]
    )
    packed = pack_sequences(docs, "doc_id", "text", 16)
    per_doc = {
        r["doc_id"]: r["s"]
        for r in packed.groupBy("doc_id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    want = {r["doc_id"]: len(r["text"].split()) for r in docs.collect()}
    assert per_doc == want
    fills = {
        r["seq_id"]: r["f"]
        for r in packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("f")).collect()
    }
    last = max(fills)
    assert all(v == 16 for k, v in fills.items() if k != last)
    assert 0 < fills[last] <= 16


def test_partitioned_path_packs_each_group_independently(spark):
    docs = _docs(spark).withColumn(
        "shard", (pytest.importorskip("pyspark.sql.functions").col("doc_id") % 2)
    )
    packed = pack_sequences(docs, "doc_id", "text", 4, partition_cols=["shard"])
    rows = {(r.shard, r.doc_id, r.seq_id) for r in packed.collect()}
    # shard 0: d0(3)+d2(2) -> seqs 0,1 ; shard 1: d1(5)+d3(4) -> seqs 0,1,2
    assert rows == {
        (0, 0, 0), (0, 2, 0), (0, 2, 1),
        (1, 1, 0), (1, 1, 1), (1, 3, 1), (1, 3, 2),
    }


def test_partitioned_window_no_global_sort(spark):
    """The production (sharded) path must not move everything to one
    partition: the window exchange hashes on the shard column."""
    from tests.test_plans import plan_of

    import pyspark.sql.functions as F

    docs = _docs(spark).withColumn("shard", F.col("doc_id") % 2)
    plan = plan_of(
        pack_sequences(docs, "doc_id", "text", 4, partition_cols=["shard"])
    )
    assert "hashpartitioning(shard" in plan


def test_stats(spark):
    packed = pack_sequences(_docs(spark), "doc_id", "text", 4)
    r = packing_stats(packed, 4).head()
    assert r.n_sequences == 4 and r.n_segments == 6
    # seq fills: 4,4,4,2 -> mean 14/16
    assert r.mean_fill == 0.875
    # docs 1 and 3 split -> 2/4
    assert r.pct_docs_split == 0.5


def test_stats_sharded(spark):
    """Sharded stats must roll up per (shard, seq_id), not merge
    same-numbered sequences across shards (ADVICE r3)."""
    import pyspark.sql.functions as F

    docs = _docs(spark).withColumn("shard", F.col("doc_id") % 2)
    packed = pack_sequences(docs, "doc_id", "text", 4, partition_cols=["shard"])
    r = packing_stats(packed, 4, partition_cols=["shard"]).head()
    # shard 0: seqs fill 4,1 (d0=3+d2 first 1? no: d0(3)+d2(2)=5 -> 4,1)
    # shard 1: d1(5)+d3(4)=9 -> 4,4,1; total 5 sequences, 7 segments
    assert r.n_sequences == 5 and r.n_segments == 7
    assert r.mean_fill == round((1.0 + 0.25 + 1.0 + 1.0 + 0.25) / 5, 6)
    # split docs: shard0 d2 (straddles 4-cut), shard1 d1 and d3 -> 3/4
    assert r.pct_docs_split == 0.75
    assert r.mean_fill <= 1.0


def test_stats_sharded_without_partition_cols_raises(spark):
    import pyspark.sql.functions as F

    docs = _docs(spark).withColumn("shard", F.col("doc_id") % 2)
    packed = pack_sequences(docs, "doc_id", "text", 4, partition_cols=["shard"])
    with pytest.raises(ValueError, match="id column"):
        packing_stats(packed, 4)


def test_validation(spark):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_docs(spark), "doc_id", "text", 0)
    with pytest.raises(ValueError, match="partition_cols"):
        packing_stats(
            pack_sequences(_docs(spark), "doc_id", "text", 4),
            4,
            partition_cols=["nope"],
        )


def test_length_grouped_batches_hand_case(spark):
    from reader_spark.ops.packing import length_grouped_batches

    df = spark.createDataFrame(
        [("a", 0, 10), ("b", 0, 7), ("c", 0, 7), ("d", 0, 1), ("e", 1, 5)],
        "doc_id string, shard long, cost int",
    )
    got = {
        (r.shard, r.batch_id): (r.n_items, r.max_cost, r.sum_cost, r.padding_waste)
        for r in length_grouped_batches(
            df, "doc_id", "cost", batch_size=2, partition_cols=["shard"]
        ).collect()
    }
    # shard 0 sorted desc: a(10) b(7) | c(7) d(1); shard 1: e(5)
    assert got[(0, 0)] == (2, 10, 17, 3)
    assert got[(0, 1)] == (2, 7, 8, 6)
    assert got[(1, 0)] == (1, 5, 5, 0)


def test_batch_padding_compare_sorted_never_worse(spark):
    from reader_spark.ops.packing import batch_padding_compare

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.selectExpr(
        "doc_id", "CAST(doc_id % 8 AS LONG) AS shard", "n_chars AS cost"
    )
    rows = {
        r.strategy: r
        for r in batch_padding_compare(
            df, "doc_id", "cost", batch_size=8, partition_cols=["shard"]
        ).collect()
    }
    lg, ido = rows["length_grouped"], rows["id_ordered"]
    assert lg.sum_cost == ido.sum_cost  # same items
    assert lg.padded_cost <= ido.padded_cost  # sorting only helps
    assert lg.waste_frac <= ido.waste_frac


def ref_next_fit(items, capacity):
    out, bin_id, fill, first = [], 0, 0, True
    for ident, c in items:
        if first:
            fill, first = c, False
        elif fill + c <= capacity:
            fill += c
        else:
            bin_id += 1
            fill = c
        out.append((ident, bin_id, fill, c > capacity))
    return out


def test_pack_next_fit_matches_reference_and_respects_capacity(spark):
    from reader_spark.ops.packing import pack_next_fit

    import random

    rng = random.Random(7)
    rows = [
        (i, i % 3, rng.choice([5, 60, 120, 700]))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard long, cost int")
    got = pack_next_fit(df, "doc_id", "cost", 128, ["shard"])
    by_shard = {}
    for r in got.collect():
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        items = [(r.doc_id, r.cost) for r in rs]
        want = ref_next_fit(items, 128)
        assert [(r.doc_id, r.bin_id, r.bin_fill, r.oversize) for r in rs] == want
    # bins never exceed capacity unless the bin is a single oversize item
    import collections

    fills = collections.defaultdict(int)
    members = collections.defaultdict(list)
    for r in got.collect():
        fills[(r.shard, r.bin_id)] += r.cost
        members[(r.shard, r.bin_id)].append(r)
    for k, f in fills.items():
        if f > 128:
            assert len(members[k]) == 1 and members[k][0].oversize


def test_pack_next_fit_requires_partition_cols(spark):
    import pytest as _pytest

    from reader_spark.ops.packing import pack_next_fit

    df = spark.createDataFrame([(1, 1)], "doc_id long, cost int")
    with _pytest.raises(ValueError):
        pack_next_fit(df, "doc_id", "cost", 10, [])

"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in `explain` output — column pruning to the scan, predicate pushdown,
broadcast joins for small dims, partial (map-side) aggregation."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def docs_with_extras(spark, tmp_path_factory):
    """A docs table with extra fat columns to prove pruning drops them."""
    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows

    path = str(tmp_path_factory.mktemp("plans") / "docs")
    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] != "pdf-two-column"]
    df = docs_from_rows(spark, rows).withColumn(
        "fat_unused_column", F.repeat(F.lit("x"), 1000)
    )
    df.write.parquet(path)
    return path


def test_payload_stage_prunes_columns(spark, docs_with_extras):
    """The extraction scan must read ONLY doc_id+spans — a scan that reads
    all columns for a 2-column projection is wrong."""
    from reader_spark.spark.job import with_payload

    docs = spark.read.parquet(docs_with_extras)
    plan = plan_of(with_payload(docs))
    assert "fat_unused_column" not in plan.split("ReadSchema")[1].split("\n")[0]
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "doc_id" in read_schema and "spans" in read_schema


def test_pricing_summary_pushes_filter(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_top_revenue_orders_no_forced_fact_broadcast(spark):
    """`orders` scales linearly with SF; a forced broadcast hint would OOM
    executors at 100x. The logical plan must carry NO broadcast hint — if
    the physical plan broadcasts anyway at this tiny SF, that's AQE's
    size-based call, which correctly flips to a shuffle join at scale."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["top_revenue_orders"](spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    assert "strategy=broadcast" not in optimized


def test_part_brand_revenue_no_forced_fact_broadcast(spark):
    """part/supplier also grow with SF — same no-hint contract."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["part_brand_revenue"](spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    assert "strategy=broadcast" not in optimized


def test_dedup_exact_partial_agg(spark):
    """Exact dedup must map-side combine: two HashAggregate phases around
    ONE shuffle of (hash, partial) — never full-text rows."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["dedup_exact"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "xxhash64" in plan  # shuffle key is the 64-bit hash, not the text


def test_profile_join_broadcasts(spark):
    from reader_spark.spark.dims import join_domain_profiles

    urls = spark.createDataFrame([("https://a.amazon.com/x",)], "url string")
    profiles = spark.createDataFrame([("amazon.com", 1)], "domain string, t int")
    plan = plan_of(join_domain_profiles(urls, profiles))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_whole_stage_codegen_on_native_ops(spark):
    """URL-key + content-filter chains must stay inside WholeStageCodegen
    (no Python boundary)."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["url_keys"](spark, SF_DIR))
    # In formatted explain, '*' marks operators inside WholeStageCodegen.
    assert "* Project" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_token_counts_prunes_to_two_columns(spark):
    """token_counts must scan only (doc_id, text) of the 5-column table."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["token_counts"](spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_gopher_rules_stays_jvm_side(spark):
    """The quality-rule battery must be pure native columns: no Python
    boundary, no shuffle — a scan-bound map at any scale."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["gopher_rules"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_embedding_bucketed_no_cartesian(spark):
    """Candidate generation must be a bucket equi-join, never a cross
    product."""
    from reader_spark.ops.dedup import embedding_near_pairs_bucketed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(embedding_near_pairs_bucketed(emb))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_shards_partitioned_packing_no_global_sort(spark):
    """With partition_cols set, packing shuffles BY the partition key (hash
    exchange), never into a single partition — the at-scale contract."""
    from pyspark.sql import functions as F

    from reader_spark.ops.textstats import shard_by_token_budget

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    plan = plan_of(
        shard_by_token_budget(docs, budget=5000, partition_cols=("lang",))
    )
    assert "SinglePartition" not in plan
    assert "hashpartitioning(lang" in plan


def test_ivf_index_partition_pruning(spark, tmp_path_factory):
    """The IVF scale path: the assigned corpus written PARTITIONED BY cell
    must prune to the probed cells on read (PartitionFilters on the scan)."""
    from reader_spark.ops.ann import ivf_assign, train_ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = train_ivf_centroids(emb, n_cells=4, iters=1)
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_assign(emb, centroids).write.partitionBy("cell").parquet(path)

    index = spark.read.parquet(path)
    probe = index.where(F.col("cell") == 2)
    plan = plan_of(probe)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1].split("\n")[0]
    # pruned read returns exactly that cell's vectors
    cells = {r["cell"] for r in probe.select("cell").distinct().collect()}
    assert cells == {2}


def test_ivfadc_search_prunes_index_partitions(spark, tmp_path_factory):
    """Searching the persisted IVFADC index must show cell partition
    pruning potential: the probe filter lands on the partition column via
    the equi-join, and the scan reads only (corpus_id, codes, cell) — the
    float corpus is absent from the plan entirely."""
    from reader_spark.ops.ann import (
        ivfadc_encode,
        ivfadc_search,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = train_ivf_centroids(emb, n_cells=4, iters=1)
    codebooks = train_pq_codebooks(emb, m=8, k=8, iters=1)
    path = str(tmp_path_factory.mktemp("ivfadc") / "codes")
    ivfadc_encode(emb, centroids, codebooks).write.partitionBy("cell").parquet(path)

    plan = plan_of(
        ivfadc_search(
            spark.read.parquet(path), emb.limit(3), centroids, codebooks,
            k=5, nprobe=2,
        )
    )
    # one parquet scan of the index; embeddings.parquet appears only as
    # the query side
    assert plan.split("\n\n")[0].count("Scan parquet") == 2
    schemas = plan.split("ReadSchema: struct<")
    index_schema = next(s for s in schemas[1:] if "codes" in s.split(">")[0])
    assert "corpus_vec" not in index_schema.split(">")[0]


def test_line_dedup_no_cartesian_and_partial_agg(spark):
    """First-occurrence election must be a partial-aggregated groupBy and
    an equi-join back — never a cartesian product."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["line_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan or "partial_count" in plan


def test_lm_perplexity_capped_vocab_broadcasts(spark):
    """With max_vocab set, the LM dim join must be a broadcast — that is
    the path that removes the skewed token shuffle."""
    from reader_spark.ops.textstats import unigram_lm_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(unigram_lm_scores(docs, max_vocab=1000))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_zorder_is_scan_local_after_minmax(spark):
    """z-key computation must add NO shuffle beyond the 1-row min/max
    broadcast: no Exchange hashpartitioning over the fact rows."""
    from reader_spark.ops.zorder import zorder_key

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    plan = plan_of(zorder_key(events, "user_id", "ts_us", bits=8))
    assert "hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


def test_incremental_dedup_band_equi_join(spark):
    """Candidate generation joins on (band_id, band_hash) — an equi-join,
    not a cartesian pairing of the batches."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["incremental_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "band_hash" in plan


def test_incremental_dedup_index_skips_old_resketch(spark, tmp_path_factory):
    """With a prebuilt on-disk index, the old corpus must NOT be
    re-shingled/re-minhashed: no scan of the old corpus source at all,
    and the index scan feeding the candidate join prunes to
    (doc, band_hashes) — shingle_set stays on disk until the verify
    join needs it."""
    from reader_spark.ops.dedup import build_band_index, incremental_near_dups

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    path = str(tmp_path_factory.mktemp("bandidx") / "index")
    build_band_index(old, "doc_id", "text").write.parquet(path)

    plan = plan_of(
        incremental_near_dups(
            None, new, "doc_id", "text", index=spark.read.parquet(path)
        )
    )
    tree = plan.split("\n\n")[0]
    # exactly 4 scans: index bands leg + index shingles leg + the new
    # batch twice (banding leg + verify leg) — the OLD corpus: zero
    assert tree.count("Scan parquet") == 4
    assert plan.count("documents.parquet") == 2  # new batch's two legs
    # the bands leg reads only doc+band_hashes (ReadSchema pruned)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    index_schemas = sorted(s for s in schemas if "band_hashes" in s or "shingle_set" in s)
    assert any("band_hashes" in s and "shingle_set" not in s for s in index_schemas), schemas


def test_funnel_stage_joins_are_keyed(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["funnel_conversion"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # per-stage min is partially aggregated before the shuffle
    assert "partial_min" in plan


def test_containment_inverted_index_no_cartesian(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["containment_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # intersection counts map-side combined


def test_tfidf_single_explode_partial_agg(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["tfidf_top_terms"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    # at most ONE tokenize+explode: tf is checkpointed, so the
    # doc-frequency branch reads the checkpoint instead of re-running the
    # corpus explode (0 when the checkpoint boundary hides it entirely)
    assert tree.count("Generate") <= 1
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan  # corpus-size dim is broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_novelty_no_doc_pairing(spark):
    """Novelty must be linear: shingle join only, no doc-doc join."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["novelty_scores"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan  # first-seen via map-side combined min


def test_sharded_packing_partitions_by_shard(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["sequence_packing_sharded"](spark, SF_DIR))
    assert "hashpartitioning(shard" in plan


def test_semdedup_cell_equijoin_no_cartesian(spark):
    """SemDeDup's within-cell prune must be a cell equi-join — never an
    all-pairs cross product (the paper's own scale argument)."""
    from reader_spark.ops.semdedup import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [[float(i == j) for j in range(64)] for i in range(4)]
    plan = plan_of(semdedup(emb, cents, tau=0.35))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_logit_scan_bound(spark):
    """Classifier inference must stay native: no Python boundary, no
    shuffle — a pure scan-bound map at any scale."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["quality_logit"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_dsir_model_dim_broadcast_joined(spark):
    """The 256-row DSIR model must reach doc scoring as a broadcast join —
    never a shuffle of the per-doc counts against the dim."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["dsir_weights"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_winnow_no_global_sort(spark):
    """Winnowing's selection window partitions by doc — a global Sort
    (single-partition window) must not appear."""
    from reader_spark.ops.winnow import winnow_fingerprints

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(winnow_fingerprints(docs, "doc_id", "text"))
    tree = plan.split("\n\n")[0]
    assert "Window" in plan
    # a partition-less window compiles to Exchange SinglePartition
    assert "SinglePartition" not in tree


def test_drift_windows_partition_by_key(spark):
    """KS/PSI windows partition by the drift key — no single-partition
    exchange anywhere in the tree."""
    import __spark_entry__ as entrymod

    for q in ("value_ks_drift", "value_psi_drift"):
        plan = plan_of(entrymod.queries()[q](spark, SF_DIR))
        tree = plan.split("\n\n")[0]
        assert "SinglePartition" not in tree, q


def test_hard_negatives_bucketed_no_nested_loop(spark):
    """The 100 TB hard-negative path must get its candidates from a bucket
    EQUI-join — the brute twin's label-inequality theta-join plans a
    BroadcastNestedLoopJoin, which is exactly what this variant removes."""
    from reader_spark.ops.ann import md5_plane_weights
    from reader_spark.ops.negatives import hard_negatives_bucketed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for multiprobe in (False, True):
        plan = plan_of(
            hard_negatives_bucketed(
                emb.where(F.col("vec_id") < 20),
                emb,
                weights=md5_plane_weights(dim=64, planes=5),
                multiprobe=multiprobe,
            )
        )
        assert "BroadcastNestedLoopJoin" not in plan, multiprobe
        assert "CartesianProduct" not in plan, multiprobe


def test_doc_sim_topk_bucketed_no_all_pairs(spark):
    """Bucketed text similarity: feature-hash vectors join on the LSH
    bucket key only — no cross product, no driver-side query fetch."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["doc_sim_topk_bucketed"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_heavy_hitters_verify_pass_is_broadcast(spark):
    """The exact-count pass joins the full stream against the tiny
    candidate set: that join must be a broadcast semi-join (the stream is
    never shuffled by key for candidate filtering), and the final count
    must show partial aggregation."""
    from reader_spark.ops.heavy import heavy_hitters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tokens = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        )
    ).where(F.col("token") != "")
    plan = plan_of(heavy_hitters(tokens, "token", k=50))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    assert "HashAggregate" in tree


def test_media_dedup_never_shuffles_blobs(spark):
    """Only the digest/bytes/kind projection reaches the exchange — the
    binary content column must be projected away before any shuffle (at
    100 TB the media column is the dataset; the exchange moves 16-byte
    digests)."""
    from reader_spark.ops.multimodal import media_dedup

    media = spark.range(100).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("payload-"), (F.col("id") % 7).cast("string")), "UTF-8").alias("content"),
    )
    plan = plan_of(media_dedup(media))
    tree = plan.split("\n\n")[0]
    assert "Exchange" in tree  # the digest groupBy does shuffle...
    detail = plan.split("\n\n", 1)[1] if "\n\n" in plan else plan
    # ...but no exchange input carries the content column: every Exchange
    # block's input attributes must be digest-side only
    for block in detail.split("\n\n"):
        if block.strip().startswith("(") and "Exchange" in block.splitlines()[0]:
            assert "content#" not in block, block


def test_passage_chunks_is_shuffle_free(spark):
    """Chunking is a pure per-row map: the plan must contain no Exchange
    at all — at 100 TB this op must pipeline inside the scan stage."""
    from reader_spark.ops.chunks import passage_chunks

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(passage_chunks(docs, "doc_id", "text"))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_script_profile_is_scan_bound(spark):
    """One projection over the scan: no Exchange, no aggregate."""
    from reader_spark.ops.textstats import script_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(script_profile(docs, "doc_id", "text"))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "HashAggregate" not in tree


def test_repetition_profile_no_self_join_no_global_window(spark):
    """Repetition rules are ONE key-bounded (doc, n, gram) groupBy: no
    cartesian/nested-loop join, and no single-partition window (the
    row_number partitions by (doc, n))."""
    from reader_spark.ops.textstats import repetition_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(repetition_profile(docs, "doc_id", "text"))
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "SinglePartition" not in plan


def test_interleaved_pairing_one_keybounded_exchange(spark):
    """caption_pairs / interleave_profile over span rows: the window and
    the rollup both partition by doc id, so the plan needs exactly ONE
    hash exchange on the id — never a global sort or a second shuffle."""
    from reader_spark.ops.multimodal import caption_pairs, interleave_profile

    spans = spark.createDataFrame(
        [(1, 0, "text", "t", None)],
        "doc_id long, ord int, kind string, text string, media_ref string",
    )
    for df in (caption_pairs(spans), interleave_profile(spans)):
        tree = plan_of(df).split("\n\n")[0]
        assert tree.count("Exchange") == 1, tree
        assert "SinglePartition" not in tree


def test_bigram_lm_no_cartesian_scalar_dim_broadcast(spark):
    """Bigram LM scoring: count groupBys + key-bounded equi-joins; the
    only nested-loop is the 1-row vocabulary dim broadcast (same scalar
    pattern as lm_perplexity) — never a CartesianProduct."""
    from reader_spark.ops.textstats import bigram_lm_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(bigram_lm_scores(docs, "doc_id", "text"))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastExchange" in tree


def test_phash_neardup_no_all_pairs(spark):
    """Perceptual near-dup candidates come from the 4x16 band equi-join —
    never a cartesian/nested-loop over media rows."""
    from reader_spark.ops.multimodal import phash_neardup

    media = spark.range(50).select(
        F.col("id").alias("media_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.col("id") % 7 + i).cast("double"),
        ).alias("thumb_8x8"),
    )
    tree = plan_of(phash_neardup(media)).split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_audio_neardup_no_all_pairs(spark):
    """Audio fingerprint near-dup candidates come from the pigeonhole
    (band_id, band_value) equi-join — never a cartesian/nested-loop over
    clips, and fingerprinting itself stays JVM-side (no Python eval)."""
    from reader_spark.ops.audio import audio_neardup

    clips = spark.range(50).select(
        F.col("id").alias("media_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda f: F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda b: (F.col("id") % 5 + f * 3 + b).cast("double"),
            ),
        ).alias("frames"),
    )
    tree = plan_of(audio_neardup(clips)).split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "ArrowEvalPython" not in tree and "BatchEvalPython" not in tree


def test_redact_spans_is_scan_bound(spark):
    """Span-level PII redaction is a pure per-row rewrite of the payload
    array: no shuffle, no explode-side Exchange, no Python eval — it rides
    the scan it's applied to."""
    from reader_spark.ops.multimodal import redact_spans

    docs = spark.range(20).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("a@b.co").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    plan = plan_of(redact_spans(docs))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_strip_boilerplate_spans_equi_join_only(spark):
    """The deletion join must be an equi-join on (domain, text) — never a
    cartesian/nested-loop — and reassembly shuffles keyed by the doc."""
    from reader_spark.ops.lines import boilerplate_spans, strip_boilerplate_spans

    docs = spark.range(30).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("domain"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("nav bar").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("order"),
            )
        ).alias("spans"),
    )
    boiler = boilerplate_spans(docs, domain_col="domain", min_frac=0.5)
    plan = plan_of(strip_boilerplate_spans(docs, boiler, domain_col="domain"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_truncate_and_render_are_scan_bound(spark):
    """Budget truncation + sample rendering are pure per-row column math:
    no shuffle, no Python eval — they ride the scan."""
    from reader_spark.ops.multimodal import (
        render_interleaved_sample,
        truncate_spans_to_budget,
    )

    docs = spark.range(20).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("a b c").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("order"),
            ),
            F.struct(
                F.lit("image").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.lit("img://x").alias("media_ref"),
                F.lit(1).alias("order"),
            ),
        ).alias("spans"),
    )
    plan = plan_of(
        render_interleaved_sample(truncate_spans_to_budget(docs, budget=100))
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_caption_alignment_no_cartesian_image_tower_rides_scan(spark):
    """The image tower and the score are per-row; the only exchanges key
    on the pair: no CartesianProduct, no corpus-side broadcast nested
    loop."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["caption_alignment"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_binary_hamming_candidate_stage_no_exchange(spark):
    """Sign-bit Hamming candidate generation is a scan + TakeOrdered:
    no hash-partition exchange anywhere before the k-row rerank."""
    from reader_spark.ops.ann import binary_hamming_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    plan = plan_of(binary_hamming_topk(emb, qv))
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan


def test_token_entropy_two_keyed_aggregates(spark):
    """Both aggregates are map-side combined (partial_count/partial_sum
    before the exchange) and key on (doc, token) then doc — never a
    single-partition window."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["token_entropy"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_decontaminate_bloom_bits_ride_one_broadcast_row(spark):
    """Phase 1's Bloom bitset joins as a 1-row broadcast (the documented
    literal-dim pattern); the exact confirm join broadcasts the benchmark
    side. The corpus side must never hash-exchange its gram explosion
    before the membership check."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["decontaminate_bloom"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    # the gram rows reach the bloom check without a hash repartition:
    # every hashpartitioning in the plan keys on doc_id (the final
    # distinct + per-doc rollups), never on the gram column
    for frag in plan.split("hashpartitioning(")[1:]:
        key = frag.split(",")[0]
        assert "gram" not in key, f"gram-keyed exchange: {key}"


def test_curriculum_order_no_global_window(spark):
    """Ranking windows key on the bucket; the offsets dim broadcasts.
    A SinglePartition window here would serialize the corpus."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["curriculum_order"](spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_blocklist_filter_word_dim_broadcasts(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["blocklist_filter"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_zipf_fit_no_single_partition_window(spark):
    """VERDICT r4 #2: the full-vocabulary rank must come from
    scalable_rank (range buckets + partitioned row_number + broadcast
    offsets) — a global Window.orderBy would serialize a 1e8-1e9-term
    vocabulary onto one partition at corpus scale."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["zipf_fit"](spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_scalable_rank_matches_global_window(spark):
    """scalable_rank == global row_number, bit for bit, on a frame that
    spans many range buckets."""
    from pyspark.sql import Window

    from reader_spark.ops.rank import scalable_rank

    df = spark.range(0, 997).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("v")
    )
    got = scalable_rank(df, [F.desc("k"), F.asc("v")], buckets=7)
    w = Window.orderBy(F.desc("k"), F.asc("v"))
    want = df.withColumn("rank", F.row_number().over(w).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_unigram_max_vocab_cut_is_take_ordered(spark):
    """The max_vocab top-K in the unigram LM compiles to
    TakeOrderedAndProject (distributed partial top-k), not a global
    window rank over the whole vocabulary."""
    from reader_spark.ops.textstats import unigram_lm_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(unigram_lm_scores(docs, max_vocab=100))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan.split("\n\n")[0]


def test_sentence_spans_apply_hash_keyed_no_window(spark):
    """C4 apply: election is a partial-aggregated groupBy on the span
    hash, survivor marking an equi-join back on it — no cartesian, no
    window function, and no sentence text in any shuffle key (the only
    join/group keys are the 32-hex hash, the doc id, and int indices)."""
    from reader_spark.ops.lines import sentence_spans_apply

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(
        sentence_spans_apply(docs, pattern=r"\S+( \S+){0,3}")
    )
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "Window" not in tree
    assert "partial_min" in plan or "partial_count" in plan


def test_justext_windows_partition_by_doc(spark):
    """jusText's revision windows must key on doc_id (bounded by
    paragraphs-per-page) — never a single-partition global window."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["justext_classify"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_boilerpipe_window_partition_by_doc(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["boilerpipe_classify"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_c4_page_clean_one_shuffle_partial_agg(spark):
    """C4 page gates fold in ONE map-side-combined groupBy(doc_id): a
    single hash exchange, partial aggregation before it, no window."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["c4_page_clean"](spark, SF_DIR))
    # formatted explain lists each node in the tree AND a details
    # section; count tree occurrences only
    assert plan.count("+- Exchange") == 1
    assert "partial" in plan.lower()
    assert "Window" not in plan


def test_table_cells_scan_local(spark):
    """Markdown table -> cells is a pure map: no shuffle at all."""
    from pyspark.sql import Row

    from reader_spark.ops.tables import table_cells

    spans = spark.createDataFrame(
        [Row(doc_id=1, text="| k |\n| --- |\n| v |")]
    )
    assert "Exchange" not in plan_of(table_cells(spans))


def test_anchor_corpus_partial_agg_no_window(spark):
    """Two-level aggregation: pair counts partial-agg before the
    exchange; no window anywhere (mega-linked pages absorb map-side)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["anchor_corpus"](spark, SF_DIR))
    assert "Window" not in plan
    assert "partial" in plan.lower()


def test_ranking_metrics_keyed_on_query(spark):
    """Both folds key on the query id; no single-partition stage."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["ranking_metrics"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(query_id" in plan


def test_outline_windows_partition_by_doc(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["outline_edges"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_crawl_delta_no_payload_in_exchange(spark):
    """The full-outer join shuffles digests + ids only."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["crawl_delta"](spark, SF_DIR))
    for line in plan.splitlines():
        if "Exchange" in line and "text#" in line:
            raise AssertionError(f"payload column in exchange: {line}")


def test_cetr_one_doc_exchange(spark):
    """CETR's kernel taps (ordered window) and mean cut (agg window)
    share ONE hashpartitioning(doc_id) exchange; features ride the scan."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["cetr_classify"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_sitemap_parse_pure_map(spark):
    """Sitemap entry extraction rides the scan: no Exchange at all."""
    from pyspark.sql import Row

    from reader_spark.ops.sitemaps import parse_sitemaps

    df = spark.createDataFrame(
        [Row(sitemap_url="s", xml="<urlset><url><loc>u</loc></url></urlset>")]
    )
    plan = plan_of(parse_sitemaps(df))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_recrawl_schedule_no_single_partition(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["recrawl_schedule"](spark, SF_DIR))
    assert "SinglePartition" not in plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdx_index_pure_map(spark):
    """SURT key + digest ride the scan — no Exchange."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["cdx_index"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_unigram_encode_single_word_exchange(spark):
    """Viterbi DP is a within-row fold over the DISTINCT-word dim: the
    only exchange is the distinct's hashpartitioning on word."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["unigram_encode"](spark, SF_DIR))
    assert "SinglePartition" not in plan.split("\n\n")[0]
    assert "hashpartitioning(word" in plan


def test_unigram_em_partial_aggs(spark):
    """EM counts fold map-side before both shuffles; the normalizer is
    the documented 1-row broadcast dim."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["unigram_em_counts"](spark, SF_DIR))
    assert "partial_count" in plan or "partial_sum" in plan
    assert "hashpartitioning(piece" in plan


def test_hilbert_scan_local_after_minmax_dim(spark):
    """Hilbert key is scan-local: the only exchange feeds the 1-row
    min/max dim (broadcast); no window, no sort in the key compute."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["hilbert_events"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "BroadcastExchange" in tree or "broadcast" in tree.lower()


def test_ensemble_stays_on_doc_key(spark):
    """All three arms window on doc_id and the verdict joins key on
    (doc_id, par_no): no single-partition stage, no nested-loop join."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["ensemble_extract"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "SinglePartition" not in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_politeness_slots_host_keyed(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["politeness_slots"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "SinglePartition" not in tree
    assert "hashpartitioning(host" in plan


def test_robots_parse_host_keyed(spark):
    """Group assignment windows on host; the agent attach self-join
    keys on (host, group_id) — never a single-partition stage."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["robots_parse"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "SinglePartition" not in tree
    assert "CartesianProduct" not in tree


def test_cdx_merge_partial_agg_key_only(spark):
    """Merge folds map-side before ONE (urlkey, digest) exchange —
    payload bytes never shuffle."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["cdx_merge"](spark, SF_DIR))
    assert "partial" in plan.lower()
    assert "hashpartitioning(urlkey" in plan


def test_wordpiece_encode_single_word_exchange(spark):
    """The greedy WordPiece fold is within-row over the DISTINCT-word
    dim: the only exchange is the distinct's hashpartitioning on word;
    no Python UDF anywhere."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["wordpiece_encode"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "SinglePartition" not in tree
    assert "hashpartitioning(word" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wordpiece_doc_tokens_partial_aggs(spark):
    """Doc rollup folds map-side; the encode runs once per DISTINCT
    word and joins back on the word key."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["wordpiece_doc_tokens"](spark, SF_DIR))
    assert "partial_sum" in plan or "partial_count" in plan
    assert "hashpartitioning(word" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_preference_pairs_partial_aggs_key_only(spark):
    """Pair election folds map-side (partial max/min of packed longs);
    response text never enters the exchange; no Python anywhere."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["preference_pairs"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "partial_max" in plan or "partial" in plan.lower()
    assert "hashpartitioning(prompt_id" in plan
    assert "SinglePartition" not in tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_best_of_n_prompt_partitioned_window(spark):
    """The per-prompt rank window partitions on prompt_id (bounded
    partitions) — NOT the global-window top-K antipattern."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["best_of_n"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "hashpartitioning(prompt_id" in plan
    assert "SinglePartition" not in tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dpo_render_single_prompt_keyed_shuffle_family(spark):
    """Join + groupBy both key on prompt_id; no Python, no
    single-partition stage, no broadcast-nested-loop blowup."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["dpo_render"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "hashpartitioning(prompt_id" in plan
    assert "SinglePartition" not in tree
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_coverage_no_single_partition_rank(spark):
    """The type ranking uses scalable_rank (range buckets), the cumsum a
    triangular self-join over the log2 dim — NO single-partition window
    anywhere in the tree, no Python."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["vocab_coverage"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "SinglePartition" not in tree
    assert "partial" in plan.lower()  # freq fold is map-side combined
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_schedule_broadcast_normalizer(spark):
    """The weight normalizer rides as a 1-row broadcast dim; the domain
    dim aggregation folds map-side."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["epoch_schedule"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parse_feeds_pure_map(spark):
    """Feed entry parsing rides the scan: block regexes + bounded explode
    + field projection — no Exchange anywhere in the parse."""
    from pyspark.sql import Row

    from reader_spark.ops.feeds import parse_feeds

    df = spark.createDataFrame([Row(feed_url="f", xml="<rss></rss>")])
    plan = plan_of(parse_feeds(df))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_feed_frontier_single_anti_join_no_bodies(spark):
    """The frontier is ONE left-anti equi-join on entry_id; the synth's
    groupBys aside, no exchange carries the xml column (feed bodies never
    shuffle after assembly)."""
    import __spark_entry__ as e

    plan = plan_of(e.queries()["feed_frontier"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "LeftAnti" in tree
    for line in tree.splitlines():
        if "Exchange hashpartitioning(entry_id" in line:
            assert "xml" not in line


def test_kneser_ney_plan_no_python_no_single_partition_windows(spark):
    """KN scoring: n-gram groupBys + key-bounded joins; the only
    SinglePartition exchange allowed is the 1-row type-count scalar;
    no Python, no WindowExec."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["kneser_ney_bigram"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 1  # 1-row type dim


def test_psl_literal_path_is_shuffle_free(spark):
    """Expression-sized PSL rule lists run entirely within-row (r6
    optimization): no join, no exchange, no explode — a pure scan-local
    projection."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["registrable_domains"](spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_psl_large_rule_list_broadcasts(spark):
    """Rule lists past expression size keep the broadcast-dim join; the
    candidate explode must not shuffle per candidate."""
    from reader_spark.ops.psl import registrable_domain

    hosts = spark.range(32).selectExpr("concat('h', id, '.example.com') AS host")
    rules = tuple((f"tld{i}", 0) for i in range(300)) + (("com", 0),)
    plan = plan_of(registrable_domain(hosts, rules=rules))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_linkage_blocking_is_hash_join_not_bnlj(spark):
    """Fellegi-Sunter candidate generation must be an equi-join on the
    block key — an accidental theta-join would be all-pairs."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["fs_linkage_pairs"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_conformal_rank_avoids_single_partition_window(spark):
    """The order statistic must come from scalable_rank (range buckets
    + partitioned row_number), never a global-order WindowExec."""
    import __spark_entry__ as entrymod

    plan = plan_of(
        entrymod.queries()["conformal_threshold"](spark, SF_DIR)
    )
    for line in plan.splitlines():
        if "Window" in line and "PartitionSpec" not in line:
            # every Window must be partitioned (by the range bucket)
            assert "partitionBy" not in line or "__rb" in line
    assert "BatchEvalPython" not in plan


def test_lpa_shuffles_are_node_keyed(spark):
    """Label propagation: no CartesianProduct, no Python, no windows —
    join + map-side-combined aggregate per round only."""
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["lpa_communities"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan

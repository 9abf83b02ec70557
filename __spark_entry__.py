"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship extraction over sf0.001 (documents wrapped into the
               interleaved docs(doc_id, spans) shape, full engine run).
queries()    — implemented operators from SURVEY.md §2 + the large-scale
               corpus ops (dedup / similarity / text analysis).
oracle_sql() — DuckDB-equivalent ANSI SQL for every SQL-expressible query
               (extraction and hash-sketch ops are rows-only checked).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.queries.tokenize import QUERIES as _TOKENIZE_QUERIES  # noqa: E402
from reader_spark.queries.evals import QUERIES as _EVAL_QUERIES  # noqa: E402
from reader_spark.queries.chat import QUERIES as _CHAT_QUERIES  # noqa: E402
from reader_spark.queries.preference import (  # noqa: E402
    QUERIES as _PREFERENCE_QUERIES,
)
from reader_spark.queries.accounting import QUERIES as _ACCOUNTING_QUERIES  # noqa: E402
from reader_spark.queries.code import QUERIES as _CODE_QUERIES  # noqa: E402
from reader_spark.queries.clustering import QUERIES as _CLUSTERING_QUERIES  # noqa: E402
from reader_spark.queries.bitext import QUERIES as _BITEXT_QUERIES  # noqa: E402
from reader_spark.queries.governance import QUERIES as _GOVERNANCE_QUERIES  # noqa: E402
from reader_spark.queries.audits import QUERIES as _AUDIT_QUERIES  # noqa: E402
from reader_spark.queries.arena import QUERIES as _ARENA_QUERIES  # noqa: E402
from reader_spark.queries.discovery import QUERIES as _DISCOVERY_QUERIES  # noqa: E402
from reader_spark.queries.mining import QUERIES as _MINING_QUERIES  # noqa: E402
from reader_spark.queries.ann import (  # noqa: E402
    _q_ann_topk,
    _q_binary_hamming_topk,
    _q_binary_recall_eval,
    _q_ann_lsh,
    _q_ann_lsh_md5,
    _q_ann_ivf_seeded,
    _q_pq_encode_md5,
    _q_pq_adc_topk_md5,
    _q_ivfadc_md5,
    _q_ann_ivf,
)
from reader_spark.queries.webgraph import QUERIES as _WEBGRAPH_QUERIES  # noqa: E402
from reader_spark.queries.lm import QUERIES as _LM_QUERIES  # noqa: E402
from reader_spark.queries.linkage import QUERIES as _LINKAGE_QUERIES  # noqa: E402
from reader_spark.queries.hosts import QUERIES as _HOSTS_QUERIES  # noqa: E402
from reader_spark.queries.interleaved import (  # noqa: E402
    _q_audio_hk_neardup,
    _q_caption_alignment,
    _q_caption_pairs,
    _q_interleave_profile,
    _q_interleaved_media_spans,
    _q_interleaved_pii_redact,
    _q_interleaved_sample_render,
    _q_media_phash_neardup,
    _q_multimodal_packing,
    _q_remove_duplicate_spans,
    _q_span_boilerplate_strip,
    _q_span_corruption,
    _q_span_kinds_full,
    _q_span_langid_profile,
    _q_ligature_fold,
    _q_outline_edges,
    _q_section_chunks,
    _q_table_cells,
    _q_typography_fold,
    _q_template_clusters,
)
from reader_spark.queries.curation import (  # noqa: E402
    _q_anchor_corpus,
    _q_weighted_minhash_md5,
    _q_weighted_jaccard_pairs,
    _q_pii_card_audit,
    _q_phrase_search,
    _q_text_date_profile,
    _q_corpus_recency,
    _q_bm25f_search,
    _q_lexicon_profile,
    _q_math_signals,
    _q_distinct_ngram_diversity,
    _q_semantic_decontaminate,
    _q_blocklist_filter,
    _q_boilerpipe_classify,
    _q_c4_page_clean,
    _q_cdx_index,
    _q_cdx_merge,
    _q_cetr_classify,
    _q_change_rate,
    _q_crawl_priority,
    _q_crawl_trap_signals,
    _q_url_templates,
    _q_content_aliases,
    _q_crawl_delta,
    _q_ensemble_extract,
    _q_justext_classify,
    _q_justext_headings,
    _q_justext_multilang,
    _q_ccnet_buckets,
    _q_curriculum_order,
    _q_politeness_slots,
    _q_recrawl_schedule,
    _q_robots_parse,
    _q_semantic_delta,
    _q_section_rollup,
    _q_sentence_spans_apply,
    _q_sitemap_ingest,
    _q_sentence_spans_dedup,
    _q_source_diversity,
    _q_refresh_allocation,
    _q_source_quality_shrunk,
    _q_text_clusters,
    _q_token_entropy,
    _q_tokenizer_fertility,
    _q_unimax_mix,
    _q_url_variant_clusters,
)
from reader_spark.queries.analytics import (  # noqa: E402  (registry entries)
    _q_event_bursts,
    _q_customer_nation_rollup,
    _q_hilbert_events,
    _q_customers_without_orders,
    _q_nation_market_share,
    _q_part_brand_revenue,
    _q_pricing_summary,
    _q_regional_supplier_volume,
    _q_returns_rollup,
    _q_top_revenue_orders,
)


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _docs_as_corpus(documents: DataFrame) -> DataFrame:
    """Wrap the plain-text documents table into the interleaved
    docs(doc_id, spans) input shape — JVM-side string assembly."""
    payload = F.concat(
        F.lit("<html><head><title>Document "),
        F.col("doc_id").cast("string"),
        F.lit('</title><meta name="description" content="source '),
        F.col("source"),
        F.lit('"></head><body><nav><a href="/">Home</a></nav><main><article><h1>Document '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></article></main><footer>footer</footer></body></html>"),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over sf0.001 documents."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, "/root/testdata/sf0.001", "documents")
    docs = _docs_as_corpus(documents)
    extracted = extract_dataframe(docs, num_partitions=8)
    return extracted.select(
        "doc_id", "spans", "markdown", "error_kind", "error_msg"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_extract_fixture_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule extraction over the deterministic fixture corpus, exploded
    to one row per output span (non-SQL-expressible -> rows-only check)."""
    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows, extract_dataframe

    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] != "pdf-two-column"]
    extracted = extract_dataframe(docs_from_rows(spark, rows), num_partitions=4)
    return extracted.select(
        "doc_id", F.explode_outer("spans").alias("span")
    ).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )


def _q_extract_documents_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL extraction pipeline over the documents table wrapped into the
    interleaved shape — and because the wrapper's page structure is fixed,
    the resulting span sequence is SQL-predictable: this oracle-checks the
    engine itself (cleaning, nav/footer strip, serialization, ordering)."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    docs = _docs_as_corpus(documents)
    extracted = extract_dataframe(docs)
    return extracted.select("doc_id", F.explode("spans").alias("span")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
    )


def _q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (W1 analogue): first event per user + counts."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("first_type"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: per stage, users whose
    FIRST occurrence of each step respects the order (min-timestamp
    conditional aggregation — one map-side-combined pass, no self-joins)."""
    events = _read(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return firsts.agg(
        F.count(F.col("t_view")).alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            )
        ).alias("n_view_click_buy"),
    )


def _q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted per
    later activity day (two-level aggregation over a self-derived dim —
    the min-date groupBy is map-side combined, the cohort join is narrow)."""
    events = _read(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohorts, "user_id")
        .withColumn("age_days", F.datediff("day", "cohort_day"))
        .groupBy("cohort_day", "age_days")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .where(F.col("age_days") <= 7)
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (streaming-style tumbling window, batch form)."""
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content (keeper = min doc_id)."""
    from reader_spark.ops.dedup import exact_dedup

    docs = _read(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text").select(
        "keeper_id", "dup_count"
    )


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.8)."""
    from reader_spark.ops.dedup import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


def _q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (hash-sketch: rows-only check)."""
    from reader_spark.ops.dedup import minhash_lsh_candidates, minhash_signatures

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    sigs = minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=64)
    return minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)


def _q_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates with the SQL-portable md5 hash family
    — the fully oracle-checked twin of minhash_lsh_candidates (same explode /
    groupBy(min) / band-bucket-join physical shape, value-for-value
    reproducible in DuckDB)."""
    from reader_spark.ops.dedup import minhash_lsh_candidates_portable

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return minhash_lsh_candidates_portable(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, rows_per_band=4
    )


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components (min-label propagation) over
    the Jaccard>=0.8 candidate pairs."""
    from reader_spark.ops.dedup import connected_components, ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return connected_components(pairs)


def _q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composite: extraction -> quality gate -> exact dedup ->
    MinHash-LSH near-dup clustering -> keeper corpus. Fully oracle-checked:
    with the portable md5 hash family every stage (markdown rendering, token
    and punct gates, dedup keepers, LSH clustering via recursive CTE) is
    reproduced value-for-value in DuckDB."""
    from reader_spark.spark.corpus_prep import CorpusPrepConfig, prepare_corpus

    documents = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    clean = prepare_corpus(
        _docs_as_corpus(documents),
        prep=CorpusPrepConfig(portable_hashes=True),
    )
    return clean.select("doc_id", "token_count", "punct_ratio")


def _q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via the BANDED production path (Manku-style
    block equi-join, no all-pairs scan; hash-sketch: rows-only check —
    simhash_banded_md5 is the fully-oracled twin)."""
    from reader_spark.ops.dedup import simhash, simhash_banded_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return simhash_banded_pairs(simhash(docs, "doc_id", "text"), max_hamming=3)


def _q_lang_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID (char-trigram regexp_count argmax) —
    the companion to the stopword-vote detector, fully oracle-checked."""
    from reader_spark.ops.textstats import detect_language_trigram_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_language_trigram_col(F.col("text")).alias("lang_trigram")
    )


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequencies, top-20 (explode -> map-side-combined
    count -> TakeOrdered): the vocabulary-stats primitive of a training-data
    pipeline."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("term"))
        .limit(20)
    )


def _q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-trigram fraction per document (SEO-spam / template /
    generation-loop signal), fully oracle-checked."""
    from reader_spark.ops.textstats import repetition_ratio_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", repetition_ratio_col(F.col("text")).alias("repetition_ratio")
    )


def _q_dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split labels (hash-bucket carve, stable
    under re-runs and corpus growth) — md5-portable family, oracle-checked
    per document."""
    from reader_spark.ops.sampling import split_column

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        split_column(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, portable=True
        ).alias("split"),
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish pretokenizer
    pieces (regexp_count, JVM-side) — the budget columns of a training-data
    pipeline."""
    from reader_spark.ops.textstats import bpe_token_count_col, token_count_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("ws_tokens"),
        bpe_token_count_col(F.col("text")).alias("bpe_tokens"),
    )


def _q_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the SQL-portable md5 token hash — the
    fully oracle-checked twin of simhash_near_pairs (identical physical
    shape: explode + 32 map-side-combined bit sums + all-pairs hamming)."""
    from reader_spark.ops.dedup import simhash, simhash_near_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    fp = simhash(docs, "doc_id", "text", bits=32, portable=True)
    pairs = simhash_near_pairs(fp, max_hamming=3)
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


def _q_simhash_banded_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-pair search (production equi-join path) over the
    SQL-portable md5 fingerprint. The oracle is the all-pairs SQL form —
    identical output by the block-pigeonhole guarantee, so a hash-green row
    here certifies the banded path end-to-end."""
    from reader_spark.ops.dedup import simhash, simhash_banded_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    fp = simhash(docs, "doc_id", "text", bits=32, portable=True)
    pairs = simhash_banded_pairs(fp, max_hamming=3, bits=32)
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


def _q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery (mean word length, alpha-word
    ratio, bullet/ellipsis line ratios, duplicate-line fraction,
    symbol-to-word ratio) + combined gate — all native columns."""
    from reader_spark.ops.textstats import gopher_quality_columns

    docs = _read(spark, sf_dir, "documents")
    return gopher_quality_columns(docs.select("doc_id", "text")).select(
        "doc_id",
        "n_tokens",
        "mean_word_len",
        "alpha_word_ratio",
        "bullet_line_ratio",
        "ellipsis_line_ratio",
        "dup_line_fraction",
        "symbol_word_ratio",
        "gopher_pass",
    )


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + masking over text with deterministic synthesized PII
    (the corpus itself is clean, so the query injects an email, an intl
    phone, and an IPv4 derived from doc_id — non-vacuous counts and a
    value-checked masked string)."""
    from reader_spark.ops.textstats import mask_pii_col, pii_count_columns

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 today"),
        ).alias("text"),
    )
    return pii_count_columns(with_pii).select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        "n_phones",
        mask_pii_col(F.col("text")).alias("masked"),
    )


def _q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: deterministic doc_id order, running
    token total, shard = exclusive-cumsum // budget — the manifest-sharding
    step before writing training data (window + floor, fully ANSI)."""
    from reader_spark.ops.textstats import shard_by_token_budget, token_count_col

    docs = _read(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    return shard_by_token_budget(with_tokens, budget=5000).select(
        "doc_id", "n_tokens", "shard"
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling flags (downsample dominant
    strata, keep rare ones) — md5-portable hash family, oracle-checked per
    document. The corpus-rebalancing primitive; scan-local, no shuffle."""
    from reader_spark.ops.sampling import stratified_sample_flag

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        stratified_sample_flag(
            F.col("doc_id"),
            F.col("lang"),
            {"en": 0.3, "de": 0.8},
            default_rate=1.0,
            portable=True,
        ).alias("kept"),
    )


def _q_domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality aggregation (docs, mean token count, Gopher
    pass rate per source) — the signal table for RefinedWeb-style
    domain filtering. One map-side-combined groupBy."""
    from reader_spark.ops.textstats import gopher_quality_columns

    docs = _read(spark, sf_dir, "documents")
    scored = gopher_quality_columns(docs.select("doc_id", "source", "text"))
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(
            F.avg(F.when(F.col("gopher_pass"), 1.0).otherwise(0.0)), 6
        ).alias("pass_rate"),
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count / punctuation ratio / stopword ratio per document."""
    from reader_spark.ops.textstats import (
        punct_ratio_col,
        stopword_ratio_col,
        token_count_col,
    )

    docs = _read(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        token_count_col(text).alias("token_count"),
        F.round(punct_ratio_col(text), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(text), 6).alias("stopword_ratio"),
    )


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality gate: keep docs passing token/punct thresholds
    (the filter composition a data pipeline would run before training)."""
    from reader_spark.ops.textstats import punct_ratio_col, token_count_col

    docs = _read(spark, sf_dir, "documents")
    text = F.col("text")
    return (
        docs.withColumn("token_count", token_count_col(text))
        .withColumn("punct_ratio", F.round(punct_ratio_col(text), 6))
        .where((F.col("token_count") >= 50) & (F.col("punct_ratio") < 0.05))
        .select("doc_id", "token_count", "punct_ratio")
    )


def _q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts and mean length over the documents table"""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


def _q_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint groups with the SQL-portable md5 family —
    fully oracle-checked twin of fingerprint_groups."""
    from reader_spark.ops.textstats import fingerprint_portable_col

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint_portable_col(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_docs"))
        .select("fp", "keeper_id", "n_docs")
    )


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint dedup groups (hash-based: rows-only check)."""
    from reader_spark.ops.textstats import fingerprint_col

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_docs"))
        .select("keeper_id", "n_docs")
    )


def _q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-based gap detection (30-min timeout), one row per
    user with session count — the batch form of stateful streaming sessions."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Fractional epoch seconds (cast timestamp -> double), matching DuckDB's
    # epoch(ts): truncating to whole seconds could flip a session boundary
    # when a gap straddles exactly 1800s at sub-second precision.
    epoch = F.col("ts").cast("timestamp").cast("double")
    gaps = events.withColumn(
        "new_session",
        F.when(
            epoch - F.lag(epoch, 1, float(-(10**9))).over(w) > 1800,
            1,
        ).otherwise(0),
    )
    return gaps.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def _q_detected_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID as a native column (ops/textstats)."""
    from reader_spark.ops.textstats import detect_language_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_language_col(F.col("text")).alias("detected_lang")
    )


def _q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC-style archive source end-to-end: documents synthesized into two
    web-archive files, read via binaryFile + record splitter, extracted by
    the fused pipeline — span rows must equal the SQL-predicted sequences
    (same oracle shape as extract_documents_spans)."""
    import os
    import tempfile

    from reader_spark.sources.warc import read_warc, synth_warc_bytes, warc_to_docs
    from reader_spark.spark.job import extract_dataframe

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    rows = docs.select("doc_id", "text", "source").collect()
    shell = (
        '<html><head><title>Document {i}</title><meta name="description" '
        'content="source {src}"></head><body><nav><a href="/">Home</a></nav>'
        "<main><article><h1>Document {i}</h1><p>{text}</p></article></main>"
        "<footer>footer</footer></body></html>"
    )
    records = [
        (
            f"https://warc.test/{r['doc_id']}",
            shell.format(i=r["doc_id"], src=r["source"], text=r["text"]),
            200,
        )
        for r in rows
    ]
    d = tempfile.mkdtemp(prefix="warcq_")
    half = len(records) // 2
    with open(os.path.join(d, "part-0.warc"), "wb") as fh:
        fh.write(synth_warc_bytes(records[:half]))
    with open(os.path.join(d, "part-1.warc"), "wb") as fh:
        fh.write(synth_warc_bytes(records[half:]))

    extracted = extract_dataframe(warc_to_docs(read_warc(spark, d)), base_url_prefix="")
    return extracted.select(
        F.regexp_extract("doc_id", r"(\d+)$", 1).cast("long").alias("doc_id"),
        F.explode("spans").alias("span"),
    ).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
    )


def _q_error_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 contract: failed docs become ERROR ROWS, not exceptions. Every
    doc_id % 7 == 0 document gets an empty payload injected; the pipeline
    must tag exactly those EmptyDocumentError and extract the rest."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    docs = _docs_as_corpus(documents).withColumn(
        "spans",
        F.when(
            F.col("doc_id").cast("long") % 7 == 0,
            F.array(
                F.struct(
                    F.lit("html").alias("kind"),
                    F.lit("").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ),
        ).otherwise(F.col("spans")),
    )
    extracted = extract_dataframe(docs)
    return extracted.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce("error_kind", F.lit("ok")).alias("error_kind"),
        F.size("spans").alias("n_spans"),
    )


def _q_resume_remaining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-resume anti-join (J5): docs still to process = corpus
    LEFT ANTI JOIN committed doc_ids. Committed set here = every even doc_id
    (deterministic stand-in for the output table's committed snapshot)."""
    docs = _read(spark, sf_dir, "documents")
    committed = docs.where(F.col("doc_id") % 2 == 0).select("doc_id")
    return (
        docs.join(committed, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


def _q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary columns, native path: documents rendered to opaque
    BINARY content + typed metadata (modality, byte size, content digest) —
    all JVM-side (octet_length / sha2 on binary). The pandas decode stage
    (ops/multimodal.py) is exercised in tests; this query oracle-checks the
    binary plumbing itself."""
    docs = _read(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.concat(F.lit("media-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.octet_length(content).alias("bytes"),
        F.sha2(content, 256).alias("content_sha"),
    )


def _q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF layout parse (delta b): two-column fixture -> ordered spans,
    value-checked against a golden-literal VALUES oracle (the parser is not
    SQL-expressible, but its fixed expected output is)."""
    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows, extract_dataframe

    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] == "pdf-two-column"]
    extracted = extract_dataframe(docs_from_rows(spark, rows))
    return extracted.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
    )


def _q_pdf_dehyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text reflow: end-of-line hyphenation repair during column merge
    (pdf/layout.py dehyphenate_lines — word breaks inside and ACROSS the
    column boundary, soft-hyphen discard, compound-keep). Golden-literal
    VALUES oracle, same contract style as pdf_extract."""
    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows, extract_dataframe

    rows = [fixtures.pdf_fixture_doc("pdf-hyphenated", fixtures.PDF_HYPHENATED_BOXES)]
    extracted = extract_dataframe(docs_from_rows(spark, rows))
    return extracted.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
    )


def _q_crawl_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS crawl dataflow over a deterministic 4-page corpus, value-checked
    against a golden-literal VALUES oracle."""
    from reader_spark.spark.crawler import crawl

    def page(url, title, links):
        anchors = "".join(f'<a href="{l}">x</a>' for l in links)
        return (url, f"<html><head><title>{title}</title></head><body>{anchors}</body></html>")

    pages = spark.createDataFrame(
        [
            page("https://c.test/start", "Start", ["/blog/a", "/blog/b"]),
            page("https://c.test/blog/a", "A", ["/blog/c"]),
            page("https://c.test/blog/b", "B", []),
            page("https://c.test/blog/c", "C", []),
        ],
        "url string, payload string",
    )
    return crawl(spark, pages, "https://c.test/start", max_depth=2, max_pages=10)


def _q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (capped id range; threshold
    tuned to the synthetic embeddings' similarity range).
    Exact all-pairs form for the oracle; the scale path buckets by
    hyperplane sketch first (ops/ann.lsh_bucketed_topk)."""
    from reader_spark.ops.ann import cosine_col

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").cast("array<double>").alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").cast("array<double>").alias("eb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine_col(F.col("ea"), F.col("eb")), 4))
        .where(F.col("cosine") >= 0.35)
        .select("vec_a", "vec_b", "cosine")
    )


def _q_embedding_dedup_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the LSH-BUCKETED production path with
    engine-portable literal planes — fully oracle-checked (the DuckDB oracle
    computes the identical buckets from the same literal weights, joins
    bucket-mates, and applies the same cosine filter). Certifies the
    bucket-join candidate generation + exact verify end-to-end."""
    from reader_spark.ops.ann import md5_plane_weights
    from reader_spark.ops.dedup import embedding_near_pairs_bucketed

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    # 2 planes (4 buckets): coarse enough that moderate-similarity pairs
    # (the 0.35-threshold synthetic range) actually collide — a non-vacuous
    # oracle row set — while the join stays bucket-bounded
    return embedding_near_pairs_bucketed(
        emb,
        threshold=0.35,
        weights=md5_plane_weights(dim=64, planes=2),
    ).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"), "cosine"
    )


def _q_embedding_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dedup COMPOSITE: LSH-bucketed candidate pairs (literal
    portable planes) -> connected components -> (doc, component) cluster
    labels — the full near-dup clustering path a corpus pipeline runs over
    an embedding column, oracled end-to-end against a recursive CTE."""
    from reader_spark.ops.ann import md5_plane_weights
    from reader_spark.ops.dedup import connected_components, embedding_near_pairs_bucketed

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    pairs = embedding_near_pairs_bucketed(
        emb, threshold=0.35, weights=md5_plane_weights(dim=64, planes=2)
    )
    return connected_components(pairs).select("doc", "component")


def _q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns.

    Pivot values are pinned statically (the events generator's fixed
    taxonomy, TESTDATA.md) — no `.distinct().collect()` driver round-trip,
    and the output schema is deterministic even if new event types appear.
    """
    events = _read(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0)
    )


def _q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event type (linear interpolation both engines)."""
    events = _read(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


def _q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over the props column -> typed field -> aggregate
    (X10 extractStructuredData analogue as a dataset op)."""
    events = _read(spark, sf_dir, "events")
    parsed = events.withColumn(
        "k", F.from_json(F.col("props"), "k int")["k"]
    )
    return parsed.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_with_k"),
    )


def _q_url_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 URL dedup keys over synthetic URLs derived from documents."""
    from reader_spark.spark.columns import url_key_col

    docs = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com:443/Docs/"),
        F.col("doc_id").cast("string"),
        F.lit("/index.html?utm=1#frag"),
    )
    return docs.select(
        "doc_id", url.alias("url"), url_key_col(url).alias("url_key")
    )


def _q_content_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 content-URL predicate over a synthetic URL mix."""
    from reader_spark.spark.columns import is_content_url_col

    docs = _read(spark, sf_dir, "documents")
    path = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("/privacy-policy"))
        .when(F.col("doc_id") % 7 == 1, F.lit("/admin/panel"))
        .when(F.col("doc_id") % 7 == 2, F.lit("/blog/post"))
        .when(F.col("doc_id") % 7 == 3, F.lit("/assets/app.js"))
        .when(F.col("doc_id") % 7 == 4, F.lit("/docs/guide"))
        .when(F.col("doc_id") % 7 == 5, F.lit("/report.pdf"))
        .otherwise(F.lit("/articles/deep-dive"))
    )
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"), path)
    return (
        docs.select("doc_id", url.alias("url"))
        .where(is_content_url_col(F.col("url")))
    )


def _q_strip_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 tag-strip fallback as native regexp chain over synthetic HTML."""
    from reader_spark.spark.columns import strip_tags_col

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    html = F.concat(
        F.lit("<html><head><script>var x=1;</script><style>p{}</style></head><body><h1>Doc</h1><p>"),
        F.col("text"),
        F.lit("</p><!-- note --></body></html>"),
    )
    return docs.select("doc_id", strip_tags_col(html).alias("clean_text"))


def _q_batch_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 batch-metadata aggregate analogue per source."""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("total_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def _q_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attaches the user's most recent prior
    click within 24 h (union+window merge form — one shuffle on user_id,
    no non-equi nested loop). See reader_spark/ops/joins.py scale notes."""
    from reader_spark.ops.joins import asof_join

    events = _read(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["event_id", "value"],
        tiebreak="event_id",
        tolerance_seconds=86400,
    )
    return out.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.round("value", 4).alias("purchase_value"),
        F.col("matched_time").alias("click_ts"),
        F.col("matched_event_id").alias("click_event_id"),
        F.round("matched_value", 4).alias("click_value"),
    )


def _q_attribution_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via time bucketing: purchases landing
    in the 12 h window after each signup, per user — bucket equi-join +
    exact containment filter, never a nested-loop theta join."""
    from reader_spark.ops.joins import range_join_buckets

    events = _read(spark, sf_dir, "events")
    signups = events.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id"),
        F.col("ts").alias("signup_ts"),
        (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("end_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "value"
    )
    joined = range_join_buckets(
        purchases,
        signups,
        on=["user_id"],
        point_time="p_ts",
        interval_start="signup_ts",
        interval_end="end_ts",
        bucket_seconds=43200,
    )
    attributed = joined.groupBy("signup_id").agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("attributed_value"),
    )
    return signups.drop("end_ts").join(attributed, "signup_id", "left").select(
        "signup_id",
        "user_id",
        "signup_ts",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("attributed_value", F.lit(0.0)).alias("attributed_value"),
    )


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag documents sharing an 8-gram with a
    deterministic in-corpus benchmark set (first 30 normalized tokens of
    every doc_id % 29 == 0 document). hashed=False is the SQL-expressible
    oracle twin of the xxhash64 production path (pytest pins equality)."""
    from reader_spark.ops.decontam import contamination_flags, normalize_for_ngrams

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(F.split(normalize_for_ngrams(F.col("text")), " "), 1, 30), " "
        ).alias("bench_text"),
    )
    return contamination_flags(docs, bench, n=8, hashed=False)


def _q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (ops.decontam.
    contamination_flags_bloom): the benchmark grams ride as ONE broadcast
    set-bit row, corpus grams check k array_contains positions scan-side,
    and only maybe-hit docs enter the exact gram join — the shape for
    100M+-gram benchmark sets where the exact hash broadcast is
    undeliverable. SHARES the exact oracle with `decontaminate`: a Bloom
    filter has no false negatives, so output equality IS the
    losslessness proof."""
    from reader_spark.ops.decontam import (
        contamination_flags_bloom,
        normalize_for_ngrams,
    )

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(F.split(normalize_for_ngrams(F.col("text")), " "), 1, 30), " "
        ).alias("bench_text"),
    )
    return contamination_flags_bloom(docs, bench, n=8, hashed=False)


def _q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. ACL'22): maximal duplicated
    >=20-token spans via hashed positional windows + interval merge —
    no suffix array, three key-bounded shuffles. hashed=False is the
    SQL-oracle twin of the xxhash64 path (pytest pins equality)."""
    from reader_spark.ops.substring import duplicate_spans

    docs = _read(spark, sf_dir, "documents")
    return duplicate_spans(docs, min_tokens=20, hashed=False)


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 for a fixed 3-term query — no explode, one 1-row stats
    aggregate broadcast back, TakeOrderedAndProject top-k. Per-term
    contributions rounded at 9 dp then summed in fixed order (oracle float
    parity, same discipline as the PQ oracles)."""
    from reader_spark.ops.search import bm25_rank

    docs = _read(spark, sf_dir, "documents")
    return bm25_rank(docs, ["stream", "window", "query"], top_k=15)


def _q_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass numeric profiling of the lineitem measures — all four
    columns' stats in ONE aggregate, stack()-unpivoted to rows."""
    from reader_spark.ops.profile import numeric_profile

    li = _read(spark, sf_dir, "lineitem")
    return numeric_profile(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def _q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of per-user event counts (portable md5 family):
    150 users hashed into a 4x64 cell table, point-queried back — real
    overcounts appear (64 cells < 150 keys), and the whole sketch math is
    replicated verbatim in the DuckDB oracle. est >= true_n always (CMS
    one-sided guarantee)."""
    from reader_spark.ops.sketch import cms_build, cms_estimate

    events = _read(spark, sf_dir, "events")
    truth = events.groupBy("user_id").agg(F.count("*").alias("true_n"))
    sketch = cms_build(events, "user_id", depth=4, width=64, portable=True)
    est = cms_estimate(
        sketch, truth.select("user_id"), "user_id", depth=4, width=64, portable=True
    )
    return truth.join(est, "user_id").select(
        "user_id",
        "est",
        "true_n",
        (F.col("est") - F.col("true_n")).alias("overcount"),
    )


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct event_ids per event_type (m=64, portable md5
    hash) vs the exact count — the estimate itself is oracle-checked:
    registers are deterministic integers and the harmonic sum's 2^-rho
    terms span < 53 mantissa bits, so the double sum is exact in any
    aggregation order."""
    from reader_spark.ops.hll import hll_estimate, hll_registers

    events = _read(spark, sf_dir, "events")
    regs = hll_registers(events, "event_id", ["event_type"], b=6)
    est = hll_estimate(regs, ["event_type"], b=6)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "hll_est",
        "exact_distinct",
        F.round(
            (F.col("hll_est") - F.col("exact_distinct")) / F.col("exact_distinct"), 4
        ).alias("rel_err"),
    )


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis deterministic weighted sample: 20 docs per
    language, inclusion odds proportional to n_chars. Ranks are rounded
    to 9 dp BEFORE the window ordering so the ordering itself is
    engine-stable; ties break on the key."""
    from reader_spark.ops.sampling import weighted_sample_topk

    docs = _read(spark, sf_dir, "documents")
    return weighted_sample_topk(
        docs, F.col("doc_id"), F.col("n_chars"), 20, ["lang"], portable=True
    ).select("lang", "doc_id", "n_chars", "sample_rank")


def _q_bloom_visited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom visited-set demo (J1 at 100 TB): first-half doc keys build a
    k=3, m=1024 filter; every key probes it. Sized so real false
    positives appear (~14% of unvisited at sf0.01); false negatives are
    structurally impossible and the oracle re-derives every bit."""
    from reader_spark.ops.bloom import bloom_build, bloom_member

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("doc:"), F.col("doc_id")).alias("key")
    )
    visited = docs.where(F.col("doc_id") < 250)
    bloom = bloom_build(visited, "key", k=3, m=1024, portable=True)
    member = bloom_member(bloom, docs, "key", k=3, m=1024, portable=True)
    return docs.join(member, "key").select(
        "doc_id",
        "is_member",
        F.when(F.col("doc_id") < 250, 1).otherwise(0).alias("visited"),
        F.when((F.col("is_member") == 1) & (F.col("doc_id") >= 250), 1)
        .otherwise(0)
        .alias("false_positive"),
    )


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line dedup over the documents corpus, re-lined
    into 3-token chunks (the synthetic corpus has no newlines; 3 tokens
    over its ~30-word vocab makes the drop path non-vacuous — ~19% of
    lines are cross-document duplicates at sf0.01). First occurrence by
    (doc_id, line_no) survives; exempt below 2 words."""
    from reader_spark.ops.lines import line_dedup_summary

    docs = _read(spark, sf_dir, "documents")
    return line_dedup_summary(docs, "doc_id", "text", words_per_line=3, min_words=2)


def _q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing over the skewed language distribution (en is
    ~44% of the corpus): alpha=0.5 flattens weights to sqrt(count), so
    dominant languages are downsampled relative to rare ones toward a
    250-doc target. Deterministic md5-uniform keep test; rates rounded
    to 9 dp for engine parity."""
    from reader_spark.ops.sampling import temperature_mix_sample

    docs = _read(spark, sf_dir, "documents")
    return temperature_mix_sample(
        docs, F.col("doc_id"), ["lang"], alpha=0.5, target_total=250, portable=True
    ).select("lang", "doc_id", "n_docs", "mix_rate")


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-trained unigram LM scoring: add-1 smoothed
    token probabilities over the whole documents table, every doc scored
    by average negative log2-likelihood per token. Full-vocabulary
    oracle-exact form (max_vocab=None); production sets max_vocab and
    broadcasts the truncated LM dim."""
    from reader_spark.ops.textstats import unigram_lm_scores

    docs = _read(spark, sf_dir, "documents")
    return unigram_lm_scores(docs, "doc_id", "text")


def _q_pagerank_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over a deterministic domain link graph: every
    document contributes one link from its own source domain to the
    domain picked by md5('link:'||doc_id) mod |domains| (no collect —
    the modulus joins in as a 1-row dim), edges weighted by link count,
    5 iterations at damping 0.85. The crawl-prioritization / domain-
    authority computation, expressed as per-iteration join + map-side-
    combined aggregate (ops/graph.py)."""
    from reader_spark.ops.graph import pagerank

    docs = _read(spark, sf_dir, "documents")
    nsrc = docs.agg(F.countDistinct("source").alias("nsrc"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("link:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    edges = (
        docs.crossJoin(F.broadcast(nsrc))
        .select(
            F.col("source").alias("src"),
            F.concat(F.lit("src"), F.pmod(h, F.col("nsrc")).cast("string")).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    pr = pagerank(edges, "src", "dst", "w", iterations=5, damping=0.85)
    return pr.select(
        F.col("node").alias("domain"), F.round("pr", 6).alias("pr")
    )


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl dedup: docs with doc_id >= 250 are the new
    batch, checked against the already-ingested corpus (doc_id < 250)
    via the PERSISTED minhash band index (build_band_index -> parquet ->
    read back, exactly the production recrawl flow) + exact-Jaccard
    verify at 0.8. Only new-vs-old pairs are ever formed, and the old
    corpus is never re-sketched — its bands and shingle sets come off
    the index (plan-pinned in tests/test_plans.py)."""
    import tempfile

    from reader_spark.ops.dedup import build_band_index, incremental_near_dups

    docs = _read(spark, sf_dir, "documents")
    index_path = tempfile.mkdtemp(prefix="bandidx_") + "/index"
    build_band_index(
        docs.where(F.col("doc_id") < 250), "doc_id", "text", portable=True
    ).write.parquet(index_path)
    return incremental_near_dups(
        None,
        docs.where(F.col("doc_id") >= 250),
        "doc_id",
        "text",
        threshold=0.8,
        portable=True,
        index=spark.read.parquet(index_path),
    )


def _q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel with a 24h max gap between
    consecutive steps (150 -> 60 -> 25 users at sf0.01 — the gap is what
    makes the ordering constraint bite on this event density). Each step
    is one user-keyed join + map-side-combined min; the stage table only
    shrinks."""
    from reader_spark.ops.funnel import funnel_summary

    events = _read(spark, sf_dir, "events")
    return funnel_summary(
        events,
        steps=("view", "click", "purchase"),
        max_gap_seconds=86400,
    )


def _q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (user_id, event time): both dims
    min/max-bucketed to 8 bits with pure integer div and Morton-
    interleaved — the multi-dim data-skipping key (OPTIMIZE ZORDER).
    Scan-local after a 1-row min/max dim joins in; exact integer math
    end to end."""
    from reader_spark.ops.zorder import zorder_key

    events = _read(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    return zorder_key(events, "user_id", "ts_us", bits=8).select(
        "event_id", "user_id_bucket", "ts_us_bucket", "z"
    )


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention where 'active' = a purchase with value >
    80 (the threshold thins activity to ~2 qualifying events per user
    per month, so cohorts and offsets actually differentiate — 5
    cohorts x varying offsets at sf0.01). Integer period indexing
    against a fixed anchor date."""
    from reader_spark.ops.retention import cohort_retention

    events = _read(spark, sf_dir, "events")
    activity = events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 80.0)
    )
    return cohort_retention(activity, "user_id", "ts", "2024-01-01", 7)


def _q_hll_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability, oracle-checked: per-event-type HLL register
    sets over user_id are merged by per-bucket max and must estimate
    EXACTLY what a direct global sketch estimates (identical registers,
    identical harmonic sum — not approximately equal). One row:
    merged vs direct vs exact distinct."""
    from reader_spark.ops.hll import hll_estimate, hll_merge, hll_registers

    events = _read(spark, sf_dir, "events")
    by_type = hll_registers(events, "user_id", ["event_type"], b=6)
    merged_est = hll_estimate(hll_merge(by_type, []), [], b=6).select(
        F.col("hll_est").alias("merged_est")
    )
    direct_est = hll_estimate(
        hll_registers(events, "user_id", []), [], b=6
    ).select(F.col("hll_est").alias("direct_est"))
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return (
        merged_est.crossJoin(direct_est)
        .crossJoin(exact)
        .select(
            "merged_est",
            "direct_est",
            "exact_distinct",
            (F.col("merged_est") == F.col("direct_est"))
            .cast("int")
            .alias("merge_exact"),
        )
    )


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), ties broken by event_id so
    the sequence is engine-stable. One window over (user, time) — state
    bounded per user — then a 25-cell aggregate."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("next_type", F.lead("event_type").over(win))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("n_from"), 6).alias("prob"),
    )


def _q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source end-to-end with the tolerant contract on display:
    100 table-derived documents round-trip through two JSONL shards,
    plus one schema-drift line (unknown extra field — parses clean),
    one missing-field line and one malformed line (both become error
    ROWS), and a blank trailing line (skipped). Splittable text scan +
    JVM-side from_json; no Python in the parse path."""
    import json
    import os
    import tempfile

    from reader_spark.sources.jsonl import read_jsonl_docs

    rows = (
        _read(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "text", "source")
        .collect()
    )
    lines = [
        json.dumps(
            {"doc_id": str(r["doc_id"]), "text": r["text"], "source": r["source"]}
        )
        for r in rows
    ]
    lines.append(
        json.dumps({"doc_id": "x1", "text": "t", "source": "s", "extra_field": 1})
    )
    lines.append('{"text": "orphan text without id"}')
    lines.append("{broken json")
    lines.append("")
    d = tempfile.mkdtemp(prefix="jsonlq_")
    half = len(lines) // 2
    for name, chunk in (("part-0.jsonl", lines[:half]), ("part-1.jsonl", lines[half:])):
        with open(os.path.join(d, name), "w", encoding="utf-8") as fh:
            fh.write("\n".join(chunk) + "\n")

    out = read_jsonl_docs(spark, d)
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        "error",
    )


def _q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-bin equi-width histogram of l_extendedprice: one 1-row
    min/max broadcast dim + one map-side-combined groupBy; bin math is
    the identical double expression in both engines so boundary values
    land identically."""
    from reader_spark.ops.profile import equi_width_histogram

    lineitem = _read(spark, sf_dir, "lineitem")
    return equi_width_histogram(lineitem, "l_extendedprice", bins=10)


def _q_corpus_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus health dashboard a curation run ends with: per
    language — doc count, Gopher-gate pass rate, mean LM bits/token,
    exact-dup rate, mean token count. Composes gopher_quality_columns +
    unigram_lm_scores + hash-dedup in one plan; every input metric is
    individually oracle-proven, this query proves the composition."""
    from reader_spark.ops.textstats import gopher_quality_columns, unigram_lm_scores

    docs = _read(spark, sf_dir, "documents")
    g = gopher_quality_columns(docs).select(
        "doc_id", "lang", "n_tokens", "gopher_pass"
    )
    nll = unigram_lm_scores(docs).select("doc_id", "avg_nll_bits")
    from reader_spark.ops.lines import line_dedup_summary

    dup_flag = line_dedup_summary(docs).select(
        "doc_id", (F.col("n_dropped") > 0).cast("int").alias("has_dup_lines")
    )
    joined = g.join(nll, "doc_id").join(dup_flag, "doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("gopher_pass").cast("int")), 6).alias(
            "pct_gopher_pass"
        ),
        F.round(F.avg("avg_nll_bits"), 6).alias("mean_nll_bits"),
        F.round(F.avg("has_dup_lines"), 6).alias("dup_line_doc_rate"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 6).alias("mean_tokens"),
    )


def _q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version history of each user's last-event-type state:
    consecutive same-type events collapse, every transition opens a
    half-open [valid_from, valid_to) episode, latest episode flagged
    current. Two user-partitioned window passes; event_id tiebreak
    pins same-timestamp order."""
    from reader_spark.ops.scd import scd2_history

    events = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.col("event_type").alias("state")
    )
    return scd2_history(
        events, ["user_id"], "ts", ["state"], tiebreak_cols=["event_id"]
    )


def _q_fuzzy_source_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: deterministically-corrupted source names (first
    char swapped or a char appended) fuzzy-joined back to the canonical
    registry at edit distance <= 1 via q-gram blocking. The oracle
    brute-forces the cross join — a pair the blocked path loses is a
    hash mismatch, so the optimization is proven lossless."""
    from reader_spark.ops.fuzzy import fuzzy_string_pairs

    docs = _read(spark, sf_dir, "documents")
    dirty = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("z"), F.expr("substring(source, 2)")),
            )
            .otherwise(F.concat(F.col("source"), F.lit("x")))
            .alias("dirty")
        )
        .distinct()
    )
    canon = docs.select("source").distinct()
    return fuzzy_string_pairs(dirty, canon, "dirty", "source", max_dist=1, q=2).select(
        F.col("a").alias("dirty"), F.col("b").alias("canonical"), "dist"
    )


def _q_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (days since the
    anchor date — centered x keeps nSxx - Sx^2 well-conditioned in
    doubles). One map-side-combined aggregate; the oracle computes the
    SAME five sufficient statistics, not regr_* built-ins, so both
    engines share the arithmetic to the rounding digit."""
    from reader_spark.ops.profile import grouped_linreg

    events = _read(spark, sf_dir, "events").withColumn(
        "x_days",
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400000000.0)
        - F.lit(19723.0),  # days(2024-01-01)
    )
    return grouped_linreg(events, ["event_type"], "x_days", "value")


def _q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite across the warehouse: completeness,
    strict uniqueness, referential integrity (broadcast semi-join),
    accepted values, and a range check that GENUINELY FAILS on this data
    (value spans to ~490, the [0,100] contract doesn't hold) — the
    report records metric + verdict instead of dying on violation."""
    from reader_spark.ops.checks import (
        check_accepted_values,
        check_completeness,
        check_in_range,
        check_referential,
        check_uniqueness,
        quality_report,
    )

    lineitem = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    events = _read(spark, sf_dir, "events")
    return quality_report(
        [
            check_completeness(lineitem, "l_shipdate"),
            check_uniqueness(orders, "o_orderkey"),
            check_uniqueness(events, "user_id", threshold=1.0),
            check_referential(orders, "o_custkey", customer, "c_custkey"),
            check_accepted_values(lineitem, "l_returnflag", ["A", "N", "R"]),
            check_in_range(events, "value", 0.0, 100.0),
        ]
    )


def _q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value (alpha=0.2, ordered by ts with
    event_id tiebreak): the inherently-sequential per-key op, run as
    ONE Arrow-batched applyInPandas per user (vectorized pandas ewm).
    The oracle unrolls the recurrence to its closed-form weighted sum —
    valid at fixture series lengths, overflowing at scale, which is
    exactly why the production path is applyInPandas."""
    from reader_spark.ops.ewma import grouped_ewma

    events = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return grouped_ewma(
        events, ["user_id"], ["ts", "event_id"], "value", alpha=0.2
    ).select("user_id", "event_id", "ewma")


def _q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1 h windows, 30 min slide) via
    F.window — the batch twin of the streaming windowed agg; every
    event lands in exactly two overlapping windows. Window starts are
    epoch-aligned integers, so the oracle re-derives membership with
    pure integer arithmetic."""
    events = _read(spark, sf_dir, "events")
    win = F.window(F.col("ts").cast("timestamp"), "1 hour", "30 minutes")
    return (
        events.select(win.alias("w"), "event_type", "value")
        .groupBy(
            F.unix_micros("w.start").alias("window_start_us"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def _q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each observation is held
    until the next one, weight = holding seconds (last observation
    carries no weight — half-open intervals). One lead() window per
    user + one aggregate; the metrics/finance TWAP primitive that a
    plain avg() gets wrong under irregular sampling."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = (
        events.withColumn("t_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("next_us", F.lead("t_us").over(w))
        .where(F.col("next_us").isNotNull())
        .withColumn("hold_s", (F.col("next_us") - F.col("t_us")) / F.lit(1e6))
    )
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum("hold_s"), 6).alias("span_s"),
        F.round(
            F.try_divide(
                F.sum(F.col("value") * F.col("hold_s")), F.sum("hold_s")
            ),
            6,
        ).alias("twap"),
        F.round(F.avg("value"), 6).alias("plain_avg"),
    )


def _q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier flags: |value - mean| / stddev > 2.5
    (population stddev, exact sums). The monitoring primitive — one
    map-side-combined stats aggregate broadcast back onto the stream;
    scan-local flagging at any scale."""
    events = _read(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
        F.sum("value").alias("sx"),
    )
    # population variance from exact sums: (sxx - sx^2/n) / n
    stats = stats.withColumn(
        "sigma",
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        events.join(F.broadcast(stats.select("event_type", "mu", "sigma")), "event_type")
        .withColumn("z", F.round(z, 6))
        .where(F.abs(F.col("z")) > 2.5)
        .select("event_type", "event_id", "value", "z")
    )


def _q_similarity_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard self-join at 0.8 over docs < 300:
    recall 1 by the prefix theorem, no sketch involved. The oracle
    brute-forces all shingle-sharing pairs — the prefix filter losing
    any pair would be a hash mismatch, so losslessness is proven, and
    the result must equal the minhash path's verified pairs too."""
    from reader_spark.ops.dedup import similarity_join_prefix

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return similarity_join_prefix(docs, "doc_id", "text", n=3, threshold=0.8)


def _q_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test on the lang x source
    contingency table: observed cell counts vs expected row*col/total,
    chi2 = sum((o-e)^2/e), dof = (R-1)(C-1). Three map-side-combined
    aggregates and two broadcastable margin dims — the classic
    'are these two labels independent' screen for corpus composition
    drift. Exact integer counts; one rounded division per cell."""
    docs = _read(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_m = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("row_n"))
    cols_m = docs.groupBy("source").agg(F.count(F.lit(1)).alias("col_n"))
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    # FULL grid, not just observed cells: an absent (lang, source) pair
    # still contributes (0-e)^2/e = e to the statistic
    grid = rows_m.crossJoin(F.broadcast(cols_m))
    contrib = (
        grid.join(cells, ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "e",
            F.col("row_n") * F.col("col_n") / F.col("total").cast("double"),
        )
        .withColumn(
            "c",
            F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 9),
        )
    )
    dims = contrib.agg(
        F.round(F.sum("c"), 6).alias("chi2"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    return dims.select(
        "chi2",
        ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).alias("dof"),
    )


def _q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining: the 20 most frequent 3-event paths across
    per-user ordered streams (two lead() taps on one user-partitioned
    window, one count, deterministic top-k with path tiebreak). The
    'how do users actually move' generalization of the transition
    matrix."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        events.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        paths.orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(20)
    )


def _q_crawl_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair crawl-budget split across source domains: demand =
    total chars per source, budget = 90% of the corpus (2 sources fully
    satisfied, 18 capped at the water level at sf0.01). Closed-form
    water-filling over the domain dim — no iteration, window bounded by
    registry size."""
    from reader_spark.ops.allocate import max_min_fair_allocation

    docs = _read(spark, sf_dir, "documents")
    demands = docs.groupBy("source").agg(F.sum("n_chars").alias("demand_chars"))
    total = demands.agg(F.sum("demand_chars")).head()[0]
    return max_min_fair_allocation(
        demands, "source", "demand_chars", budget=0.9 * float(total)
    )


def _q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion (Cormack et al.,
    SIGIR'09): the BM25 lexical top-15 and the embedding-cosine top-15
    fuse as rrf = sum(1/(60 + rank)) over the legs a doc appears in —
    the standard lexical+vector combiner. Both legs are independently
    oracle-proven; this query proves the fusion."""
    from pyspark.sql import Window

    from reader_spark.ops.ann import brute_force_topk
    from reader_spark.ops.search import bm25_rank

    docs = _read(spark, sf_dir, "documents")
    emb = _read(spark, sf_dir, "embeddings")

    lex = bm25_rank(docs, ["stream", "window", "query"], top_k=15).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("bm25_rank"),
    )
    query_vec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    cos = brute_force_topk(emb, [float(v) for v in query_vec], k=15).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .cast("long")
        .alias("cos_rank"),
    )
    fused = lex.join(cos, "doc_id", "full_outer")
    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("bm25_rank")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("cos_rank")), F.lit(0.0)
    )
    return fused.select(
        "doc_id", "bm25_rank", "cos_rank", F.round(rrf, 6).alias("rrf")
    )


def _q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector-agreement confusion matrix: the stopword-vote and
    char-trigram language detectors cross-tabulated against each other
    and the gold label — the evaluation table for detector drift. Both
    detectors are independently oracle-proven; this proves the rollup."""
    from reader_spark.ops.textstats import (
        detect_language_col,
        detect_language_trigram_col,
    )

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("gold"),
            detect_language_col(F.col("text")).alias("stopword_lang"),
            detect_language_trigram_col(F.col("text")).alias("trigram_lang"),
        )
        .groupBy("gold", "stopword_lang", "trigram_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent word pairs (the
    word2vec-era collocation statistic): pmi = log2(c12*N^2/(C*c1*c2)),
    pairs with support >= 10, deterministic top-20. Bigram extraction
    is the LINEAR zip-of-shifted-slices (the transform+slice form is
    quadratic); counts are two map-side-combined groupBys; all products
    stay under 2^53 so the doubles are exact in both engines."""
    docs = _read(spark, sf_dir, "documents")
    words = docs.select(
        F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    bigrams = words.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, F.size("w") - 1).alias("a"),
                F.slice(F.col("w"), 2, F.size("w") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    unigrams = words.select(F.explode("w").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = pair_counts.agg(F.sum("c12").alias("big_c")).crossJoin(
        unigrams.agg(F.sum("c").alias("n_words"))
    )
    joined = (
        pair_counts.join(
            unigrams.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1"
        )
        .join(
            unigrams.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2"
        )
        .crossJoin(F.broadcast(totals))
        .where(F.col("c12") >= 10)
        .withColumn(
            "pmi",
            F.round(
                F.log2(
                    (F.col("c12") * F.col("n_words") * F.col("n_words"))
                    / (F.col("big_c") * F.col("c1") * F.col("c2"))
                ),
                6,
            ),
        )
    )
    return (
        joined.select("w1", "w2", "c12", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


def _q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization over docs with DECOMPOSED sequences
    planted on even doc_ids (e + U+0301 combining acute): Python
    unicodedata (mapInPandas) must agree byte-for-byte with the
    oracle's nfc_normalize — two independent UAX#15 implementations
    cross-checked. changed flags exactly the planted half."""
    from reader_spark.ops.textstats import nfc_normalize_docs

    docs = _read(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(" cafe\u0301")).otherwise(
                F.lit(" cafe")
            ),
        ),
    )
    out = nfc_normalize_docs(docs, "doc_id", "text")
    return out.select(
        "doc_id", "changed", F.md5("text_nfc").alias("nfc_md5")
    )


def _q_lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch evaluation, oracle-checked: the portable MinHash-LSH
    candidate set (64 hashes, 16x4 bands) scored against exact-Jaccard
    ground truth at 0.8 over docs < 300 — candidate count, truth count,
    hits, precision, recall in one row. Recall should be ~1 at these
    parameters (band collision probability 0.9998 at J=0.8); precision
    shows the verification burden LSH passes downstream."""
    from reader_spark.ops.dedup import (
        minhash_lsh_candidates_portable,
        ngram_jaccard_pairs,
    )

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    cands = minhash_lsh_candidates_portable(docs, "doc_id", "text").select(
        "doc_a", "doc_b"
    )
    truth = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).select(
        "doc_a", "doc_b"
    )
    hits = cands.join(truth, ["doc_a", "doc_b"])
    n_c = cands.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_h = hits.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_c.crossJoin(n_t)
        .crossJoin(n_h)
        .select(
            "n_candidates",
            "n_true",
            "n_hit",
            F.round(F.try_divide(F.col("n_hit").cast("double"), F.col("n_candidates")), 6).alias("precision"),
            F.round(F.try_divide(F.col("n_hit").cast("double"), F.col("n_true")), 6).alias("recall"),
        )
    )


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table versions: the 'old'
    snapshot is documents as-is; the 'new' snapshot drops doc_id % 11
    == 0 (deletes), appends 25 fresh rows (inserts), and rewrites text
    for doc_id % 7 == 0 (updates). One full-outer join on the key with
    content-hash comparison emits (key, change) in {added, removed,
    changed} — unchanged rows drop out. THE incremental-publish diff;
    hash compare keeps the shuffle narrow (key + 32-byte md5, never
    full rows)."""
    docs = _read(spark, sf_dir, "documents")
    old = docs.select("doc_id", F.md5("text").alias("h"))
    new_rows = (
        docs.where(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" [rev2]")),
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
        .unionByName(
            docs.where(F.col("doc_id") < 25).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.md5(F.concat(F.lit("new:"), F.col("text"))).alias("h"),
            )
        )
    )
    joined = old.withColumnRenamed("h", "h_old").join(
        new_rows.withColumnRenamed("h", "h_new"), "doc_id", "full_outer"
    )
    return joined.select(
        "doc_id",
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    ).where(F.col("change") != "unchanged")


def _q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync family, word-level): a
    chunk boundary opens wherever the rolling 3-gram hash hits 0 mod 8
    (expected chunk ~8 words), so chunk boundaries are a pure function
    of LOCAL content — insert a word early in a doc and only the
    touched chunk's hash changes, unlike fixed-width chunking where
    every later chunk shifts. One per-doc window for the gram + cumsum,
    one groupBy for chunk assembly. Output: (doc_id, chunk_id, n_words,
    chunk_md5)."""
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "word"),
    )
    gram = F.concat_ws(
        " ", F.lag("word", 2).over(w), F.lag("word", 1).over(w), F.col("word")
    )
    flagged = toks.withColumn(
        "flag",
        F.when(
            (F.col("pos") >= 2)
            & (
                F.pmod(
                    F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
                    F.lit(8),
                )
                == 0
            ),
            1,
        ).otherwise(0),
    ).withColumn(
        "chunk_id",
        F.sum("flag").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
            )
        ).alias("chunk_md5"),
    )


def _q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per document from three native regex
    counts (words, sentence terminators, vowel-group syllable proxy) —
    scan-local JVM columns, the classic readability screen. Sentences
    floor at 1 (the synthetic corpus has no terminators; real text
    exercises the denominator)."""
    docs = _read(spark, sf_dir, "documents")
    words = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    )
    syllables = F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
    grade = F.round(
        F.lit(0.39) * words / sentences
        + F.lit(11.8) * syllables / F.greatest(words, F.lit(1))
        - F.lit(15.59),
        6,
    )
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        grade.alias("fk_grade"),
    )


def _q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra: estimated |users(view) ∩ users(purchase)| by
    inclusion-exclusion over HLL sketches — est(A) + est(B) -
    est(A∪B), where the union estimate comes from the LOSSLESS register
    merge. Compared against the exact intersection; fully deterministic
    so the estimate itself is oracle-checked."""
    from reader_spark.ops.hll import hll_estimate, hll_merge, hll_registers

    events = _read(spark, sf_dir, "events")
    a = events.where(F.col("event_type") == "view")
    b = events.where(F.col("event_type") == "purchase")
    ra = hll_registers(a, "user_id", [], b=6)
    rb = hll_registers(b, "user_id", [], b=6)
    est_a = hll_estimate(ra, [], b=6).select(F.col("hll_est").alias("est_a"))
    est_b = hll_estimate(rb, [], b=6).select(F.col("hll_est").alias("est_b"))
    est_u = hll_estimate(
        hll_merge(ra.unionByName(rb), []), [], b=6
    ).select(F.col("hll_est").alias("est_union"))
    exact = (
        a.select("user_id")
        .intersect(b.select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


def _q_value_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quantile normalization of event values: u = rank/(n+1)
    maps any distribution onto (0,1) uniformly — the rank-based feature
    scaling robust to outliers (unlike z-scores). average rank for
    ties, one window per group; exact rational arithmetic until the
    single rounded division."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    w_all = Window.partitionBy("event_type")
    # average rank over ties: avg of row_numbers within the tie class =
    # (first_rn + last_rn)/2, window-free via min/max rank per value
    ranked = events.select(
        "event_type", "event_id", "value", F.row_number().over(w.orderBy("value", "event_id")).alias("rn")
    )
    tie_avg = ranked.groupBy("event_type", "value").agg(
        ((F.min("rn") + F.max("rn")) / 2.0).alias("avg_rank")
    )
    n = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.join(tie_avg, ["event_type", "value"])
        .join(n, "event_type")
        .select(
            "event_type",
            "event_id",
            "value",
            F.round(F.col("avg_rank") / (F.col("n") + 1), 6).alias("u"),
        )
    )


def _q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids + intra-class compactness (mean /
    min cosine of members to their own centroid) — the labeled-data
    sanity check before training a classifier on the embedding space.
    All aggregate algebra: one posexplode, per-(label, dim) means
    (rounded to 9 dp so both engines hold the same centroid), cosine
    rebuilt from dot/norm sums, no vector ever collected."""
    emb = _read(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("p", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = vals.groupBy("label", "p").agg(F.round(F.avg("v"), 9).alias("c"))
    per_vec = (
        vals.join(cent, ["label", "p"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("nv"),
            F.sum(F.col("c") * F.col("c")).alias("nc"),
        )
        .withColumn(
            "cos",
            F.round(
                F.try_divide(F.col("dot"), F.sqrt(F.col("nv")) * F.sqrt(F.col("nc"))),
                9,
            ),
        )
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("cos"), 6).alias("mean_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
    )


def _q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample proportion z-test, the A/B-experiment readout: users
    split into deterministic variants by user_id parity, success = a
    purchase with value > 90 (every user has SOME purchase — the
    threshold keeps the rates off the degenerate 1.0 where z is
    undefined); z = (pA - pB)/sqrt(p(1-p)(1/nA+1/nB))
    with the pooled rate. Exact integer counts feed one closed-form
    row; |z| >= 1.96 flags 5% significance. Everything is two
    map-side-combined aggregates over the user dim."""
    events = _read(spark, sf_dir, "events")
    users = events.select("user_id").distinct().withColumn(
        "variant", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    )
    purchasers = (
        events.where((F.col("event_type") == "purchase") & (F.col("value") > 90.0))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    per_variant = (
        users.join(purchasers, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("converted"), F.lit(0)).alias("conv"),
        )
    )
    a = per_variant.where(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("c_a")
    )
    b = per_variant.where(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("c_b")
    )
    j = a.crossJoin(b)
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    z = F.round(
        F.try_divide(
            p_a - p_b,
            F.sqrt(pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
        ),
        6,
    )
    return j.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        z.alias("z"),
        F.when(z.isNotNull() & (F.abs(z) >= 1.96), 1)
        .otherwise(0)
        .alias("significant_05"),
    )


def _q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality metric behind 'top-N% of domains hold M% of tokens'
    corpus audits. Closed form on ranked values:
    G = 2*sum(i*x_(i))/(n*sum(x)) - (n+1)/n. One window over the
    customer dim (bounded), exact integer rank arithmetic."""
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("r")
    )
    w = Window.orderBy(F.col("r").asc(), F.col("o_custkey").asc())
    ranked = rev.withColumn("i", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("total"),
        F.sum(F.col("i") * F.col("r")).alias("weighted"),
    )
    return agg.select(
        "n",
        F.round(F.col("total"), 2).alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


def _q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix (behavioral
    diversity, bits): -sum(p log2 p) over the five types. Two
    map-side-combined aggregates; per-term round-9 then round-6 keeps
    both engines in lockstep."""
    events = _read(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("user_id").agg(F.sum("c").alias("n"))
    terms = counts.join(totals, "user_id").withColumn(
        "t",
        F.round(
            -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n")), 9
        ),
    )
    return terms.groupBy("user_id").agg(
        F.round(F.sum("t"), 6).alias("entropy_bits"),
        F.count(F.lit(1)).alias("n_types"),
    )


def _q_hits_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the same deterministic domain link
    graph as pagerank_domains (distinct edges — HITS is unweighted), 3
    L1-normalized iterations in exact float lockstep with the unrolled
    SQL oracle (round-9 sums and divisions, display at 6)."""
    from reader_spark.ops.graph import hits

    docs = _read(spark, sf_dir, "documents")
    nsrc = docs.agg(F.countDistinct("source").alias("nsrc"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("link:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    edges = (
        docs.crossJoin(F.broadcast(nsrc))
        .select(
            F.col("source").alias("src"),
            F.concat(F.lit("src"), F.pmod(h, F.col("nsrc")).cast("string")).alias("dst"),
        )
        .distinct()
    )
    return hits(edges, iterations=3).withColumnRenamed("node", "domain")


def _q_value_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram of event values, 5 bins — the
    selectivity-estimation twin of price_histogram's equi-width bins:
    edges from ONE percentile aggregate (no global sort), binning is a
    scan-local comparison vs the broadcast edge array. Exact edges are
    the oracle contract; exact=False (approx_percentile) is the
    production path (pinned by pytest)."""
    from reader_spark.ops.profile import equi_depth_histogram

    events = _read(spark, sf_dir, "events")
    return equi_depth_histogram(events, "value", bins=5, exact=True)


def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the provenance-contamination
    audit (which feeds/snapshots re-serve each other's content): exact
    n-gram Jaccard near-dup pairs (tau 0.8, doc_id<300) rolled up to
    ordered (source_a, source_b) pair counts with mean similarity.
    Composition: proven pair generator + two dim joins + one rollup."""
    from reader_spark.ops.dedup import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    dims = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            dims.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            dims.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("jaccard"), 6).alias("mean_jaccard"),
    )


def _q_rate_limit_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time token-bucket politeness replay (T2 depth): capacity 3,
    refill 1e-5 tokens/s — per user, the initial burst is admitted, then
    admission tracks the refill budget (about a third of events denied
    at this corpus's event density, so both branches are exercised).
    applyInPandas sequential recurrence (ewma-style justification);
    oracle = DuckDB recursive CTE replaying the identical INTEGER
    micro-token recurrence (no floats anywhere in the state).
    Reported as the per-user admission rollup."""
    from reader_spark.ops.ratelimit import (
        admission_summary,
        token_bucket_admission,
    )

    events = _read(spark, sf_dir, "events")
    return admission_summary(
        token_bucket_admission(events, capacity_tokens=3, us_per_unit=100_000)
    )


def _q_quality_token_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data pyramid: how many TOKENS live in each quality quintile —
    the planning artifact for quality-thresholded training mixes ("how
    much data survives a cut at tier k?"). Quality = stopword_ratio
    (fluency proxy, oracle-proven column); tier edges from ONE exact
    percentile aggregate (no global sort), binning scan-local against
    the broadcast edge array; per-tier doc and token sums map-side
    combined. Cumulative share gives the survival curve."""
    from pyspark.sql import Window

    from reader_spark.ops.textstats import stopword_ratio_col, token_count_col

    docs = _read(spark, sf_dir, "documents")
    scored = docs.select(
        F.round(stopword_ratio_col(F.col("text")), 9).alias("q"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )
    edges = scored.agg(
        F.expr(
            "transform(percentile(q, array(0.2, 0.4, 0.6, 0.8)), e -> round(e, 9))"
        ).alias("__edges")
    )
    tier = F.size(
        F.filter(F.col("__edges"), lambda e: F.col("q") > e)
    ).cast("long")
    tiers = (
        scored.crossJoin(F.broadcast(edges))
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    w = Window.orderBy(F.desc("tier")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.broadcast(tiers.agg(F.sum("n_tokens").alias("__total")))
    return (
        tiers.crossJoin(total)
        .withColumn(
            "cum_token_share",
            F.round(F.sum("n_tokens").over(w) / F.col("__total"), 6),
        )
        .select("tier", "n_docs", "n_tokens", "cum_token_share")
    )


def _q_source_vocab_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary drift: KL(P_source || P_corpus) in bits over
    unigram distributions — the distribution-shift alarm for a feed
    whose content changed (spam flood, language flip, template rot).
    One token explode feeds source-level and corpus-level counts (the
    corpus totals join back on term); round-9 terms, round-6 sum."""
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("term"),
    ).where(F.col("term") != "").localCheckpoint(eager=False)
    src_counts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c_s")
    )
    corpus_counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c_c"))
    src_tot = src_counts.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    corpus_tot = F.broadcast(
        corpus_counts.agg(F.sum("c_c").alias("n_c"))
    )
    terms = (
        src_counts.join(corpus_counts, "term")
        .join(src_tot, "source")
        .crossJoin(corpus_tot)
        .withColumn(
            "t",
            F.round(
                (F.col("c_s") / F.col("n_s"))
                * F.log2(
                    (F.col("c_s") / F.col("n_s"))
                    / (F.col("c_c") / F.col("n_c"))
                ),
                9,
            ),
        )
    )
    return terms.groupBy("source").agg(
        F.round(F.sum("t"), 6).alias("kl_bits"),
        F.count(F.lit(1)).alias("n_terms"),
    )


def _q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragmentation report over the 512-token packing: sequence count,
    segment count, mean fill, fraction of docs split across sequences —
    the numbers that pick seq_len for a training run."""
    from reader_spark.ops.packing import pack_sequences, packing_stats

    docs = _read(spark, sf_dir, "documents")
    return packing_stats(pack_sequences(docs, "doc_id", "text", 512), 512)


def _q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user temporal burstiness: coefficient of variation of
    inter-event gaps (CV≈1 Poisson, >1 bursty, <1 regular — Goh &
    Barabasi 2008) plus the Barabasi burstiness index B=(cv-1)/(cv+1).
    The crawl-politeness / bot-detection traffic-shape diagnostic. One
    user-partitioned lag window + one map-side-combined aggregate; users
    with <3 events (no gap variance) are excluded."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            # ts is TIMESTAMP_NTZ: cast via "timestamp" before "double"
            (
                F.col("ts").cast("timestamp").cast("double")
                - F.col("prev_ts").cast("timestamp").cast("double")
            ).alias("gap"),
        )
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("gap").alias("mean_gap"),
        F.stddev_samp("gap").alias("sd_gap"),
    )
    cv = F.round(F.col("sd_gap") / F.col("mean_gap"), 9)
    return stats.where(F.col("n_gaps") >= 2).select(
        "user_id",
        "n_gaps",
        F.round("mean_gap", 6).alias("mean_gap"),
        F.round(cv, 6).alias("cv"),
        F.round((cv - 1) / (cv + 1), 6).alias("burstiness"),
    )


def _q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: OLS slope of log10(freq) on
    log10(rank) (natural text ~ -1; a synthetic/boilerplate corpus
    deviates — a cheap corpus-health fingerprint). Composes the token
    explode with grouped_linreg's mergeable sufficient statistics; the
    full-vocabulary rank comes from ops/rank.scalable_rank (range-bucket
    + partitioned row_number + broadcast offsets), identical values to a
    global window with NO single-partition WindowExec — at corpus scale
    the vocabulary is 1e8-1e9 rows and a global window is a straggler."""
    from reader_spark.ops.profile import grouped_linreg
    from reader_spark.ops.rank import scalable_rank

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("term")
    ).where(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    ranked = scalable_rank(freq, [F.desc("freq"), F.asc("term")]).select(
        F.lit("corpus").alias("g"),
        F.round(F.log10("rank"), 9).alias("x"),
        F.round(F.log10("freq"), 9).alias("y"),
    )
    return grouped_linreg(ranked, ["g"], "x", "y").select(
        "n", "slope", "intercept", "r2"
    )


def _q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse's FK edges —
    the data-quality check a 100 TB ingest runs before joins are trusted:
    per FK, child rows whose key has no parent (left anti + 1-row count,
    each FK an independent key-bounded join)."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    lineitem = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")

    def violations(child, key, parent, pkey, name):
        return (
            child.select(F.col(key).alias("k"))
            .join(parent.select(F.col(pkey).alias("k")), "k", "left_anti")
            .agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).alias("n_orphans"),
            )
        )

    return (
        violations(orders, "o_custkey", customer, "c_custkey", "orders.custkey")
        .unionByName(
            violations(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem.orderkey")
        )
        .unionByName(
            violations(lineitem, "l_partkey", part, "p_partkey", "lineitem.partkey")
        )
    )


def _q_media_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte content-type sniffing over synthesized binary media
    (real JPEG/PNG/GIF/RIFF/PDF/ISO-BMFF headers prepended to the doc
    bytes by doc_id%7; %7==6 gets no header): per detected kind, file
    count and total bytes. Extensions lie at web scale — sniffing is the
    ingest guard; pure JVM (hex+prefix match), no Python."""
    from reader_spark.ops.multimodal import sniff_kind_col

    docs = _read(spark, sf_dir, "documents")
    magics = [
        "FFD8FF",
        "89504E470D0A1A0A",
        "47494638",
        "52494646",
        "25504446",
        "000000186674797069736F6D",
        "",
    ]
    header = F.element_at(
        F.array(*[F.to_binary(F.lit(m), F.lit("hex")) for m in magics]),
        (F.col("doc_id") % 7 + 1).cast("int"),
    )
    content = F.concat(header, F.encode(F.col("text"), "UTF-8"))
    sniffed = docs.select(
        sniff_kind_col(content).alias("kind"),
        F.octet_length(content).alias("n_bytes"),
    )
    return sniffed.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def _q_opq_encode_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-style transform-then-encode: deterministic signed permutation
    (an exact orthogonal matrix — distances preserved, subspace variance
    redistributed; Ge et al. CVPR'13 rotation baseline) then PQ with the
    same engine-portable literal codebooks as pq_encode_md5."""
    from reader_spark.ops.ann import (
        md5_pq_codebooks,
        md5_signed_permutation,
        opq_encode,
    )

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    perm, signs = md5_signed_permutation(64)
    enc = opq_encode(emb, md5_pq_codebooks(dim=64, m=8, k=16), perm, signs)
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), ","
        ).alias("codes_str"),
    )


def _q_sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION packing path: per-shard (doc_id % 8) windows pack in
    parallel — no single-partition global window (plan-pinned in
    tests/test_packing.py); sequence ids are (shard, seq_id)."""
    from reader_spark.ops.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents").withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(8)).cast("long")
    )
    return pack_sequences(
        docs, "doc_id", "text", 512, partition_cols=["shard"]
    )


def _q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain link-graph degree profile: per node in/out degree and
    reciprocity (fraction of out-edges that are reciprocated) over the
    same deterministic edge set as pagerank/HITS. Two map-side-combined
    aggregates + one self-equi-join on reversed edges."""
    docs = _read(spark, sf_dir, "documents")
    nsrc = docs.agg(F.countDistinct("source").alias("nsrc"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("link:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    edges = (
        docs.crossJoin(F.broadcast(nsrc))
        .select(
            F.col("source").alias("src"),
            F.concat(F.lit("src"), F.pmod(h, F.col("nsrc")).cast("string")).alias("dst"),
        )
        .distinct()
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        edges.join(rev, ["src", "dst"])
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_recip"))
    )
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        outd.join(ind, "node", "full")
        .join(recip.withColumnRenamed("src", "node"), "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.round(
                F.coalesce(F.col("n_recip"), F.lit(0))
                / F.greatest(F.col("out_deg"), F.lit(1)),
                6,
            ).alias("reciprocity"),
        )
    )


def _q_curation_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curation shortlist: top-3 docs by a composite quality
    score (stopword_ratio x ln(1+token_count) — fluency weighted by
    substance), the grouped top-k a data-mixing pass reads per stratum.
    Score terms round at 9, score at 6, (score desc, doc_id) tiebreak;
    lang-partitioned window — no global sort."""
    from pyspark.sql import Window

    from reader_spark.ops.textstats import stopword_ratio_col, token_count_col

    docs = _read(spark, sf_dir, "documents")
    text = F.col("text")
    scored = docs.select(
        "lang",
        "doc_id",
        token_count_col(text).alias("token_count"),
        F.round(
            F.round(stopword_ratio_col(text), 6)
            * F.round(F.log(1.0 + token_count_col(text)), 9),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
    )


def _q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew diagnostic: top-10 heaviest user_id keys with row
    share and hot-key factor (multiple of mean key size) — the number
    that decides salting/AQE/isolation before a 100 TB shuffle. TakeOrdered
    top-k, 1-row broadcast totals."""
    from reader_spark.ops.profile import key_skew_profile

    events = _read(spark, sf_dir, "events")
    return key_skew_profile(events, "user_id", top=10)


def _q_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty vs earlier ingests: fraction of shingles first
    seen in an earlier doc_id (Lee et al. dedup-ablation signal). One
    min-aggregate + one shingle equi-join, no doc pairing."""
    from reader_spark.ops.dedup import novelty_scores

    docs = _read(spark, sf_dir, "documents")
    return novelty_scores(docs, "doc_id", "text", n=3)


def _q_domain_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-line detection (RefinedWeb-style site
    furniture rule): 2-token lines present on >=20% of a source's docs,
    presence-per-doc via array_distinct before explode (no countDistinct
    expand). The deletion list a cleaning pass anti-joins."""
    from reader_spark.ops.lines import domain_boilerplate

    docs = _read(spark, sf_dir, "documents")
    return domain_boilerplate(
        docs, "doc_id", "text", "source", words_per_line=2, min_frac=0.2
    )


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords: one token explode feeds tf and
    doc-frequency aggregates, corpus size joins as a 1-row broadcast dim,
    doc-partitioned window top-k (no global sort)."""
    from reader_spark.ops.search import tfidf_top_terms

    docs = _read(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


def _q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment |A∩B|/|A| >= 0.5 (quote/excerpt
    detection — the asymmetric relation Jaccard dedup misses; Broder'97
    resemblance vs containment). Exact inverted-index join, recall 1."""
    from reader_spark.ops.dedup import containment_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk LLM pretraining packing (GPT-style): documents'
    whitespace tokens laid end-to-end in doc_id order and cut into 512-
    token training sequences; a doc straddling a cut yields one row per
    sequence touched. Integer-exact prefix-sum layout; the production
    path packs per shard (partition_cols) — this is the documented
    global-order oracle twin (same contract as token_shards)."""
    from reader_spark.ops.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", 512)


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup = k-means cells +
    within-cell cosine prune, the curation pass that removes paraphrase/
    boilerplate duplicates exact and MinHash dedup miss. Seeded centroids
    (the 8 smallest vec_ids >= 100 — same portable rule as ann_ivf_seeded)
    make the whole verdict oracle-checkable; keeper rule = lowest-id
    exemplar per semantic neighborhood. The only shuffle is the cell
    equi-join (no all-pairs); 73/500 pruned at tau=0.35 on this corpus."""
    from reader_spark.ops.semdedup import semdedup

    emb = _read(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.where(F.col("vec_id") >= 100)
        .orderBy("vec_id")
        .limit(8)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    return semdedup(emb, centroids, tau=0.35)


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023): per-document log importance weights for
    selecting raw-corpus docs that match a target distribution (here:
    the English subset poses as the high-quality target). Hashed
    unigram+bigram models (256 buckets, portable md5 hash) for target p
    and raw q; log w(d) = Σ c_{d,f}(ln p_f − ln q_f), add-1 smoothed.
    The model is a 256-row broadcast dim; scoring is two map-side-combined
    counts + one broadcast join — no global sort, no Python. Resampling
    step = ops.sampling.weighted_sample downstream."""
    from reader_spark.ops.dsir import dsir_log_weights

    docs = _read(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs, "doc_id", "text", target=F.col("lang") == "en", buckets=256
    )


def _drift_arms(events: DataFrame) -> DataFrame:
    """Drift-check input: the five real event types under a random
    (user-parity) split — the detector's false-positive-rate check, all
    five MUST stay quiet — plus one planted 'click_shifted' arm whose odd
    users report 1.75x values (a feed that silently changed units), which
    MUST fire. Both branches of the detector appear in one oracle."""
    a = (F.col("user_id") % 2 == 0).alias("a")
    base = events.select(F.col("event_type").alias("key"), F.col("value").alias("v"), a)
    shifted = events.where(F.col("event_type") == "click").select(
        F.lit("click_shifted").alias("key"),
        F.when(F.col("user_id") % 2 == 0, F.col("value"))
        .otherwise(F.round(F.col("value") * 1.75, 9))
        .alias("v"),
        a,
    )
    return base.unionByName(shifted)


def _q_value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key two-sample Kolmogorov-Smirnov drift check (exact tie-correct
    ECDF max-gap + Smirnov's alpha=0.05 critical value): five real event
    types under a random split stay quiet, the planted 1.75x-shifted arm
    fires. All windows partition by the key — no global sort."""
    from reader_spark.ops.drift import ks_two_sample

    events = _read(spark, sf_dir, "events")
    return ks_two_sample(_drift_arms(events), "key", "v", in_a=F.col("a"))


def _q_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Population Stability Index against decile bins of the
    reference arm, add-1 smoothed (>0.2 = significant shift): quiet on the
    five random splits, fires on the planted 1.75x arm. One exact
    percentile aggregate per key (approx_percentile is the documented
    100 TB swap), then scan-local binning; the term sum runs over the
    FULL decile grid — a bin empty in both arms still carries a nonzero
    smoothed term when arm sizes differ."""
    from reader_spark.ops.drift import psi_deciles

    events = _read(spark, sf_dir, "events")
    return psi_deciles(_drift_arms(events), "key", "v", in_ref=F.col("a"))


def _q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    same deterministic domain link graph as pagerank/HITS/degree-stats.
    Degree-oriented enumeration (Suri & Vassilvitskii 2011) — wedges form
    only at each edge's lower-degree endpoint, so hub nodes cannot go
    quadratic ('curse of the last reducer'); the oracle counts the same
    triangles via the canonical a<b<c three-way join."""
    from reader_spark.ops.graph import triangle_counts

    docs = _read(spark, sf_dir, "documents")
    nsrc = docs.agg(F.countDistinct("source").alias("nsrc"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("link:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    edges = (
        docs.crossJoin(F.broadcast(nsrc))
        .select(
            F.col("source").alias("src"),
            F.concat(F.lit("src"), F.pmod(h, F.col("nsrc")).cast("string")).alias("dst"),
        )
        .distinct()
    )
    return triangle_counts(edges)


def _q_embedding_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization of the embedding corpus: per-dim [min,max]
    trained distributedly (posexplode + map-side-combined min/max, one-row
    broadcast dim — never collected), codes = floor(round((v-mn)*255/
    (mx-mn), 9)) per dimension. The 4x-per-dim memory rung below PQ;
    oracle recomputes every code from the same range math in SQL."""
    from reader_spark.ops.ann import sq8_encode, sq8_train_ranges

    emb = _read(spark, sf_dir, "embeddings")
    enc = sq8_encode(emb, sq8_train_ranges(emb))
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), ","
        ).alias("codes_str"),
    )


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS): per-doc
    digest + count of the selected k-gram hashes (k=3 words, window w=4,
    rightmost-min tie rule via a single portable integer key). Any shared
    run of >= w+k-1 tokens between two docs is guaranteed a common
    fingerprint — the sound near-copy candidate index at ~2/(w+1) of the
    shingle stream. One doc-partitioned window, no global sort."""
    from reader_spark.ops.winnow import winnow_fingerprints

    docs = _read(spark, sf_dir, "documents")
    sel = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4)
    fp = F.array_sort(F.collect_list(F.struct("sel_pos", "gram_hash")))
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.md5(
            F.array_join(
                F.transform(
                    fp,
                    lambda s: F.concat_ws(
                        ":",
                        s.getField("sel_pos").cast("string"),
                        s.getField("gram_hash").cast("string"),
                    ),
                ),
                ";",
            )
        ).alias("fp_digest"),
    )


def _q_coreset_k_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985; Sener & Savarese 2018):
    5 maximally-spread exemplar vectors plus the corpus coverage radius
    after each pick — the diversity-coverage end of curation (SemDeDup
    prunes redundancy; this picks coverage). k driver rounds, each ONE
    literal-center distance update + a 1-row TakeOrdered; oracle = the
    same 5 rounds as unrolled MATERIALIZED CTEs."""
    from reader_spark.ops.coreset import k_center_select

    emb = _read(spark, sf_dir, "embeddings")
    return k_center_select(emb, k=5)


def _q_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distilled linear quality-classifier INFERENCE as pure native
    columns: sigmoid over literal weights x the oracle-proven feature
    battery (stopword/punct/word-length/alpha/log-tokens). The scoring
    path any fasttext-distilled quality model runs at 100 TB — zero
    Python, zero shuffle, scan-bound; swap the weight dict for a real
    model's coefficients."""
    from reader_spark.ops.textstats import quality_logit_score

    docs = _read(spark, sf_dir, "documents")
    return quality_logit_score(docs)


def _q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match step over the winnowing index: doc pairs sharing >= 2
    selected fingerprints (104 candidate pairs on this corpus). Stop-
    fingerprints (doc-frequency > 50) are cut before pairing — the same
    giant-bucket guard as the LSH star-edge fix, so a boilerplate k-gram
    can never emit a quadratic pair blowup."""
    from reader_spark.ops.winnow import winnow_pairs

    docs = _read(spark, sf_dir, "documents")
    return winnow_pairs(docs, "doc_id", "text", k=3, w=4, min_shared=2)


def _q_feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer (Weinberger et al. 2009): signed hashed
    bag-of-words -> L2-unit 64-dim document vectors, no vocabulary, no fit
    — the deterministic text->vector bridge into SemDeDup/ANN/SQ8/k-center.
    Integer sign-summed counts make the squared norm EXACT (shuffle-order-
    proof); emitted as (doc_id, i, v) rows so the value compare stays in
    native doubles."""
    from reader_spark.ops.vectorize import feature_hash_vectors

    docs = _read(spark, sf_dir, "documents")
    return feature_hash_vectors(docs, "doc_id", "text", dim=64).select(
        "doc_id", F.posexplode("vector").alias("i", "v")
    )


def _q_doc_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TEXT similarity search with no embedding model: hashed
    doc vectors (feature_hash_vectors) -> exact cosine top-10 for doc 0
    (brute_force_topk literal-query path, self excluded). The composition
    proof that the vectorizer's output drops straight into the ANN
    machinery; at scale the same vectors feed the LSH/IVF bucketed paths."""
    from reader_spark.ops.ann import brute_force_topk
    from reader_spark.ops.vectorize import feature_hash_vectors

    docs = _read(spark, sf_dir, "documents")
    vecs = feature_hash_vectors(docs, "doc_id", "text", dim=64)
    qv = [float(v) for v in vecs.where(F.col("doc_id") == 0).head()["vector"]]
    return brute_force_topk(
        vecs.where(F.col("doc_id") != 0),
        qv,
        k=10,
        id_col="doc_id",
        vec_col="vector",
    )


def _q_salted_domain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact x dim equi-join (ops.skew.salted_join): the fact side
    scatters each key across 16 sub-keys, the dim side replicates 16x, and
    the join runs on (key, salt) so no partition ever holds a hot domain
    whole. Salting is load-balancing only — the oracle is the PLAIN join,
    proving result-equality."""
    from reader_spark.ops.skew import salted_join

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    dim = docs.groupBy("source").agg(
        F.round(F.avg("n_chars"), 6).alias("src_avg_chars"),
        F.count(F.lit(1)).alias("src_docs"),
    )
    out = salted_join(docs, dim, on=["source"], n_salt=16)
    return out.select(
        "doc_id",
        "source",
        "src_avg_chars",
        "src_docs",
        (F.col("n_chars") > F.col("src_avg_chars")).alias("above_avg"),
    )


def _q_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-truncation fidelity of the embedding space (ops.evals.
    matryoshka_eval, Kusupati et al. 2022): cosine preserved at dims
    8/16/32 of 64 over deterministic adjacent-id pairs — the readout for
    shrinking the ANN index width. One equi-join + one groupBy; integer
    nano-unit means with a +1 shift (Spark div truncates, DuckDB //
    floors — identical only for non-negative sums)."""
    from reader_spark.ops.evals import matryoshka_eval

    emb = _read(spark, sf_dir, "embeddings")
    return matryoshka_eval(emb, "vec_id", "embedding", (8, 16, 32))


def _q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival counts through the stacked quality gates — the funnel
    readout a curation pipeline publishes (how many docs each rule
    kills, cumulatively): all docs -> n-gram repetition rules -> Gopher
    format battery -> target language. The gates are native columns;
    the funnel is conditional aggregation (no second pass); the n-gram
    gate reuses repetition_profile's single key-bounded groupBy. (A PII
    stage would be the natural 4th gate but is vacuous on this corpus —
    zero PII hits — so the registered funnel gates on lang instead.)"""
    from reader_spark.ops.textstats import (
        gopher_quality_columns,
        repetition_profile,
    )
    from reader_spark.spark.fanout import fanout_scan

    # gopher_quality_columns is deliberately shuffle-free (plan-pinned on
    # gopher_rules); here the join forces shuffles anyway, so fan the
    # scan-starved corpus out once before both regex-heavy branches.
    docs = fanout_scan(_read(spark, sf_dir, "documents"))
    g = gopher_quality_columns(docs, "text")
    r = repetition_profile(docs, "doc_id", "text", top_ns=(2, 3), dup_ns=(3,))
    j = (
        g.select("doc_id", "lang", "gopher_pass")
        .join(r.select("doc_id", "rep_pass"), "doc_id")
        .select(
            "gopher_pass",
            "rep_pass",
            (F.col("lang") == "en").alias("lang_ok"),
        )
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("rep_pass").cast("long")).alias("n1"),
        F.sum((F.col("rep_pass") & F.col("gopher_pass")).cast("long")).alias(
            "n2"
        ),
        F.sum(
            (F.col("rep_pass") & F.col("gopher_pass") & F.col("lang_ok"))
            .cast("long")
        ).alias("n3"),
    )
    stages = F.array(
        F.struct(F.lit(0).alias("stage_id"), F.lit("all_docs").alias("stage"), F.col("n0").alias("n_surviving")),
        F.struct(F.lit(1).alias("stage_id"), F.lit("ngram_repetition").alias("stage"), F.col("n1").alias("n_surviving")),
        F.struct(F.lit(2).alias("stage_id"), F.lit("gopher_rules").alias("stage"), F.col("n2").alias("n_surviving")),
        F.struct(F.lit(3).alias("stage_id"), F.lit("target_lang_en").alias("stage"), F.col("n3").alias("n_surviving")),
    )
    return (
        agg.select(F.explode(stages).alias("s"))
        .select("s.stage_id", "s.stage", F.col("s.n_surviving").cast("long").alias("n_surviving"))
    )


def _q_centroid_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration sweep (ops.evals.pr_curve): can cosine to the
    label-0 centroid classify label 0? Scores = round-9 cosine of every
    vector to that centroid (label_centroids' distributed algebra — one
    posexplode, per-dim means, dot/norm sums), thresholds at 2 dp, exact
    tp/fp/fn counts + round-6 precision/recall/f1 per threshold. The
    readout a pipeline uses to pick a quality-gate cut."""
    from reader_spark.ops.evals import pr_curve

    emb = _read(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("p", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent0 = (
        vals.where(F.col("label") == 0)
        .groupBy("p")
        .agg(F.round(F.avg("v"), 9).alias("c"))
    )
    scored = (
        vals.join(cent0, "p")
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("nv"),
            F.sum(F.col("c") * F.col("c")).alias("nc"),
        )
        .select(
            F.round(
                F.try_divide(
                    F.col("dot"), F.sqrt(F.col("nv")) * F.sqrt(F.col("nc"))
                ),
                9,
            ).alias("cos"),
            (F.col("label") == 0).cast("int").alias("is_pos"),
        )
    )
    return pr_curve(scored, "cos", "is_pos", round_dp=2)


def _q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM perplexity (ops.textstats.bigram_lm_scores):
    the conditional sibling of lm_perplexity — flags shuffled/templated
    word ORDER the unigram filter passes. Two map-side-combined count
    groupBys + key-bounded scoring joins; integer nano-unit mean."""
    from reader_spark.ops.textstats import bigram_lm_scores

    docs = _read(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, "doc_id", "text")


def _q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous/HRW sharding (Thaler & Ravishankar 1998) with the
    minimal-disruption property ON DISPLAY: every doc assigned under 8
    and 9 shards; growing the fleet moves only the keys the NEW shard
    wins (~1/9 here, vs ~8/9 under pmod re-sharding). Pure expressions —
    no state, no ring, no shuffle beyond the distinct."""
    from reader_spark.ops.shard import reshard_movement

    docs = _read(spark, sf_dir, "documents")
    return reshard_movement(docs, "doc_id", n_from=8, n_to=9)


def _q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from sketches (CMS inner product, Cormode &
    Muthukrishnan 2005): |views x purchases on user_id| estimated from
    two 4x64 sketches WITHOUT touching the fact tables — the planner-side
    cardinality estimate. One row: truth, estimate, overcount (one-sided:
    est >= truth by construction)."""
    from reader_spark.ops.sketch import cms_build, cms_join_size

    events = _read(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view")
    purchases = events.where(F.col("event_type") == "purchase")
    est = cms_join_size(
        cms_build(views, "user_id", depth=4, width=64, portable=True),
        cms_build(purchases, "user_id", depth=4, width=64, portable=True),
    )
    va = views.groupBy("user_id").agg(F.count(F.lit(1)).alias("na"))
    pb = purchases.groupBy("user_id").agg(F.count(F.lit(1)).alias("nb"))
    truth = va.join(pb, "user_id").agg(
        F.sum(F.col("na") * F.col("nb")).cast("long").alias("true_join_size")
    )
    return truth.crossJoin(est).select(
        "true_join_size",
        "est_join_size",
        (F.col("est_join_size") - F.col("true_join_size")).alias("overcount"),
    )


def _q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct counting (Bar-Yossef et al. 2002) — the
    order-statistics sketch family alongside HLL: per event type, the 32
    smallest user-id hashes give est = (k-1)/u_(k), and the SAME bottom-k
    set doubles as a mergeable uniform sample of the key space. Truth
    joined in for the accuracy row; groups under k report exact."""
    from reader_spark.ops.sketch import kmv_distinct

    events = _read(spark, sf_dir, "events")
    est = kmv_distinct(events, "event_type", "user_id", k=32)
    truth = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return truth.join(est, "event_type").select(
        "event_type",
        "true_distinct",
        "n_sketch",
        "est_distinct",
        F.round(F.col("est_distinct") / F.col("true_distinct") - 1.0, 6).alias(
            "rel_err"
        ),
    )


def _q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap (Jaccard) between every event-type pair estimated
    from bottom-k sketches ALONE (Broder's single-permutation estimator):
    the union's bottom-64 members' presence in each side's sketch is
    provably exact (a union-bottom-k element of A always sits inside A's
    own bottom-k), so pair work never reads the fact table. Truth joined
    in for the accuracy column."""
    from reader_spark.ops.sketch import kmv_jaccard_pairs

    events = _read(spark, sf_dir, "events")
    est = kmv_jaccard_pairs(events, "event_type", "user_id", k=64)
    us = events.select(F.col("event_type").alias("g"), "user_id").distinct()
    sizes = us.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    inter = (
        us.alias("a")
        .join(
            us.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    truth = (
        inter.join(sizes.withColumnRenamed("g", "group_a"), "group_a")
        .withColumnRenamed("c", "ca")
        .join(sizes.withColumnRenamed("g", "group_b"), "group_b")
        .withColumnRenamed("c", "cb")
        .select(
            "group_a",
            "group_b",
            F.round(
                F.col("inter") / (F.col("ca") + F.col("cb") - F.col("inter")), 6
            ).alias("true_jaccard"),
        )
    )
    return truth.join(est, ["group_a", "group_b"]).select(
        "group_a",
        "group_b",
        "union_k",
        "jaccard_est",
        "true_jaccard",
        F.round(F.col("jaccard_est") - F.col("true_jaccard"), 6).alias("err"),
    )


def _q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact (mojibake) detection + repair -- the ftfy-class
    cleanup every web corpus needs (UTF-8 bytes misread as CP1252:
    \u00e2\u20ac\u2122 for an apostrophe, caf\u00c3\u00a9 for caf\u00e9).
    Docs with doc_id%5==0 get a planted corrupted snippet; the repair
    chain (native replaces, longest-first, scan-bound) must restore the
    clean twin byte-for-byte (md5-compared) and leave zero residual
    artifacts. Clean docs must pass through untouched."""
    from reader_spark.ops.textstats import mojibake_count_col, mojibake_fix_col

    bad = (
        "it\u00e2\u20ac\u2122s \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"
        " caf\u00c3\u00a9"
    )
    good = "it\u2019s \u201cquoted\u201d caf\u00e9"
    docs = _read(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" " + bad))
    ).otherwise(F.col("text"))
    clean = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" " + good))
    ).otherwise(F.col("text"))
    fixed = mojibake_fix_col(planted)
    return docs.select(
        "doc_id",
        mojibake_count_col(planted).alias("n_mojibake"),
        mojibake_count_col(fixed).alias("n_residual"),
        F.when(F.md5(fixed) == F.md5(clean), 1).otherwise(0).alias("repaired_ok"),
    )


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the retrieval-
    training data prep of DPR/SimCSE-style pipelines): for each anchor
    vector, the top-3 most-similar vectors with a DIFFERENT label --
    the negatives that actually teach a margin, versus random negatives
    that are trivially far. Anchors = vec_id < 20; cosine round-4,
    (cosine desc, id) tiebreak. This is the EXACT brute-force twin
    (theta-join, fixture-scale only); `hard_negatives_bucketed` is the
    LSH-candidate production path."""
    from reader_spark.ops.negatives import hard_negatives_brute

    emb = _read(spark, sf_dir, "embeddings")
    return hard_negatives_brute(emb.where(F.col("vec_id") < 20), emb, k=3)


def _q_hard_negatives_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB hard-negative path: candidates from a multi-probe
    hyperplane-LSH bucket equi-join (cross-label filter inside the join,
    each anchor probes its Hamming-1 buckets too), exact cosine re-rank
    within candidates only — no BroadcastNestedLoopJoin anywhere
    (plan-tested). ENGINE-PORTABLE literal md5 planes so every emitted
    (anchor, negative, cosine, rank) is oracle-checked value-for-value."""
    from reader_spark.ops.ann import md5_plane_weights
    from reader_spark.ops.negatives import hard_negatives_bucketed

    emb = _read(spark, sf_dir, "embeddings")
    return hard_negatives_bucketed(
        emb.where(F.col("vec_id") < 20),
        emb,
        k=3,
        weights=md5_plane_weights(dim=64, planes=5),
        multiprobe=True,
    )


def _q_doc_sim_topk_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXT similarity search, bucketed production twin of doc_sim_topk:
    feature-hashed document vectors -> hyperplane-LSH bucket equi-join ->
    exact cosine re-rank of bucket-mates, top-10 per query doc (doc_id <
    4, self excluded). No driver-side vector fetch (the brute twin
    collects its query vector; here queries stay a DataFrame) and no
    all-pairs scoring — the join is keyed by bucket. Literal md5 planes
    make it oracle-checkable end to end."""
    from reader_spark.ops.ann import lsh_bucketed_topk_literal, md5_plane_weights
    from reader_spark.ops.vectorize import feature_hash_vectors

    docs = _read(spark, sf_dir, "documents")
    # localCheckpoint: both join sides read the hashed vectors; without
    # it the full vectorization (the dominant cost) runs once per side
    vecs = feature_hash_vectors(docs, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    return lsh_bucketed_topk_literal(
        vecs.where(F.col("doc_id") >= 4),
        vecs.where(F.col("doc_id") < 4),
        md5_plane_weights(dim=64, planes=2),
        k=10,
        id_col="doc_id",
        vec_col="vector",
    )


def _q_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent tokens via the two-pass Misra-Gries pipeline
    (ops.heavy): bounded per-partition candidate sketches, then an exact
    count of candidates only -- the shuffle is bounded by the candidate
    set, never the vocabulary. Output = EXACTLY the tokens whose corpus
    share clears the k=200 sketch guarantee (integer rational cut,
    engine-exact); the oracle is the plain GROUP BY / HAVING twin."""
    from reader_spark.ops.heavy import heavy_hitters

    docs = _read(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    ).where(F.col("token") != "")
    out = heavy_hitters(tokens, "token", k=200)
    return out.select(F.col("value").alias("token"), F.col("cnt"))


def _q_dedup_cluster_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters (exact
    Jaccard>=0.8 pairs -> connected components, same plumbing the oracled
    dedup_components row certifies) keep their HIGHEST-n_chars member
    instead of the lowest id -- curation keeps the best copy, not the
    first crawled. Ties break to lowest id; n_members carries cluster
    size for lineage."""
    from reader_spark.ops.dedup import (
        cluster_exemplars,
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    comps = connected_components(pairs)
    scores = docs.select(
        "doc_id", F.col("n_chars").cast("long").alias("score")
    )
    return cluster_exemplars(comps, scores)


_MEDIA_MAGICS = [
    "FFD8FF",
    "89504E470D0A1A0A",
    "47494638",
    "52494646",
    "25504446",
    "000000186674797069736F6D",
    "",
]


def _q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-level media dedup (ops.multimodal.media_dedup) over
    synthesized blobs: a real magic-byte header by doc_id%7 prepended to
    the source-name bytes, so the same asset recurs across documents the
    way logos and CDN-mirrored images do at web scale. Groups by content
    digest (md5-of-hex, engine-portable), keeper = min id, kind sniffed
    from the magic bytes. Only digests shuffle, never the blobs."""
    from reader_spark.ops.multimodal import media_dedup

    docs = _read(spark, sf_dir, "documents")
    header = F.element_at(
        F.array(*[F.to_binary(F.lit(m), F.lit("hex")) for m in _MEDIA_MAGICS]),
        (F.col("doc_id") % 7 + 1).cast("int"),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode(F.col("source"), "UTF-8")).alias("content"),
    )
    return media_dedup(media, portable=True)


def _q_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment hashed on the SOURCE key, not the doc:
    same-site near-duplicates (templated pages, mirrors) land in the SAME
    split by construction, so eval can't score memorized training
    neighbors (the split-leakage failure mode of doc-level hashing).
    split_column's md5 bucket carve is replicated verbatim in the oracle;
    output is the per-split rollup."""
    from reader_spark.ops.sampling import split_column

    docs = _read(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "split",
        split_column(
            F.col("source"),
            {"train": 0.8, "val": 0.1, "test": 0.1},
            portable=True,
        ),
    )
    return labeled.groupBy("split").agg(
        F.countDistinct("source").alias("n_sources"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


def _q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a 20k-token training mix at weights en:.5 fr:.2 de:.2
    zh:.1 (es excluded -- the mix is a whitelist): per language, docs are
    taken longest-first (n_chars desc, doc_id tiebreak) until the
    language's integer budget is crossed, straddler included
    (ops.sampling.token_budget_mix greedy-fill semantics). Integer token
    counts and integer budgets keep the cut engine-exact."""
    from reader_spark.ops.sampling import token_budget_mix

    docs = _read(spark, sf_dir, "documents").withColumn(
        "n_tokens",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long"),
    )
    out = token_budget_mix(
        docs,
        "lang",
        "n_tokens",
        20_000,
        {"en": 0.5, "fr": 0.2, "de": 0.2, "zh": 0.1},
        score_col="n_chars",
        id_col="doc_id",
    )
    return out.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        F.col("group_budget").cast("long").alias("group_budget"),
    )


def _q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unicode-script histogram + dominant script
    (ops.textstats.script_profile): the tokenizer-routing signal computed
    BEFORE language id — Latin/CJK/Cyrillic/Arabic/digit counts as exact
    integers (one regexp_replace per class, scan-bound, zero shuffles)
    with first-listed-class tie priority. Counts are UTF-16==codepoint
    safe on this corpus (BMP-only, verified)."""
    from reader_spark.ops.textstats import script_profile

    docs = _read(spark, sf_dir, "documents")
    return script_profile(docs, "doc_id", "text")


def _q_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping passage chunking (ops.chunks.passage_chunks,
    size=32/stride=24): every doc becomes model-window passages with the
    tail start always covered, chunk_id in closed integer form
    ceil((start-1)/stride) — a pure per-row map (explode + O(size)
    slices), no shuffle, nothing quadratic."""
    from reader_spark.ops.chunks import passage_chunks

    docs = _read(spark, sf_dir, "documents")
    return passage_chunks(docs, "doc_id", "text", size=32, stride=24)


def _q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher n-gram repetition rules (ops.textstats.repetition_profile):
    top-2/3-gram char fractions + duplicated-3-gram char fraction (the
    corpus has no repeated 5-grams, so the registered query uses dup n=3
    to keep the branch non-vacuous; the op defaults to Gopher's n=5).
    ONE key-bounded (doc, n, gram) groupBy — no self-join, windows are
    per-doc partitions."""
    from reader_spark.ops.textstats import repetition_profile

    docs = _read(spark, sf_dir, "documents")
    return repetition_profile(
        docs, "doc_id", "text", top_ns=(2, 3), dup_ns=(3,)
    )


# The driver's correctness snapshot covers the FIRST 50 registry entries in
# iteration order (CORRECTNESS_r01/_r02 are exactly that slice).  This list
# curates the window: flagship extraction/pipeline queries plus every
# operator family that has not yet received a driver-level row, each with a
# full value-hash oracle.  Everything not listed follows in original order
# (most of it already driver-green in r01/r02).
_DRIVER_WINDOW = [
    # ROUND-5 ROTATION (VERDICT r4 next-round #2): the 48 oracled queries
    # never driver-certified across r1-r4 — the 45 remaining rotation tail
    # (incl. the now-fixed cdc_chunks) plus this round's 3 new exact-BPE
    # queries — with the 2 spare slots re-certifying the extraction
    # flagships on the current code. After this snapshot every oracled
    # query in the registry has a driver-level hash-green row in some
    # CORRECTNESS_r0N.json (cumulative 190/190); the 6 rows-only queries
    # (extract_fixture_spans, minhash_lsh_candidates, simhash_near_pairs,
    # fingerprint_groups, ann_lsh, ann_ivf) are hash-sketch/fixture
    # production twins whose oracled md5 siblings are all certified.
    "cdc_chunks",
    "curriculum_order",
    "source_diversity",
    "tokenizer_fertility",
    "text_clusters",
    "binary_recall_eval",
    "decontaminate_bloom",
    "hll_distinct",
    "cohort_retention",
    "price_histogram",
    "scd2_user_state",
    "events_sliding_windows",
    "twap_user_value",
    "value_outliers",
    "lang_source_chi2",
    "top_event_paths",
    "hybrid_search_rrf",
    "langid_confusion",
    "term_pmi",
    "readability_scores",
    "value_quantile_norm",
    "ab_test_proportions",
    "revenue_gini",
    "user_entropy",
    "zipf_fit",
    "user_burstiness",
    "winnow_fingerprints",
    "feature_hash_vectors",
    "doc_sim_topk",
    "kmv_distinct",
    "hard_negatives",
    "vocab_heavy_hitters",
    "dedup_cluster_exemplars",
    "media_dedup",
    "leakage_safe_splits",
    "token_budget_mix",
    "script_profile",
    "passage_chunks",
    "repetition_profile",
    "caption_pairs",
    "interleave_profile",
    "ccnet_buckets",
    "centroid_pr_curve",
    "matryoshka_eval",
    "salted_domain_join",
    "bpe_token_counts",
    "bpe_sequence_packing",
    "bpe_encode_sample",
    "bpe_learn_merges",
    "nextfit_packing",
]


def _curate(registry: dict) -> dict:
    """Reorder the registry so _DRIVER_WINDOW names come first."""
    # The driver snapshots exactly registry[:50]; a 51st name (or a
    # dropped one) silently shifts which queries get driver-verified.
    if len(_DRIVER_WINDOW) != 50:
        raise ValueError(
            f"_DRIVER_WINDOW must have exactly 50 names, got {len(_DRIVER_WINDOW)}"
        )
    if len(set(_DRIVER_WINDOW)) != 50:
        raise ValueError("_DRIVER_WINDOW contains duplicates")
    missing = [n for n in _DRIVER_WINDOW if n not in registry]
    if missing:  # fail loudly: a typo here silently wastes a window slot
        raise KeyError(f"_DRIVER_WINDOW names not in registry: {missing}")
    head = {n: registry[n] for n in _DRIVER_WINDOW}
    tail = {n: f for n, f in registry.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _curate({
        "extract_fixture_spans": _q_extract_fixture_spans,
        "extract_documents_spans": _q_extract_documents_spans,
        "pricing_summary": _q_pricing_summary,
        "top_revenue_orders": _q_top_revenue_orders,
        "customer_nation_rollup": _q_customer_nation_rollup,
        "events_user_stats": _q_events_user_stats,
        "events_hourly": _q_events_hourly,
        "user_retention": _q_user_retention,
        "funnel": _q_funnel,
        "events_sessions": _q_events_sessions,
        "part_brand_revenue": _q_part_brand_revenue,
        "customers_without_orders": _q_customers_without_orders,
        "regional_supplier_volume": _q_regional_supplier_volume,
        "nation_market_share": _q_nation_market_share,
        "returns_rollup": _q_returns_rollup,
        "detected_lang": _q_detected_lang,
        "blocklist_filter": _q_blocklist_filter,
        "token_entropy": _q_token_entropy,
        "curriculum_order": _q_curriculum_order,
        "source_diversity": _q_source_diversity,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "text_clusters": _q_text_clusters,
        "dedup_embedding_cosine": _q_dedup_embedding_cosine,
        "embedding_dedup_lsh_md5": _q_embedding_dedup_lsh_md5,
        "embedding_dedup_components": _q_embedding_dedup_components,
        "events_pivot": _q_events_pivot,
        "quality_filter": _q_quality_filter,
        "value_percentiles": _q_value_percentiles,
        "props_json": _q_props_json,
        "media_metadata": _q_media_metadata,
        "resume_remaining": _q_resume_remaining,
        "warc_extract": _q_warc_extract,
        "error_taxonomy": _q_error_taxonomy,
        "pdf_extract": _q_pdf_extract,
        "pdf_dehyphenate": _q_pdf_dehyphenate,
        "crawl_fixture": _q_crawl_fixture,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "minhash_lsh_candidates": _q_minhash_lsh_candidates,
        "minhash_lsh_md5": _q_minhash_lsh_md5,
        "dedup_components": _q_dedup_components,
        "corpus_prep": _q_corpus_prep,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "simhash_md5": _q_simhash_md5,
        "simhash_banded_md5": _q_simhash_banded_md5,
        "text_quality": _q_text_quality,
        "token_counts": _q_token_counts,
        "gopher_rules": _q_gopher_rules,
        "pii_scrub": _q_pii_scrub,
        "token_shards": _q_token_shards,
        "stratified_sample": _q_stratified_sample,
        "domain_quality_rollup": _q_domain_quality_rollup,
        "lang_trigram": _q_lang_trigram,
        "dataset_splits": _q_dataset_splits,
        "repetition_ratio": _q_repetition_ratio,
        "top_terms": _q_top_terms,
        "lang_distribution": _q_lang_distribution,
        "fingerprint_groups": _q_fingerprints,
        "fingerprints_md5": _q_fingerprints_md5,
        "ann_topk": _q_ann_topk,
        "binary_hamming_topk": _q_binary_hamming_topk,
        "binary_recall_eval": _q_binary_recall_eval,
        "ann_lsh": _q_ann_lsh,
        "ann_lsh_md5": _q_ann_lsh_md5,
        "ann_ivf": _q_ann_ivf,
        "ann_ivf_seeded": _q_ann_ivf_seeded,
        "pq_encode_md5": _q_pq_encode_md5,
        "pq_adc_topk_md5": _q_pq_adc_topk_md5,
        "ivfadc_md5": _q_ivfadc_md5,
        "url_keys": _q_url_keys,
        "content_url_filter": _q_content_url_filter,
        "strip_tags": _q_strip_tags,
        "batch_metadata": _q_batch_metadata,
        "asof_clicks": _q_asof_clicks,
        "attribution_range_join": _q_attribution_range_join,
        "decontaminate": _q_decontaminate,
        "decontaminate_bloom": _q_decontaminate_bloom,
        "duplicate_spans": _q_duplicate_spans,
        "bm25_search": _q_bm25_search,
        "numeric_profile": _q_numeric_profile,
        "cms_user_counts": _q_cms_user_counts,
        "hll_distinct": _q_hll_distinct,
        "weighted_sample": _q_weighted_sample,
        "bloom_visited": _q_bloom_visited,
        "line_dedup": _q_line_dedup,
        "domain_mix_sample": _q_domain_mix_sample,
        "lm_perplexity": _q_lm_perplexity,
        "pagerank_domains": _q_pagerank_domains,
        "incremental_dedup": _q_incremental_dedup,
        "funnel_conversion": _q_funnel_conversion,
        "zorder_events": _q_zorder_events,
        "hilbert_events": _q_hilbert_events,
        "weighted_minhash_md5": _q_weighted_minhash_md5,
        "weighted_jaccard_pairs": _q_weighted_jaccard_pairs,
        "pii_card_audit": _q_pii_card_audit,
        "phrase_search": _q_phrase_search,
        "text_date_profile": _q_text_date_profile,
        "corpus_recency": _q_corpus_recency,
        "bm25f_search": _q_bm25f_search,
        "lexicon_profile": _q_lexicon_profile,
        "math_signals": _q_math_signals,
        "distinct_ngram_diversity": _q_distinct_ngram_diversity,
        "semantic_decontaminate": _q_semantic_decontaminate,
        "event_bursts": _q_event_bursts,
        "cohort_retention": _q_cohort_retention,
        "hll_merged": _q_hll_merged,
        "event_transitions": _q_event_transitions,
        "jsonl_ingest": _q_jsonl_ingest,
        "price_histogram": _q_price_histogram,
        "corpus_scorecard": _q_corpus_scorecard,
        "scd2_user_state": _q_scd2_user_state,
        "fuzzy_source_match": _q_fuzzy_source_match,
        "value_trend": _q_value_trend,
        "data_quality_report": _q_data_quality_report,
        "ewma_user_value": _q_ewma_user_value,
        "events_sliding_windows": _q_events_sliding_windows,
        "twap_user_value": _q_twap_user_value,
        "value_outliers": _q_value_outliers,
        "similarity_join_exact": _q_similarity_join_exact,
        "lang_source_chi2": _q_lang_source_chi2,
        "top_event_paths": _q_top_event_paths,
        "crawl_budget_allocation": _q_crawl_budget_allocation,
        "unimax_mix": _q_unimax_mix,
        "hybrid_search_rrf": _q_hybrid_search_rrf,
        "langid_confusion": _q_langid_confusion,
        "term_pmi": _q_term_pmi,
        "nfc_normalize": _q_nfc_normalize,
        "lsh_quality_eval": _q_lsh_quality_eval,
        "snapshot_diff": _q_snapshot_diff,
        "cdc_chunks": _q_cdc_chunks,
        "readability_scores": _q_readability_scores,
        "hll_intersection": _q_hll_intersection,
        "value_quantile_norm": _q_value_quantile_norm,
        "label_centroids": _q_label_centroids,
        "ab_test_proportions": _q_ab_test_proportions,
        "revenue_gini": _q_revenue_gini,
        "user_entropy": _q_user_entropy,
        "sequence_packing": _q_sequence_packing,
        "containment_pairs": _q_containment_pairs,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "domain_boilerplate": _q_domain_boilerplate,
        "novelty_scores": _q_novelty_scores,
        "key_skew_profile": _q_key_skew_profile,
        "source_overlap": _q_source_overlap,
        "value_equidepth": _q_value_equidepth,
        "hits_domains": _q_hits_domains,
        "curation_shortlist": _q_curation_shortlist,
        "sequence_packing_sharded": _q_sequence_packing_sharded,
        "graph_degree_stats": _q_graph_degree_stats,
        "opq_encode_md5": _q_opq_encode_md5,
        "media_sniff": _q_media_sniff,
        "zipf_fit": _q_zipf_fit,
        "fk_audit": _q_fk_audit,
        "user_burstiness": _q_user_burstiness,
        "packing_stats": _q_packing_stats,
        "source_vocab_kl": _q_source_vocab_kl,
        "quality_token_pyramid": _q_quality_token_pyramid,
        "rate_limit_admission": _q_rate_limit_admission,
        "semdedup": _q_semdedup,
        "dsir_weights": _q_dsir_weights,
        "value_ks_drift": _q_value_ks_drift,
        "value_psi_drift": _q_value_psi_drift,
        "graph_triangles": _q_graph_triangles,
        "embedding_sq8": _q_embedding_sq8,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "coreset_k_center": _q_coreset_k_center,
        "quality_logit": _q_quality_logit,
        "winnow_pairs": _q_winnow_pairs,
        "feature_hash_vectors": _q_feature_hash_vectors,
        "doc_sim_topk": _q_doc_sim_topk,
        "doc_sim_topk_bucketed": _q_doc_sim_topk_bucketed,
        "interleaved_media_spans": _q_interleaved_media_spans,
        "rendezvous_shards": _q_rendezvous_shards,
        "cms_join_size": _q_cms_join_size,
        "kmv_distinct": _q_kmv_distinct,
        "span_kinds_full": _q_span_kinds_full,
        "kmv_jaccard": _q_kmv_jaccard,
        "mojibake_repair": _q_mojibake_repair,
        "hard_negatives": _q_hard_negatives,
        "hard_negatives_bucketed": _q_hard_negatives_bucketed,
        "vocab_heavy_hitters": _q_vocab_heavy_hitters,
        "dedup_cluster_exemplars": _q_dedup_cluster_exemplars,
        "media_dedup": _q_media_dedup,
        "leakage_safe_splits": _q_leakage_safe_splits,
        "token_budget_mix": _q_token_budget_mix,
        "script_profile": _q_script_profile,
        "passage_chunks": _q_passage_chunks,
        "repetition_profile": _q_repetition_profile,
        "caption_pairs": _q_caption_pairs,
        "caption_alignment": _q_caption_alignment,
        "span_langid_profile": _q_span_langid_profile,
        "template_clusters": _q_template_clusters,
        "table_cells": _q_table_cells,
        "outline_edges": _q_outline_edges,
        "section_chunks": _q_section_chunks,
        "ligature_fold": _q_ligature_fold,
        "typography_fold": _q_typography_fold,
        "interleave_profile": _q_interleave_profile,
        "bigram_lm": _q_bigram_lm,
        "multimodal_packing": _q_multimodal_packing,
        "ccnet_buckets": _q_ccnet_buckets,
        "span_corruption": _q_span_corruption,
        "centroid_pr_curve": _q_centroid_pr_curve,
        "remove_duplicate_spans": _q_remove_duplicate_spans,
        "quality_funnel": _q_quality_funnel,
        "matryoshka_eval": _q_matryoshka_eval,
        "media_phash_neardup": _q_media_phash_neardup,
        "audio_hk_neardup": _q_audio_hk_neardup,
        "interleaved_pii_redact": _q_interleaved_pii_redact,
        "span_boilerplate_strip": _q_span_boilerplate_strip,
        "interleaved_sample_render": _q_interleaved_sample_render,
        "salted_domain_join": _q_salted_domain_join,
        "sentence_spans_apply": _q_sentence_spans_apply,
        "sentence_spans_dedup": _q_sentence_spans_dedup,
        "c4_page_clean": _q_c4_page_clean,
        "justext_classify": _q_justext_classify,
        "justext_headings": _q_justext_headings,
        "justext_multilang": _q_justext_multilang,
        "boilerpipe_classify": _q_boilerpipe_classify,
        "cetr_classify": _q_cetr_classify,
        "crawl_delta": _q_crawl_delta,
        "change_rate": _q_change_rate,
        "crawl_priority": _q_crawl_priority,
        "crawl_trap_signals": _q_crawl_trap_signals,
        "url_templates": _q_url_templates,
        "anchor_corpus": _q_anchor_corpus,
        "section_rollup": _q_section_rollup,
        "url_variant_clusters": _q_url_variant_clusters,
        "content_aliases": _q_content_aliases,
        "sitemap_ingest": _q_sitemap_ingest,
        "recrawl_schedule": _q_recrawl_schedule,
        "cdx_index": _q_cdx_index,
        "ensemble_extract": _q_ensemble_extract,
        "politeness_slots": _q_politeness_slots,
        "robots_parse": _q_robots_parse,
        "cdx_merge": _q_cdx_merge,
        "semantic_delta": _q_semantic_delta,
        "refresh_allocation": _q_refresh_allocation,
        "source_quality_shrunk": _q_source_quality_shrunk,
        **_TOKENIZE_QUERIES,
        **_EVAL_QUERIES,
        **_CHAT_QUERIES,
        **_PREFERENCE_QUERIES,
        **_ACCOUNTING_QUERIES,
        **_CODE_QUERIES,
        **_CLUSTERING_QUERIES,
        **_BITEXT_QUERIES,
        **_GOVERNANCE_QUERIES,
        **_AUDIT_QUERIES,
        **_ARENA_QUERIES,
        **_DISCOVERY_QUERIES,
        **_MINING_QUERIES,
        **_WEBGRAPH_QUERIES,
        **_LM_QUERIES,
        **_LINKAGE_QUERIES,
        **_HOSTS_QUERIES,
    })


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the pre-registered parquet views)
# ---------------------------------------------------------------------------

# Oracle SQL lives in reader_spark/oracles.py (split out in round 4);
# re-exported here to keep the driver contract entry(sp)/queries()/oracle_sql().
from reader_spark.oracles import oracle_sql  # noqa: E402,F401

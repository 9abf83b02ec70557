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

from reader_spark.functions.text import LANG_STOPWORDS


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


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation (operator coverage: scan+filter+agg)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k.

    `orders` is a fact table that scales linearly with SF — no broadcast
    hint; AQE picks the strategy (sort-merge / shuffled-hash at scale,
    auto-broadcast only when the post-filter side is genuinely small).
    Only bounded dims (nation, region) get explicit broadcast hints.
    """
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


def _q_customer_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join (J3/J4 analogue) + rollup aggregate."""
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
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


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    from reader_spark.ops.ann import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    query_vec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return brute_force_topk(emb, [float(v) for v in query_vec], k=10)


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (approximate: rows-only check)."""
    from reader_spark.ops.ann import lsh_bucketed_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    return lsh_bucketed_topk(emb, queries, dim=64, k=5, planes=8)


def _q_ann_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN with ENGINE-PORTABLE literal planes (md5-derived
    weights embedded identically in the DuckDB oracle) — the fully
    oracle-checked twin of ann_lsh. Same physical shape: bucket equi-join,
    cosine on bucket-mates only, window top-k."""
    from reader_spark.ops.ann import lsh_bucketed_topk_literal, md5_plane_weights

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    return lsh_bucketed_topk_literal(
        emb, queries, md5_plane_weights(dim=64, planes=8), k=5
    )


def _q_ann_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search path with SEEDED centroids (8 fixed corpus vectors chosen
    by a portable rule: the 8 smallest vec_ids >= 100) — the fully
    oracle-checked twin of ann_ivf. Certifies the entire search machinery
    (argmin cell assignment, nprobe probing, cell equi-join, cosine top-k)
    value-for-value; the k-means trainer itself is recall-tested in pytest.
    """
    from reader_spark.ops.ann import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.where(F.col("vec_id") >= 100)
        .orderBy("vec_id")
        .limit(8)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    queries = emb.where(F.col("vec_id") < 4)
    return ivf_topk(emb, queries, centroids, k=5, nprobe=2)


def _q_pq_encode_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (m=8 subspaces, k=16 codes) with
    ENGINE-PORTABLE literal codebooks — oracle-checked code-for-code
    against DuckDB's argmin over the same literals. codes emitted as a
    comma-joined string for a portable value compare."""
    from reader_spark.ops.ann import md5_pq_codebooks, pq_encode

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    enc = pq_encode(emb, md5_pq_codebooks(dim=64, m=8, k=16))
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), ","
        ).alias("codes_str"),
    )


def _q_pq_adc_topk_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 over PQ codes (query = vec_id 0): the per-(subspace,
    code) distance table is literal on the Spark side and recomputed from
    the same codebook literals in the DuckDB oracle — scoring is m table
    lookups + a sum, no float vectors read."""
    from reader_spark.ops.ann import md5_pq_codebooks, pq_adc_topk, pq_encode

    emb = _read(spark, sf_dir, "embeddings")
    books = md5_pq_codebooks(dim=64, m=8, k=16)
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    enc = pq_encode(emb, books)
    return pq_adc_topk(enc, books, qv, topk=10)


def _q_ivfadc_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVFADC composition, oracle-checked end-to-end: seeded IVF
    centroids (portable rule) route queries to nprobe cells; PQ codes of
    the probed cells are scored by asymmetric distance against md5-literal
    codebooks. The DuckDB oracle rebuilds every stage from the same
    literals."""
    from reader_spark.ops.ann import ivfadc_topk, md5_pq_codebooks

    emb = _read(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.where(F.col("vec_id") >= 100)
        .orderBy("vec_id")
        .limit(8)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    queries = emb.where(F.col("vec_id") < 4)
    return ivfadc_topk(
        emb, queries, centroids, md5_pq_codebooks(dim=64, m=8, k=16), k=5, nprobe=2
    )


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: k-means coarse quantizer, nprobe-cell search
    (approximate: rows-only check; recall vs brute force tested in
    tests/test_ops.py::TestIvf)."""
    from reader_spark.ops.ann import ivf_topk, train_ivf_centroids

    emb = _read(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, n_cells=8, iters=2)
    queries = emb.where(F.col("vec_id") < 4)
    return ivf_topk(emb, queries, centroids, k=5, nprobe=2)


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


def _q_part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (lineitem x part x supplier).

    part/supplier grow with SF (not bounded dims like nation/region), so no
    forced broadcast — AQE auto-broadcasts while they fit under the
    threshold and falls back to shuffle joins at scale.
    """
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    supplier = _read(spark, sf_dir, "supplier")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


def _q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-table join: revenue by nation where customer and
    supplier share the nation, restricted to one region and a date range.
    Catalyst exercise: join reordering + broadcast of the dim chain
    (region->nation tiny, customer/supplier small) under AQE."""
    region = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _read(spark, sf_dir, "nation")
    customer = _read(spark, sf_dir, "customer")
    supplier = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    lineitem = _read(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("n_name", "revenue")
    )


def _q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: per order-year, the fraction of regional
    revenue supplied by one nation, NATION_3 (conditional aggregation over a
    multi-join; sum(when)/sum is the map-side-combinable form)."""
    nation = _read(spark, sf_dir, "nation")
    supplier = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .select("o_year", "mkt_share")
    )


def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the checkpoint-resume join shape (J5)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_nationkey")
    )


def _q_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over returnflag/linestatus."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
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


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank in ANSI SQL, mirroring
    ops/graph.pagerank's in-iteration 9 dp rounding term for term."""
    parts = [
        """
        WITH nsrc AS (SELECT count(DISTINCT source) AS n FROM documents),
        edges0 AS (
            SELECT source AS src,
                   'src' || CAST(CAST(('0x' || substr(md5('link:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                 % (SELECT n FROM nsrc) AS VARCHAR) AS dst
            FROM documents
        ),
        edges AS (
            SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
            FROM edges0 GROUP BY src, dst
        ),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges UNION SELECT dst FROM edges
            )
        ),
        nn AS (SELECT count(*) AS n FROM nodes),
        outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
        frac AS (
            SELECT e.src, e.dst, e.w / o.out_w AS frac
            FROM edges e JOIN outw o USING (src)
        ),
        r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 9) AS pr FROM nodes)
        """
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""",
        r{k} AS (
            SELECT n.node,
                   round((1 - {damping}) / (SELECT n FROM nn)
                         + {damping} * (
                               COALESCE(c.in_sum, 0)
                               + (SELECT COALESCE(sum(pr), 0) FROM r{k - 1} p
                                  LEFT JOIN outw o ON p.node = o.src
                                  WHERE o.src IS NULL) / (SELECT n FROM nn)
                           ), 9) AS pr
            FROM nodes n LEFT JOIN (
                SELECT f.dst AS node, sum(round(p.pr * f.frac, 9)) AS in_sum
                FROM frac f JOIN r{k - 1} p ON f.src = p.node
                GROUP BY f.dst
            ) c ON n.node = c.node
        )"""
        )
    parts.append(
        f"""
        SELECT node AS domain, round(pr, 6) AS pr FROM r{iterations}
        """
    )
    return "".join(parts)


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


def _zorder_oracle(bits: int = 8) -> str:
    scale = 1 << bits
    z_terms = " + ".join(
        f"(((user_id_bucket >> {b}) & 1) << {2 * b}) + "
        f"(((ts_us_bucket >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )
    return f"""
        WITH mm AS (
            SELECT min(user_id) AS minx, max(user_id) AS maxx,
                   min(epoch_us(ts)) AS miny, max(epoch_us(ts)) AS maxy
            FROM events
        ),
        b AS (
            SELECT event_id,
                   ((user_id - minx) * {scale}) // (maxx - minx + 1) AS user_id_bucket,
                   ((epoch_us(ts) - miny) * {scale}) // (maxy - miny + 1) AS ts_us_bucket
            FROM events, mm
        )
        SELECT event_id, user_id_bucket, ts_us_bucket,
               {z_terms} AS z
        FROM b
    """


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


def _hits_oracle(iterations: int = 3) -> str:
    """Unrolled fixed-iteration HITS in ANSI SQL, mirroring
    ops/graph.hits' rounding (9 dp sums and normalized scores)."""
    parts = [
        """
        WITH nsrc AS (SELECT count(DISTINCT source) AS n FROM documents),
        edges AS (
            SELECT DISTINCT source AS src,
                   'src' || CAST(CAST(('0x' || substr(md5('link:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                 % (SELECT n FROM nsrc) AS VARCHAR) AS dst
            FROM documents
        ),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges UNION SELECT dst FROM edges
            )
        ),
        h0 AS (SELECT node, 1.0 AS h FROM nodes)
        """
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""",
        a{k}raw AS MATERIALIZED (
            SELECT n.node, COALESCE(s.v, 0) AS a_raw
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, round(sum(p.h), 9) AS v
                FROM edges e JOIN h{k - 1} p ON e.src = p.node
                GROUP BY e.dst
            ) s ON n.node = s.node
        ),
        a{k} AS MATERIALIZED (
            SELECT node,
                   round(a_raw / NULLIF((SELECT sum(a_raw) FROM a{k}raw), 0), 9) AS a
            FROM a{k}raw
        ),
        h{k}raw AS MATERIALIZED (
            SELECT n.node, COALESCE(s.v, 0) AS h_raw
            FROM nodes n LEFT JOIN (
                SELECT e.src AS node, round(sum(p.a), 9) AS v
                FROM edges e JOIN a{k} p ON e.dst = p.node
                GROUP BY e.src
            ) s ON n.node = s.node
        ),
        h{k} AS MATERIALIZED (
            SELECT node,
                   round(h_raw / NULLIF((SELECT sum(h_raw) FROM h{k}raw), 0), 9) AS h
            FROM h{k}raw
        )"""
        )
    parts.append(
        f"""
        SELECT h{iterations}.node AS domain,
               round(h{iterations}.h, 6) AS hub,
               round(a{iterations}.a, 6) AS authority
        FROM h{iterations} JOIN a{iterations} USING (node)
        """
    )
    return "".join(parts)


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
    explode with grouped_linreg's mergeable sufficient statistics; ranks
    are a TakeOrdered-sized vocabulary table, not corpus rows."""
    from pyspark.sql import Window

    from reader_spark.ops.profile import grouped_linreg

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
    w = Window.orderBy(F.desc("freq"), "term")
    ranked = freq.withColumn("rank", F.row_number().over(w)).select(
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


def _opq_encode_md5_oracle() -> str:
    from reader_spark.ops.ann import md5_signed_permutation

    perm, signs = md5_signed_permutation(64)
    permuted = ", ".join(
        f"{signs[i]} * embedding[{perm[i] + 1}]" for i in range(64)
    )
    return f"""
        WITH cb(sub, code, c) AS (VALUES
                {_pq_codebook_values()}),
        e AS (
            SELECT vec_id, [{permuted}]::DOUBLE[] AS v
            FROM embeddings WHERE vec_id < 200
        ),
        dists AS (
            SELECT e.vec_id, cb.sub, cb.code,
                   round(list_aggregate(list_transform(
                       list_zip(list_slice(v, cb.sub*8 + 1, cb.sub*8 + 8), cb.c),
                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9) AS dist
            FROM e CROSS JOIN cb
        ),
        best AS (
            SELECT vec_id, sub, code,
                   row_number() OVER (
                       PARTITION BY vec_id, sub ORDER BY dist, code
                   ) AS rn
            FROM dists
        )
        SELECT vec_id,
               string_agg(code::VARCHAR, ',' ORDER BY sub) AS codes_str
        FROM best WHERE rn = 1 GROUP BY vec_id
    """


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


def _k_center_oracle(k: int = 5) -> str:
    l2 = (
        "round(list_aggregate(list_transform(list_zip({a}, {b}), "
        "x -> (x[1] - x[2]) ^ 2), 'sum'), 9)"
    )
    parts = [
        "WITH s0 AS MATERIALIZED (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c1 AS MATERIALIZED (SELECT id, v FROM s0 ORDER BY id LIMIT 1)",
        "d1 AS MATERIALIZED (SELECT s.id, s.v, "
        + l2.format(a="s.v", b="c.v")
        + " AS min_d FROM s0 s CROSS JOIN c1 c)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT id, v FROM d{i-1} ORDER BY min_d DESC, id LIMIT 1)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT d.id, d.v, least(d.min_d, "
            + l2.format(a="d.v", b="c.v")
            + f") AS min_d FROM d{i-1} d CROSS JOIN c{i} c)"
        )
    selects = [
        f"SELECT CAST({i} AS INTEGER) AS rank, (SELECT id FROM c{i}) AS vec_id,"
        f" (SELECT round(max(min_d), 6) FROM d{i}) AS radius"
        for i in range(1, k + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


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


def _q_interleaved_media_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interleaved text+media payload axis under a full value oracle:
    every corpus doc is wrapped with a deterministically-placed image
    (doc_id%3==0: hero image between heading and body; %3==1: trailing
    image; %3==2: none) and run through the COMPLETE extraction engine.
    The span sequence — heading/image/text kinds, media_ref capture,
    interleave ORDER — is SQL-predictable, so image-span handling gets a
    corpus-scale oracle row, not only golden fixtures."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    hero = F.concat(
        F.lit('<img src="https://img.test/'), d,
        F.lit('/hero.png" alt="hero '), d, F.lit('">'),
    )
    tail = F.concat(
        F.lit('<img src="https://img.test/'), d,
        F.lit('/tail.png" alt="tail '), d, F.lit('">'),
    )
    payload = F.concat(
        F.lit("<html><body><main><article><h1>Document "), d, F.lit("</h1>"),
        F.when(F.col("doc_id") % 3 == 0, hero).otherwise(F.lit("")),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.when(F.col("doc_id") % 3 == 1, tail).otherwise(F.lit("")),
        F.lit("</article></main></body></html>"),
    )
    docs = documents.select(
        d.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return (
        extract_dataframe(docs)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("s.order").alias("ord"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


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


def _q_span_kinds_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL M1 span-kind contract under one corpus-scale oracle:
    every doc wrapped with a deterministic page exercising heading, text,
    list_item (x2), code, table, and inline-link serialization — 7 spans
    per doc, every kind's markdown form and ORDER SQL-predictable. The
    golden fixtures pin edge cases; this pins the whole-kind surface at
    500 docs through the real engine."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("<html><body><main><article><h1>Document "), d, F.lit("</h1>"),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("<ul><li>item "), d, F.lit(" a</li><li>item "), d, F.lit(" b</li></ul>"),
        F.lit("<pre><code>call("), d, F.lit(")</code></pre>"),
        F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>"), d,
        F.lit("</td><td>"), F.col("source"), F.lit("</td></tr></table>"),
        F.lit('<p>See <a href="https://ref.test/'), d,
        F.lit('">spec '), d, F.lit("</a> end.</p>"),
        F.lit("</article></main></body></html>"),
    )
    docs = documents.select(
        d.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return (
        extract_dataframe(docs)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("s.order").alias("ord"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
        )
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
    vecs = feature_hash_vectors(docs, "doc_id", "text", dim=64)
    return lsh_bucketed_topk_literal(
        vecs.where(F.col("doc_id") >= 4),
        vecs.where(F.col("doc_id") < 4),
        md5_plane_weights(dim=64, planes=2),
        k=10,
        id_col="doc_id",
        vec_col="vector",
    )


# The driver's correctness snapshot covers the FIRST 50 registry entries in
# iteration order (CORRECTNESS_r01/_r02 are exactly that slice).  This list
# curates the window: flagship extraction/pipeline queries plus every
# operator family that has not yet received a driver-level row, each with a
# full value-hash oracle.  Everything not listed follows in original order
# (most of it already driver-green in r01/r02).
_DRIVER_WINDOW = [
    # ROUND-4 ROTATION (VERDICT r3 next-round #4): every r1-r3 driver-green
    # row is retired from the window (they stay green in the local
    # scripts/gate.py sweep, recorded in PROGRESS.jsonl); all 50 slots go
    # to queries that have NEVER had a driver-level correctness row.  The 7
    # never-verified queries left out are twins whose composing sibling is
    # in: kmv_distinct (kmv_jaccard), winnow_fingerprints (winnow_pairs),
    # feature_hash_vectors + doc_sim_topk (doc_sim_topk_bucketed),
    # hard_negatives (hard_negatives_bucketed), hll_distinct (HLL family
    # driver-green r3), term_pmi (textstats family driver-green r1).
    # -- extraction / media flagships never in a window
    "span_kinds_full",
    "media_sniff",
    # -- curation / training-data pipeline
    "dsir_weights",
    "quality_logit",
    "curation_shortlist",
    "mojibake_repair",
    "coreset_k_center",
    "sequence_packing_sharded",
    "packing_stats",
    "quality_token_pyramid",
    "source_vocab_kl",
    "corpus_scorecard",
    "readability_scores",
    "langid_confusion",
    "lang_source_chi2",
    "zipf_fit",
    # -- dedup / fingerprint / decontamination
    "winnow_pairs",
    "cdc_chunks",
    "lsh_quality_eval",
    # -- similarity search / embeddings
    "doc_sim_topk_bucketed",
    "hard_negatives_bucketed",
    "opq_encode_md5",
    "embedding_sq8",
    "label_centroids",
    "hybrid_search_rrf",
    # -- sketches
    "kmv_jaccard",
    "cms_join_size",
    # -- graph
    "graph_triangles",
    "graph_degree_stats",
    # -- drift / quality monitoring
    "value_ks_drift",
    "value_psi_drift",
    "fk_audit",
    "ab_test_proportions",
    "value_quantile_norm",
    "value_outliers",
    # -- sharding / sampling / admission
    "rendezvous_shards",
    "rate_limit_admission",
    "crawl_budget_allocation",
    # -- event analytics battery
    "funnel_conversion",
    "cohort_retention",
    "event_transitions",
    "events_sliding_windows",
    "twap_user_value",
    "top_event_paths",
    "user_burstiness",
    "user_entropy",
    "scd2_user_state",
    "price_histogram",
    "revenue_gini",
    # -- sources
    "jsonl_ingest",
]


def _curate(registry: dict) -> dict:
    """Reorder the registry so _DRIVER_WINDOW names come first."""
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
    })


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the pre-registered parquet views)
# ---------------------------------------------------------------------------

_EN_STOPS = ", ".join(f"'{w}'" for w in sorted(LANG_STOPWORDS["en"]))

# Shared CTE chain for the feature-hashing vectorizer oracles (the WITH
# body through per-doc dense components + norms) — single source of truth
# for feature_hash_vectors and doc_sim_topk.
_FH_CTES = """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                   t -> t <> '')) AS tok
        FROM documents
    ),
    cells AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('fh1:' || tok), 1, 8)) AS BIGINT) % 64 AS i,
               sum(CASE WHEN CAST(('0x' || substr(md5('fh2:' || tok), 1, 8)) AS BIGINT) % 2 = 0
                        THEN 1 ELSE -1 END) AS c
        FROM toks GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.doc_id, g.i
        FROM (SELECT DISTINCT doc_id FROM documents) d,
             unnest(generate_series(0, 63)) g(i)
    ),
    dense AS (
        SELECT g.doc_id, g.i, COALESCE(c.c, 0)::DOUBLE AS v
        FROM grid g LEFT JOIN cells c ON g.doc_id = c.doc_id AND g.i = c.i
    ),
    nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM dense GROUP BY 1)
"""


def _trigram_pats_sql() -> str:
    """VALUES rows of (lang, pattern) — literally the same alternations the
    Spark column uses (single source of truth in ops.textstats)."""
    from reader_spark.ops.textstats import LANG_TRIGRAMS

    rows = [
        f"('{lang}', '{'|'.join(f'({t})' for t in tris)}')"
        for lang, tris in sorted(LANG_TRIGRAMS.items())
    ]
    return ", ".join(rows)


def _lang_hits_sql(lang: str) -> str:
    stops = ", ".join(f"'{w}'" for w in sorted(LANG_STOPWORDS[lang]))
    return (
        "len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), "
        f"'\\s+')), [{stops}]))"
    )


def oracle_sql() -> dict[str, str]:
    out = _oracle_sql_entries()
    # The banded SimHash production path must reproduce the all-pairs form
    # exactly (block pigeonhole) — sharing the oracle IS the check.
    out["simhash_banded_md5"] = out["simhash_md5"]
    out["ann_lsh_md5"] = _ann_lsh_md5_oracle()
    out["hard_negatives_bucketed"] = _hard_negatives_bucketed_oracle()
    out["doc_sim_topk_bucketed"] = _doc_sim_topk_bucketed_oracle()
    out["embedding_dedup_lsh_md5"] = _embedding_dedup_lsh_md5_oracle()
    out["embedding_dedup_components"] = _embedding_dedup_components_oracle()
    out["pq_encode_md5"] = _pq_encode_md5_oracle()
    out["opq_encode_md5"] = _opq_encode_md5_oracle()
    out["pq_adc_topk_md5"] = _pq_adc_topk_md5_oracle()
    out["ivfadc_md5"] = _ivfadc_md5_oracle()
    # Golden-literal oracles: pdf_extract and crawl_fixture run on FIXED
    # fixtures, so their exact expected outputs are expressible as VALUES —
    # the SQL form of the golden pytest assertions (pins every value, not
    # just row counts). Not derivable from the parquet tables by design.
    out["pdf_extract"] = """
        SELECT * FROM (VALUES
            ('pdf-two-column', 0, 'heading', '# Two Column Paper Title'),
            ('pdf-two-column', 1, 'text',
             'Left column first line. Left column second line. '
             || 'Left column third line. Right column first line. '
             || 'Right column second line.'),
            ('pdf-two-column', 2, 'heading', '# Second Page Heading'),
            ('pdf-two-column', 3, 'text', 'Full width body line on page two.')
        ) AS t(doc_id, ord, kind, text)
    """
    out["crawl_fixture"] = """
        SELECT * FROM (VALUES
            ('https://c.test/start',  0, 'Start', CAST(NULL AS VARCHAR)),
            ('https://c.test/blog/a', 1, 'A',     CAST(NULL AS VARCHAR)),
            ('https://c.test/blog/b', 1, 'B',     CAST(NULL AS VARCHAR)),
            ('https://c.test/blog/c', 2, 'C',     CAST(NULL AS VARCHAR))
        ) AS t(url, depth, title, description)
    """
    return out


def _md5_bucket_terms(planes: int = 8) -> str:
    """The bucket expression over column `v` with the SAME md5-derived plane
    weights embedded as SQL literals (repr() round-trips float64 exactly;
    DuckDB parses decimal literals to the nearest double = the identical
    value)."""
    from reader_spark.ops.ann import md5_plane_weights

    weights = md5_plane_weights(dim=64, planes=planes)
    return "\n                 + ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(x) for x in w)
        + f"]) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(weights)
    )


def _embedding_dedup_lsh_md5_oracle() -> str:
    return f"""
        WITH corpus AS (
            SELECT vec_id AS doc, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id < 200
        ),
        buckets AS (
            SELECT doc, v,
                   {_md5_bucket_terms(planes=2)} AS bucket
            FROM corpus
        )
        SELECT a.doc AS vec_a, b.doc AS vec_b,
               round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.doc < b.doc
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35
    """


def _embedding_dedup_components_oracle() -> str:
    return f"""
        WITH RECURSIVE
        corpus AS (
            SELECT vec_id AS doc, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id < 200
        ),
        buckets AS (
            SELECT doc, v,
                   {_md5_bucket_terms(planes=2)} AS bucket
            FROM corpus
        ),
        pairs AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.doc < b.doc
            WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v
        )
        SELECT v AS doc, min(r) AS component FROM reach GROUP BY v
    """


def _pq_codebook_values() -> str:
    """The md5 PQ codebooks as a SQL VALUES list: (sub, code, c DOUBLE[])."""
    from reader_spark.ops.ann import md5_pq_codebooks

    books = md5_pq_codebooks(dim=64, m=8, k=16)
    rows = []
    for sub, book in enumerate(books):
        for code, c in enumerate(book):
            vec = "[" + ", ".join(repr(x) for x in c) + "]"
            cast = "::DOUBLE[]" if sub == 0 and code == 0 else ""
            rows.append(f"({sub}, {code}, {vec}{cast})")
    return ",\n                ".join(rows)


def _pq_encode_md5_oracle() -> str:
    return f"""
        WITH cb(sub, code, c) AS (VALUES
                {_pq_codebook_values()}),
        e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id < 200
        ),
        dists AS (
            SELECT e.vec_id, cb.sub, cb.code,
                   round(list_aggregate(list_transform(
                       list_zip(list_slice(v, cb.sub*8 + 1, cb.sub*8 + 8), cb.c),
                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9) AS dist
            FROM e CROSS JOIN cb
        ),
        best AS (
            SELECT vec_id, sub, code,
                   row_number() OVER (
                       PARTITION BY vec_id, sub ORDER BY dist, code
                   ) AS rn
            FROM dists
        )
        SELECT vec_id,
               string_agg(code::VARCHAR, ',' ORDER BY sub) AS codes_str
        FROM best WHERE rn = 1 GROUP BY vec_id
    """


def _pq_adc_topk_md5_oracle() -> str:
    return f"""
        WITH cb(sub, code, c) AS (VALUES
                {_pq_codebook_values()}),
        q AS (
            SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
        ),
        tab AS (
            SELECT cb.sub, cb.code,
                   round(list_aggregate(list_transform(
                       list_zip(list_slice(qv, cb.sub*8 + 1, cb.sub*8 + 8), cb.c),
                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9) AS d
            FROM cb CROSS JOIN q
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        dists AS (
            SELECT e.vec_id, cb.sub, cb.code,
                   round(list_aggregate(list_transform(
                       list_zip(list_slice(v, cb.sub*8 + 1, cb.sub*8 + 8), cb.c),
                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9) AS dist
            FROM e CROSS JOIN cb
        ),
        best AS (
            SELECT vec_id, sub, code,
                   row_number() OVER (
                       PARTITION BY vec_id, sub ORDER BY dist, code
                   ) AS rn
            FROM dists
        )
        SELECT b.vec_id, round(sum(t.d), 6) AS adc_dist
        FROM best b JOIN tab t ON t.sub = b.sub AND t.code = b.code
        WHERE b.rn = 1
        GROUP BY b.vec_id
        ORDER BY adc_dist, b.vec_id
        LIMIT 10
    """


def _ivfadc_md5_oracle() -> str:
    return f"""
        WITH cb(sub, code, c) AS (VALUES
                {_pq_codebook_values()}),
        cents AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id >= 100
            ORDER BY vec_id LIMIT 8
        ),
        corpus AS (
            SELECT e.vec_id AS corpus_id, e.embedding::DOUBLE[] AS v,
                   (SELECT c.cell FROM cents c
                    ORDER BY round(list_aggregate(list_transform(
                                list_zip(c.cv, e.embedding::DOUBLE[]),
                                x -> (x[1] - x[2]) ^ 2), 'sum'), 9),
                             c.cell
                    LIMIT 1) AS cell
            FROM embeddings e
        ),
        enc AS (
            SELECT corpus_id, cell, sub, code FROM (
                SELECT co.corpus_id, co.cell, cb.sub, cb.code,
                       row_number() OVER (
                           PARTITION BY co.corpus_id, cb.sub
                           ORDER BY round(list_aggregate(list_transform(
                                       list_zip(list_slice(co.v, cb.sub*8 + 1, cb.sub*8 + 8), cb.c),
                                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9),
                                    cb.code
                       ) AS rn
                FROM corpus co CROSS JOIN cb
            ) WHERE rn = 1
        ),
        qset AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 4
        ),
        qprobe AS (
            SELECT query_id, cell FROM (
                SELECT q.query_id, c.cell,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY round(list_aggregate(list_transform(
                                       list_zip(c.cv, q.qv),
                                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9),
                                    c.cell) AS rnk
                FROM qset q CROSS JOIN cents c
            ) WHERE rnk <= 2
        ),
        qtab AS (
            SELECT q.query_id, cb.sub, cb.code,
                   round(list_aggregate(list_transform(
                       list_zip(list_slice(q.qv, cb.sub*8 + 1, cb.sub*8 + 8), cb.c),
                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9) AS d
            FROM qset q CROSS JOIN cb
        ),
        scored AS (
            SELECT p.query_id, e.corpus_id, round(sum(t.d), 6) AS adc_dist
            FROM qprobe p
            JOIN enc e USING (cell)
            JOIN qtab t ON t.query_id = p.query_id
                       AND t.sub = e.sub AND t.code = e.code
            GROUP BY p.query_id, e.corpus_id
        ),
        ranked AS (
            SELECT query_id, corpus_id, adc_dist,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY adc_dist, corpus_id
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, corpus_id, adc_dist, rank FROM ranked WHERE rank <= 5
    """


def _ann_lsh_md5_oracle() -> str:
    bucket_terms = _md5_bucket_terms()
    return f"""
        WITH corpus AS (
            SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS v
            FROM embeddings
        ),
        buckets AS (
            SELECT corpus_id, v,
                   {bucket_terms} AS bucket
            FROM corpus
        ),
        q AS (
            SELECT corpus_id AS query_id, v AS qv, bucket
            FROM buckets WHERE corpus_id < 4
        ),
        scored AS (
            SELECT q.query_id, b.corpus_id,
                   round(list_cosine_similarity(b.v, q.qv), 4) AS cosine
            FROM buckets b JOIN q USING (bucket)
        ),
        ranked AS (
            SELECT query_id, corpus_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, corpus_id
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 5
    """


def _hard_negatives_bucketed_oracle() -> str:
    bucket_terms = _md5_bucket_terms(planes=5)
    probe_list = ", ".join(
        ["b0"] + [f"xor(b0, {1 << i}::BIGINT)" for i in range(5)]
    )
    return f"""
        WITH pool AS (
            SELECT vec_id AS neg_id, embedding::DOUBLE[] AS v,
                   label AS neg_label
            FROM embeddings
        ),
        pb AS (
            SELECT neg_id, v AS nv, neg_label, {bucket_terms} AS bucket
            FROM pool
        ),
        anch AS (
            SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS v,
                   label AS anchor_label
            FROM embeddings WHERE vec_id < 20
        ),
        ab AS (
            SELECT anchor_id, v AS av, anchor_label, {bucket_terms} AS b0
            FROM anch
        ),
        probes AS (
            SELECT anchor_id, av, anchor_label,
                   unnest([{probe_list}]) AS bucket
            FROM ab
        ),
        scored AS (
            SELECT a.anchor_id, a.anchor_label, p.neg_id, p.neg_label,
                   round(list_cosine_similarity(a.av, p.nv), 4) AS cosine
            FROM probes a JOIN pb p USING (bucket)
            WHERE a.anchor_label <> p.neg_label
        ),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                       PARTITION BY anchor_id
                       ORDER BY cosine DESC, neg_id) AS INTEGER) AS rank
            FROM scored
        )
        SELECT anchor_id, anchor_label, neg_id, neg_label, cosine, rank
        FROM ranked WHERE rank <= 3
    """


def _doc_sim_topk_bucketed_oracle() -> str:
    bucket_terms = _md5_bucket_terms(planes=2)
    return _FH_CTES + f""",
        unitv AS (
            SELECT d.doc_id,
                   list(CASE WHEN n.nn > 0 THEN round(d.v / n.nn, 6) ELSE d.v END
                        ORDER BY d.i) AS v
            FROM dense d JOIN nrm n USING (doc_id) GROUP BY d.doc_id
        ),
        bk AS (SELECT doc_id, v, {bucket_terms} AS bucket FROM unitv),
        corpus AS (
            SELECT doc_id AS corpus_id, v AS cv, bucket FROM bk WHERE doc_id >= 4
        ),
        q AS (
            SELECT doc_id AS query_id, v AS qv, bucket FROM bk WHERE doc_id < 4
        ),
        scored AS (
            SELECT q.query_id, c.corpus_id,
                   round(list_cosine_similarity(c.cv, q.qv), 4) AS cosine
            FROM corpus c JOIN q USING (bucket)
        ),
        ranked AS (
            SELECT query_id, corpus_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, corpus_id
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 10
    """


def _oracle_sql_entries() -> dict[str, str]:
    return {
        "extract_documents_spans": """
            SELECT doc_id, 0 AS ord, 'heading' AS kind,
                   '# Document ' || doc_id AS text
            FROM documents
            UNION ALL
            SELECT doc_id, 1 AS ord, 'text' AS kind, text
            FROM documents
        """,
        "events_sessions": """
            WITH gaps AS (
                SELECT user_id,
                       CASE WHEN epoch(ts) - lag(epoch(ts), 1, -1000000000)
                                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            )
            SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM gaps GROUP BY user_id
        """,
        "dedup_embedding_cosine": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 200 AND b.vec_id < 200
              AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 4) >= 0.35
        """,
        "events_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                   CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                   CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
            FROM events GROUP BY user_id
        """,
        "quality_filter": """
            WITH q AS (
                SELECT doc_id,
                       len(string_split_regex(trim(text), '\\s+')) AS token_count,
                       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                             / greatest(length(text), 1), 6) AS punct_ratio
                FROM documents
            )
            SELECT doc_id, token_count, punct_ratio
            FROM q WHERE token_count >= 50 AND punct_ratio < 0.05
        """,
        "value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90,
                   round(min(value), 4) AS vmin,
                   round(max(value), 4) AS vmax
            FROM events GROUP BY event_type
        """,
        "props_json": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   count(json_extract_string(props, '$.k')) AS n_with_k
            FROM events GROUP BY event_type
        """,
        "part_brand_revenue": """
            SELECT p_brand,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(DISTINCT s_suppkey) AS n_suppliers
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY p_brand
        """,
        "nation_market_share": """
            SELECT year(o_orderdate) AS o_year,
                   round(sum(CASE WHEN n_name = 'NATION_3'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY year(o_orderdate)
        """,
        "regional_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_nationkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "returns_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "detected_lang": f"""
            WITH hits AS (
                SELECT doc_id,
                       {_lang_hits_sql('de')} AS h_de,
                       {_lang_hits_sql('en')} AS h_en,
                       {_lang_hits_sql('es')} AS h_es,
                       {_lang_hits_sql('fr')} AS h_fr
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                        WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                        WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                        WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                        ELSE 'de'
                   END AS detected_lang
            FROM hits
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT o_orderkey, o_custkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_custkey
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "customer_nation_rollup": """
            SELECT n_name,
                   count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS total_acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "events_user_stats": """
            WITH ranked AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            )
            SELECT user_id,
                   count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types,
                   max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                   round(sum(value), 4) AS total_value
            FROM ranked GROUP BY user_id
        """,
        "funnel": """
            WITH firsts AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                       min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
                FROM events GROUP BY user_id
            )
            SELECT count(t_view) AS n_view,
                   count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
                   count(CASE WHEN t_click > t_view AND t_buy > t_click
                              THEN 1 END) AS n_view_click_buy
            FROM firsts
        """,
        "user_retention": """
            WITH days AS (
                SELECT DISTINCT user_id, ts::DATE AS day FROM events
            ),
            cohorts AS (
                SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
            )
            SELECT c.cohort_day, datediff('day', c.cohort_day, d.day) AS age_days,
                   count(DISTINCT d.user_id) AS n_users
            FROM days d JOIN cohorts c ON d.user_id = c.user_id
            WHERE datediff('day', c.cohort_day, d.day) <= 7
            GROUP BY c.cohort_day, datediff('day', c.cohort_day, d.day)
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keeper_id, count(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "dedup_ngram_jaccard": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc = doc_a
            JOIN sizes sb ON sb.doc = doc_b
            WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
        """,
        "corpus_prep": """
            WITH RECURSIVE
            base AS (
                SELECT doc_id::VARCHAR AS doc,
                       '# Document ' || doc_id || chr(10) || chr(10) || text AS markdown
                FROM documents WHERE doc_id < 200
            ),
            scored AS (
                SELECT doc, markdown,
                       len(string_split_regex(trim(markdown), '\\s+')) AS token_count,
                       round((length(markdown)
                              - length(regexp_replace(markdown, '[^\\w\\s]', '', 'g')))
                             / greatest(length(markdown), 1), 6) AS punct_ratio
                FROM base
            ),
            gated AS (
                SELECT * FROM scored
                WHERE token_count >= 20 AND punct_ratio <= 0.3
            ),
            exact_keepers AS (
                SELECT min(doc) AS doc FROM gated GROUP BY markdown
            ),
            udocs AS (
                SELECT g.* FROM gated g JOIN exact_keepers k ON g.doc = k.doc
            ),
            sh AS (
                SELECT doc, unnest(list_distinct(list_transform(
                    range(1, greatest(len(string_split_regex(trim(markdown), '\\s+')) - 2, 1) + 1),
                    i -> array_to_string(string_split_regex(trim(markdown), '\\s+')[i:i+2], ' ')
                ))) AS shingle
                FROM udocs
            ),
            mins AS (
                SELECT doc, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minh
                FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS seed) seeds
                GROUP BY doc, seed
            ),
            bandh AS (
                SELECT doc, seed // 4 AS band_id,
                       md5(string_agg(minh, '|' ORDER BY seed)) AS band_hash
                FROM mins GROUP BY doc, seed // 4
            ),
            pairs AS (
                SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
                FROM bandh a
                JOIN bandh b ON a.band_id = b.band_id
                            AND a.band_hash = b.band_hash
                            AND a.doc < b.doc
            ),
            edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b AS src, doc_a AS dst FROM pairs
            ),
            reach(v, r) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v
            ),
            losers AS (
                SELECT v AS doc FROM reach GROUP BY v HAVING v <> min(r)
            )
            SELECT doc AS doc_id, token_count, punct_ratio
            FROM udocs WHERE doc NOT IN (SELECT doc FROM losers)
        """,
        "simhash_md5": """
            WITH toks AS (
                SELECT doc_id AS doc,
                       unnest(string_split_regex(trim(text), '\\s+')) AS token
                FROM documents WHERE doc_id < 300
            ),
            th AS (
                SELECT doc, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
                FROM toks
            ),
            bitsums AS (
                SELECT doc, bit,
                       sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
                GROUP BY doc, bit
            ),
            fp AS (
                SELECT doc,
                       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
                FROM bitsums GROUP BY doc
            )
            SELECT a.doc AS doc_a, b.doc AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
            FROM fp a JOIN fp b ON a.doc < b.doc
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "minhash_lsh_md5": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            mins AS (
                SELECT doc, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minh
                FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS seed) seeds
                GROUP BY doc, seed
            ),
            bandh AS (
                SELECT doc, seed // 4 AS band_id,
                       md5(string_agg(minh, '|' ORDER BY seed)) AS band_hash
                FROM mins GROUP BY doc, seed // 4
            )
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM bandh a
            JOIN bandh b ON a.band_id = b.band_id
                        AND a.band_hash = b.band_hash
                        AND a.doc < b.doc
        """,
        "dedup_components": """
            WITH RECURSIVE
            sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes sa ON sa.doc = doc_a
                JOIN sizes sb ON sb.doc = doc_b
                WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
            ),
            edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b AS src, doc_a AS dst FROM pairs
            ),
            reach(v, r) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v
            )
            SELECT v AS doc, min(r) AS component FROM reach GROUP BY v
        """,
        "text_quality": f"""
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS token_count,
                   round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_intersect(
                             list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
                             [{_EN_STOPS}]))
                         / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))), 1),
                         6) AS stopword_ratio
            FROM documents
        """,
        "fingerprints_md5": """
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                FROM documents
            ),
            fps AS (
                SELECT doc_id,
                       list_min(CASE WHEN len(w) > 8
                           THEN list_transform(range(1, len(w) - 6),
                                i -> md5(array_to_string(w[i:i+7], ' ')))
                           ELSE [md5(array_to_string(w, ' '))]
                       END) AS fp
                FROM toks
            )
            SELECT fp, min(doc_id) AS keeper_id, count(*) AS n_docs
            FROM fps GROUP BY fp
        """,
        "error_taxonomy": """
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'EmptyDocumentError' ELSE 'ok' END AS error_kind,
                   CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 2 END AS n_spans
            FROM documents
        """,
        "warc_extract": """
            SELECT doc_id, 0 AS ord, 'heading' AS kind,
                   '# Document ' || doc_id AS text
            FROM documents WHERE doc_id < 100
            UNION ALL
            SELECT doc_id, 1 AS ord, 'text' AS kind, text
            FROM documents WHERE doc_id < 100
        """,
        "resume_remaining": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id NOT IN (
                SELECT doc_id FROM documents WHERE doc_id % 2 = 0
            )
        """,
        "media_metadata": """
            SELECT 'media-' || doc_id AS media_id,
                   (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS kind,
                   octet_length(encode(text)) AS bytes,
                   sha256(text) AS content_sha
            FROM documents
        """,
        "top_terms": """
            SELECT term, count(*) AS n
            FROM (
                SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
                FROM documents
            )
            WHERE term <> ''
            GROUP BY term
            ORDER BY n DESC, term
            LIMIT 20
        """,
        "repetition_ratio": """
            SELECT doc_id,
                   round(1.0 - len(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       )))::DOUBLE
                       / greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1),
                       6) AS repetition_ratio
            FROM documents
        """,
        "dataset_splits": """
            SELECT doc_id,
                   CASE WHEN b < 8000 THEN 'train'
                        WHEN b < 9000 THEN 'val'
                        WHEN b < 10000 THEN 'test'
                        ELSE 'rest' END AS split
            FROM (
                SELECT doc_id,
                       ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b
                FROM documents
            )
        """,
        "lang_trigram": f"""
            WITH pats(lang_c, pat) AS (VALUES {_trigram_pats_sql()}),
            scores AS (
                SELECT d.doc_id, p.lang_c,
                       len(regexp_extract_all(lower(d.text), p.pat)) AS score
                FROM documents d CROSS JOIN pats p
            ),
            ranked AS (
                SELECT doc_id, lang_c, score,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, lang_c DESC
                       ) AS rn
                FROM scores
            )
            SELECT doc_id,
                   CASE WHEN score > 0 THEN lang_c ELSE 'und' END AS lang_trigram
            FROM ranked WHERE rn = 1
        """,
        "token_counts": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       $$'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+$$
                   )) AS bpe_tokens
            FROM documents
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "gopher_rules": """
            WITH base AS (
                SELECT doc_id, text,
                       string_split_regex(trim(text), '\\s+') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents
            ),
            m AS (
                SELECT doc_id,
                       len(toks) AS n_tokens,
                       round(length(regexp_replace(text, '\\s', '', 'g'))
                             / greatest(len(toks), 1), 6) AS mean_word_len,
                       round(len(list_filter(toks,
                                 t -> regexp_matches(t, '[A-Za-z]')))
                             / greatest(len(toks), 1), 6) AS alpha_word_ratio,
                       round(len(list_filter(lines,
                                 l -> regexp_matches(trim(l), '^[-*•]')))
                             / greatest(len(lines), 1), 6) AS bullet_line_ratio,
                       round(len(list_filter(lines,
                                 l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                             / greatest(len(lines), 1), 6) AS ellipsis_line_ratio,
                       round(1.0 - len(list_distinct(lines))
                             / greatest(len(lines), 1), 6) AS dup_line_fraction,
                       round(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                             / greatest(len(toks), 1), 6) AS symbol_word_ratio
                FROM base
            )
            SELECT doc_id, n_tokens, mean_word_len, alpha_word_ratio,
                   bullet_line_ratio, ellipsis_line_ratio, dup_line_fraction,
                   symbol_word_ratio,
                   (n_tokens >= 50 AND n_tokens <= 100000
                    AND mean_word_len >= 3 AND mean_word_len <= 10
                    AND alpha_word_ratio >= 0.8
                    AND bullet_line_ratio <= 0.9
                    AND ellipsis_line_ratio <= 0.3
                    AND dup_line_fraction <= 0.3
                    AND symbol_word_ratio <= 0.1) AS gopher_pass
            FROM m
        """,
        "pii_scrub": """
            WITH with_pii AS (
                SELECT doc_id,
                       text || ' Contact user' || doc_id
                            || '@example.com or +1 (555) 010-'
                            || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                            || ' at 10.0.' || (doc_id % 256) || '.7 today'
                           AS text
                FROM documents WHERE doc_id < 200
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS n_emails,
                   len(regexp_extract_all(text,
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                       AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\\+[0-9][0-9 ()-]{7,}[0-9]')) AS n_phones,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                           '<IP>', 'g'),
                       '\\+[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS masked
            FROM with_pii
        """,
        "stratified_sample": """
            SELECT doc_id, lang,
                   (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000)
                   < (CASE lang WHEN 'en' THEN 3000
                                WHEN 'de' THEN 8000
                                ELSE 10000 END) AS kept
            FROM documents
        """,
        "domain_quality_rollup": """
            WITH base AS (
                SELECT doc_id, source, text,
                       string_split_regex(trim(text), '\\s+') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents
            ),
            m AS (
                SELECT doc_id, source,
                       len(toks) AS n_tokens,
                       round(length(regexp_replace(text, '\\s', '', 'g'))
                             / greatest(len(toks), 1), 6) AS mean_word_len,
                       round(len(list_filter(toks,
                                 t -> regexp_matches(t, '[A-Za-z]')))
                             / greatest(len(toks), 1), 6) AS alpha_word_ratio,
                       round(len(list_filter(lines,
                                 l -> regexp_matches(trim(l), '^[-*•]')))
                             / greatest(len(lines), 1), 6) AS bullet_line_ratio,
                       round(len(list_filter(lines,
                                 l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                             / greatest(len(lines), 1), 6) AS ellipsis_line_ratio,
                       round(1.0 - len(list_distinct(lines))
                             / greatest(len(lines), 1), 6) AS dup_line_fraction,
                       round(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                             / greatest(len(toks), 1), 6) AS symbol_word_ratio
                FROM base
            )
            SELECT source,
                   count(*) AS n_docs,
                   round(avg(n_tokens), 4) AS avg_tokens,
                   round(avg(CASE WHEN
                       (n_tokens >= 50 AND n_tokens <= 100000
                        AND mean_word_len >= 3 AND mean_word_len <= 10
                        AND alpha_word_ratio >= 0.8
                        AND bullet_line_ratio <= 0.9
                        AND ellipsis_line_ratio <= 0.3
                        AND dup_line_fraction <= 0.3
                        AND symbol_word_ratio <= 0.1)
                       THEN 1.0 ELSE 0.0 END), 6) AS pass_rate
            FROM m GROUP BY source
        """,
        "token_shards": """
            WITH t AS (
                SELECT doc_id,
                       len(string_split_regex(trim(text), '\\s+')) AS n_tokens
                FROM documents
            )
            SELECT doc_id, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (
                            ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - n_tokens) / 5000) AS BIGINT) AS shard
            FROM t
        """,
        "ann_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 4) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """,
        "ann_ivf_seeded": """
            WITH cents AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                       embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id >= 100
                ORDER BY vec_id LIMIT 8
            ),
            corpus AS (
                SELECT e.vec_id AS corpus_id, e.embedding::DOUBLE[] AS v,
                       (SELECT c.cell FROM cents c
                        ORDER BY round(list_aggregate(list_transform(
                                    list_zip(c.cv, e.embedding::DOUBLE[]),
                                    x -> (x[1] - x[2]) ^ 2), 'sum'), 9),
                                 c.cell
                        LIMIT 1) AS cell
                FROM embeddings e
            ),
            qprobe AS (
                SELECT q.vec_id AS query_id, q.embedding::DOUBLE[] AS qv, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY round(list_aggregate(list_transform(
                                       list_zip(c.cv, q.embedding::DOUBLE[]),
                                       x -> (x[1] - x[2]) ^ 2), 'sum'), 9),
                                    c.cell) AS rnk
                FROM embeddings q CROSS JOIN cents c
                WHERE q.vec_id < 4
            ),
            scored AS (
                SELECT p.query_id, co.corpus_id,
                       round(list_cosine_similarity(co.v, p.qv), 4) AS cosine
                FROM (SELECT query_id, qv, cell FROM qprobe WHERE rnk <= 2) p
                JOIN corpus co USING (cell)
            ),
            ranked AS (
                SELECT query_id, corpus_id, cosine,
                       CAST(row_number() OVER (
                           PARTITION BY query_id ORDER BY cosine DESC, corpus_id
                       ) AS INTEGER) AS rank
                FROM scored
            )
            SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 5
        """,
        "url_keys": """
            SELECT doc_id,
                   'https://www.' || source || '.example.com:443/Docs/' || doc_id
                       || '/index.html?utm=1#frag' AS url,
                   'https://' || source || '.example.com/docs/' || doc_id AS url_key
            FROM documents
        """,
        "content_url_filter": """
            WITH urls AS (
                SELECT doc_id,
                       'https://' || source || '.example.com' ||
                       CASE doc_id % 7
                         WHEN 0 THEN '/privacy-policy'
                         WHEN 1 THEN '/admin/panel'
                         WHEN 2 THEN '/blog/post'
                         WHEN 3 THEN '/assets/app.js'
                         WHEN 4 THEN '/docs/guide'
                         WHEN 5 THEN '/report.pdf'
                         ELSE '/articles/deep-dive'
                       END AS url
                FROM documents
            )
            SELECT doc_id, url FROM urls
            WHERE NOT regexp_matches(lower(url),
                '/(privacy|terms|tos|legal|cookie|gdpr|disclaimer|imprint|impressum)\\b|/(privacy-policy|terms-of-service|terms-of-use|terms-and-conditions)\\b|/(cookie-policy|data-protection|acceptable-use|user-agreement)\\b|/(refund|cancellation|shipping|return)-?(policy)?\\b|/(contact|support|help|faq|feedback)/?$|/(about-us|careers|jobs|press|investors|team)/?$|/(admin|login|auth|account|dashboard|profile|settings)/|/(cart|checkout|payment|subscription|wishlist)/|/(uploads|assets|files|static|media|resources)/|/(api|graphql|rest|webhook)/')
              AND NOT regexp_matches(lower(url), '\\.(pdf|doc|docx|xls|xlsx|zip|exe)$')
        """,
        "strip_tags": """
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(
                                   '<html><head><script>var x=1;</script><style>p{}</style></head><body><h1>Doc</h1><p>'
                                   || text ||
                                   '</p><!-- note --></body></html>',
                                   '(?is)<script[^>]*>.*?</script>', '', 'g'),
                               '(?is)<style[^>]*>.*?</style>', '', 'g'),
                           '<[^>]*>', ' ', 'g'),
                       '\\s+', ' ', 'g')) AS clean_text
            FROM documents WHERE doc_id < 100
        """,
        "batch_metadata": """
            SELECT source,
                   count(*) AS total_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   min(doc_id) AS min_doc,
                   max(doc_id) AS max_doc
            FROM documents GROUP BY source
        """,
        "asof_clicks": """
            WITH p AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ),
            c AS (
                SELECT user_id, ts, event_id, value FROM events
                WHERE event_type = 'click'
            )
            SELECT p.event_id, p.user_id,
                   p.ts AS purchase_ts,
                   round(p.value, 4) AS purchase_value,
                   m.ts AS click_ts,
                   m.event_id AS click_event_id,
                   round(m.value, 4) AS click_value
            FROM p LEFT JOIN LATERAL (
                SELECT c.ts, c.event_id, c.value FROM c
                WHERE c.user_id = p.user_id
                  AND c.ts <= p.ts
                  AND epoch(p.ts) - epoch(c.ts) <= 86400
                ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
            ) m ON TRUE
        """,
        "attribution_range_join": """
            WITH s AS (
                SELECT event_id AS signup_id, user_id, ts AS signup_ts
                FROM events WHERE event_type = 'signup'
            ),
            p AS (
                SELECT user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ),
            j AS (
                SELECT s.signup_id,
                       count(*) AS n_purchases,
                       round(sum(p.value), 4) AS attributed_value
                FROM s JOIN p
                  ON p.user_id = s.user_id
                 AND p.ts >= s.signup_ts
                 AND p.ts < s.signup_ts + INTERVAL 12 HOUR
                GROUP BY 1
            )
            SELECT s.signup_id, s.user_id, s.signup_ts,
                   CAST(COALESCE(j.n_purchases, 0) AS BIGINT) AS n_purchases,
                   COALESCE(j.attributed_value, 0.0) AS attributed_value
            FROM s LEFT JOIN j USING (signup_id)
        """,
        "decontaminate": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS ntext
                FROM documents
            ),
            bench AS (
                SELECT doc_id AS bench_id,
                       array_to_string(string_split(ntext, ' ')[1:30], ' ') AS bench_text
                FROM norm WHERE doc_id % 29 = 0
            ),
            doc_grams AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split(ntext, ' ')) - 7, 1) + 1),
                           i -> array_to_string(string_split(ntext, ' ')[i:i+7], ' ')
                       ))) AS gram
                FROM norm
            ),
            bench_grams AS (
                SELECT DISTINCT bench_id, gram FROM (
                    SELECT bench_id,
                           unnest(list_distinct(list_transform(
                               range(1, greatest(len(string_split(bench_text, ' ')) - 7, 1) + 1),
                               i -> array_to_string(string_split(bench_text, ' ')[i:i+7], ' ')
                           ))) AS gram
                    FROM bench
                )
            )
            SELECT d.doc_id,
                   count(DISTINCT d.gram) AS n_hit_ngrams,
                   count(DISTINCT b.bench_id) AS n_bench_items
            FROM doc_grams d JOIN bench_grams b ON d.gram = b.gram
            WHERE d.gram <> ''
            GROUP BY d.doc_id
        """,
        "duplicate_spans": """
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                FROM documents
            ),
            g AS (
                SELECT doc_id, s['pos'] AS pos, s['gram'] AS gram FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               range(1, greatest(len(w) - 19, 0) + 1),
                               i -> {'pos': i,
                                     'gram': array_to_string(w[i:i+19], ' ')}
                           )) AS s
                    FROM toks
                )
            ),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
            m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
            flag AS (
                SELECT doc_id, pos,
                       CASE WHEN max(pos + 19) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                            ) IS NULL
                            OR pos > max(pos + 19) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                            ) + 1
                       THEN 1 ELSE 0 END AS new_span
                FROM m
            ),
            sp AS (
                SELECT doc_id, pos,
                       sum(new_span) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS span_id
                FROM flag
            )
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + 19 AS BIGINT) AS span_end,
                   CAST(max(pos) + 19 - min(pos) + 1 AS BIGINT) AS span_tokens,
                   count(*) AS n_windows
            FROM sp GROUP BY doc_id, span_id
        """,
        "bm25_search": """
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
                FROM documents
            ),
            pd AS (
                SELECT doc_id,
                       CAST(len(toks) AS DOUBLE) AS dl,
                       CAST(len(list_filter(toks, w -> w = 'stream')) AS DOUBLE) AS tf_0,
                       CAST(len(list_filter(toks, w -> w = 'window')) AS DOUBLE) AS tf_1,
                       CAST(len(list_filter(toks, w -> w = 'query')) AS DOUBLE) AS tf_2
                FROM d
            ),
            st AS (
                SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                       avg(dl) AS avgdl,
                       CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
                       CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
                       CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_2
                FROM pd
            ),
            scored AS (
                SELECT doc_id,
                       round(
                           round(ln(1 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
                                 * tf_0 * 2.2 / (tf_0 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)
                         + round(ln(1 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
                                 * tf_1 * 2.2 / (tf_1 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)
                         + round(ln(1 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
                                 * tf_2 * 2.2 / (tf_2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)
                       , 6) AS score
                FROM pd, st
            )
            SELECT doc_id, score FROM scored
            WHERE score > 0
            ORDER BY score DESC, doc_id ASC LIMIT 15
        """,
        "numeric_profile": """
            WITH src AS (SELECT * FROM lineitem)
            SELECT 'l_quantity' AS col_name,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(count(*) - count(l_quantity) AS DOUBLE) AS n_null,
                   CAST(count(DISTINCT CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS n_distinct,
                   round(min(CAST(l_quantity AS DOUBLE)), 6) AS min,
                   round(max(CAST(l_quantity AS DOUBLE)), 6) AS max,
                   round(avg(CAST(l_quantity AS DOUBLE)), 6) AS mean,
                   round(stddev(CAST(l_quantity AS DOUBLE)), 6) AS stddev,
                   round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50
            FROM src
            UNION ALL
            SELECT 'l_extendedprice',
                   CAST(count(*) AS DOUBLE),
                   CAST(count(*) - count(l_extendedprice) AS DOUBLE),
                   CAST(count(DISTINCT CAST(l_extendedprice AS DOUBLE)) AS DOUBLE),
                   round(min(CAST(l_extendedprice AS DOUBLE)), 6),
                   round(max(CAST(l_extendedprice AS DOUBLE)), 6),
                   round(avg(CAST(l_extendedprice AS DOUBLE)), 6),
                   round(stddev(CAST(l_extendedprice AS DOUBLE)), 6),
                   round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6)
            FROM src
            UNION ALL
            SELECT 'l_discount',
                   CAST(count(*) AS DOUBLE),
                   CAST(count(*) - count(l_discount) AS DOUBLE),
                   CAST(count(DISTINCT CAST(l_discount AS DOUBLE)) AS DOUBLE),
                   round(min(CAST(l_discount AS DOUBLE)), 6),
                   round(max(CAST(l_discount AS DOUBLE)), 6),
                   round(avg(CAST(l_discount AS DOUBLE)), 6),
                   round(stddev(CAST(l_discount AS DOUBLE)), 6),
                   round(quantile_cont(CAST(l_discount AS DOUBLE), 0.5), 6)
            FROM src
            UNION ALL
            SELECT 'l_tax',
                   CAST(count(*) AS DOUBLE),
                   CAST(count(*) - count(l_tax) AS DOUBLE),
                   CAST(count(DISTINCT CAST(l_tax AS DOUBLE)) AS DOUBLE),
                   round(min(CAST(l_tax AS DOUBLE)), 6),
                   round(max(CAST(l_tax AS DOUBLE)), 6),
                   round(avg(CAST(l_tax AS DOUBLE)), 6),
                   round(stddev(CAST(l_tax AS DOUBLE)), 6),
                   round(quantile_cont(CAST(l_tax AS DOUBLE), 0.5), 6)
            FROM src
        """,
        "cms_user_counts": """
            WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
            dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
            cells AS (
                SELECT d,
                       CAST(('0x' || substr(md5(d::VARCHAR || '|' || key), 1, 8)) AS BIGINT) % 64 AS w,
                       count(*) AS cnt
                FROM ev, dd GROUP BY 1, 2
            ),
            keys AS (SELECT key, count(*) AS true_n FROM ev GROUP BY key),
            probes AS (
                SELECT k.key, k.true_n, d.d,
                       CAST(('0x' || substr(md5(d.d::VARCHAR || '|' || k.key), 1, 8)) AS BIGINT) % 64 AS w
                FROM keys k, dd d
            ),
            est AS (
                SELECT p.key, p.true_n, min(coalesce(c.cnt, 0)) AS est
                FROM probes p LEFT JOIN cells c ON c.d = p.d AND c.w = p.w
                GROUP BY 1, 2
            )
            SELECT CAST(key AS BIGINT) AS user_id, est, true_n,
                   est - true_n AS overcount
            FROM est
        """,
        "hll_distinct": """
            WITH ev AS (
                SELECT event_type, CAST(event_id AS VARCHAR) AS key FROM events
            ),
            h AS (
                SELECT event_type,
                       CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) AS hv
                FROM ev
            ),
            parts AS (
                SELECT event_type,
                       CAST(floor(hv / 67108864.0) AS BIGINT) AS bucket,
                       hv % 67108864 AS w
                FROM h
            ),
            rho AS (
                SELECT event_type, bucket,
                       CASE WHEN w = 0 THEN 27
                            ELSE 26 - CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT)
                       END AS rho
                FROM parts
            ),
            regs AS (
                SELECT event_type, bucket, max(rho) AS register
                FROM rho GROUP BY 1, 2
            ),
            pg AS (
                SELECT event_type,
                       sum(power(2.0, -register)) AS present_sum,
                       count(*) AS n_present
                FROM regs GROUP BY 1
            ),
            est AS (
                SELECT event_type,
                       CASE WHEN 2905.460551022604 / (present_sum + (64 - n_present)) <= 160.0
                                 AND n_present < 64
                            THEN 64.0 * ln(64.0 / (64 - n_present))
                            ELSE 2905.460551022604 / (present_sum + (64 - n_present))
                       END AS e
                FROM pg
            ),
            ex AS (
                SELECT event_type, count(DISTINCT event_id) AS exact_distinct
                FROM events GROUP BY 1
            )
            SELECT est.event_type,
                   round(est.e, 4) AS hll_est,
                   ex.exact_distinct,
                   round((round(est.e, 4) - exact_distinct) / exact_distinct, 4) AS rel_err
            FROM est JOIN ex ON est.event_type = ex.event_type
        """,
        "weighted_sample": """
            WITH r AS (
                SELECT lang, doc_id, n_chars,
                       round(
                           -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                % 4294967296 + 1) / 4294967296.0)
                           / CAST(n_chars AS DOUBLE), 9) AS sample_rank
                FROM documents WHERE n_chars > 0
            ),
            rn AS (
                SELECT lang, doc_id, n_chars, sample_rank,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY sample_rank ASC, CAST(doc_id AS VARCHAR) ASC
                       ) AS rn
                FROM r
            )
            SELECT lang, doc_id, n_chars, sample_rank FROM rn WHERE rn <= 20
        """,
        "bloom_visited": """
            WITH docs AS (
                SELECT doc_id, 'doc:' || CAST(doc_id AS VARCHAR) AS key
                FROM documents
            ),
            hh AS (SELECT unnest([0, 1, 2]) AS i),
            bits AS (
                SELECT DISTINCT
                       CAST(('0x' || substr(md5(i::VARCHAR || '|' || key), 1, 8)) AS BIGINT) % 1024 AS bit
                FROM docs, hh WHERE doc_id < 250
            ),
            probes AS (
                SELECT d.doc_id, d.key, h.i,
                       CAST(('0x' || substr(md5(h.i::VARCHAR || '|' || d.key), 1, 8)) AS BIGINT) % 1024 AS bit
                FROM docs d, hh h
            ),
            member AS (
                SELECT p.doc_id,
                       min(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS is_member
                FROM probes p LEFT JOIN bits b ON p.bit = b.bit
                GROUP BY p.doc_id
            )
            SELECT doc_id, is_member,
                   CASE WHEN doc_id < 250 THEN 1 ELSE 0 END AS visited,
                   CASE WHEN is_member = 1 AND doc_id >= 250 THEN 1 ELSE 0 END AS false_positive
            FROM member
        """,
        "line_dedup": """
            WITH lines AS (
                SELECT doc_id,
                       CAST(generate_subscripts(regexp_extract_all(text, '\\S+( \\S+){0,2}'), 1) - 1 AS BIGINT) AS line_no,
                       unnest(regexp_extract_all(text, '\\S+( \\S+){0,2}')) AS line
                FROM documents
            ),
            ranked AS (
                SELECT doc_id, line_no, line,
                       len(string_split(line, ' ')) AS n_words,
                       row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
                FROM lines
            ),
            kept AS (
                SELECT doc_id, line_no, line FROM ranked WHERE n_words < 2 OR rn = 1
            ),
            totals AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
            ka AS (
                SELECT doc_id, count(*) AS n_kept,
                       md5(string_agg(line, ' ' ORDER BY line_no)) AS dedup_md5
                FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id, t.n_lines,
                   COALESCE(ka.n_kept, 0) AS n_kept,
                   t.n_lines - COALESCE(ka.n_kept, 0) AS n_dropped,
                   COALESCE(ka.dedup_md5, md5('')) AS dedup_md5
            FROM totals t LEFT JOIN ka USING (doc_id)
        """,
        "domain_mix_sample": """
            WITH counts AS (
                SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
            ),
            w AS (
                SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS wt FROM counts
            ),
            tot AS (SELECT sum(wt) AS total_w FROM w),
            rates AS (
                SELECT lang, n_docs,
                       round(least(1.0, 250.0 * wt / (SELECT total_w FROM tot) / n_docs), 9) AS mix_rate
                FROM w
            ),
            u AS (
                SELECT doc_id, lang,
                       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 4294967296 + 1) / 4294967296.0 AS samp_u
                FROM documents
            )
            SELECT u.lang, u.doc_id, r.n_docs, r.mix_rate
            FROM u JOIN rates r ON u.lang = r.lang
            WHERE u.samp_u <= r.mix_rate
        """,
        "lm_perplexity": """
            WITH toks AS (
                SELECT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t
                    FROM documents
                ) WHERE t <> ''
            ),
            counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
            stats AS (
                SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS vocab
                FROM counts
            ),
            scored AS (
                SELECT t.doc_id,
                       round(-log2((c + 1.0) / (n_total + vocab)), 9) AS nll
                FROM toks t JOIN counts USING (token) CROSS JOIN stats
            )
            SELECT doc_id, count(*) AS n_tokens,
                   round(sum(nll) / count(*), 6) AS avg_nll_bits
            FROM scored GROUP BY doc_id
        """,
        "pagerank_domains": _pagerank_oracle(iterations=5, damping=0.85),
        "incremental_dedup": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents
            ),
            mins AS (
                SELECT doc, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minh
                FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS seed) seeds
                GROUP BY doc, seed
            ),
            bandh AS (
                SELECT doc, seed // 4 AS band_id,
                       md5(string_agg(minh, '|' ORDER BY seed)) AS band_hash
                FROM mins GROUP BY doc, seed // 4
            ),
            cands AS (
                SELECT DISTINCT nb.doc AS new_doc, ob.doc AS old_doc
                FROM bandh nb
                JOIN bandh ob ON nb.band_id = ob.band_id
                             AND nb.band_hash = ob.band_hash
                WHERE nb.doc >= 250 AND ob.doc < 250
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT c.new_doc, c.old_doc, count(*) AS n_inter
                FROM cands c
                JOIN sh a ON a.doc = c.old_doc
                JOIN sh b ON b.doc = c.new_doc AND b.shingle = a.shingle
                GROUP BY 1, 2
            ),
            j AS (
                SELECT i.new_doc, i.old_doc,
                       round(i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
                FROM inter i
                JOIN sizes sa ON sa.doc = i.old_doc
                JOIN sizes sb ON sb.doc = i.new_doc
            )
            SELECT new_doc, old_doc, jaccard FROM j WHERE jaccard >= 0.8
        """,
        "funnel_conversion": """
            WITH e AS (SELECT user_id, event_type, ts FROM events),
            s1 AS (
                SELECT user_id, min(ts) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t1
                  AND e.ts <= s1.t1 + INTERVAL 86400 SECOND
                GROUP BY e.user_id
            ),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                  AND e.ts <= s2.t2 + INTERVAL 86400 SECOND
                GROUP BY e.user_id
            ),
            u AS (
                SELECT (SELECT count(*) FROM s1) AS u1,
                       (SELECT count(*) FROM s2) AS u2,
                       (SELECT count(*) FROM s3) AS u3
            )
            SELECT CAST(1 AS BIGINT) AS step_index, 'view' AS step, u1 AS users,
                   round(u1 * 1.0 / u1, 6) AS conv_from_prev FROM u
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'click', u2, round(u2 * 1.0 / u1, 6) FROM u
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'purchase', u3, round(u3 * 1.0 / u2, 6) FROM u
        """,
        "zorder_events": _zorder_oracle(bits=8),
        "cohort_retention": """
            WITH e AS (
                SELECT user_id AS u,
                       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
                FROM events
                WHERE event_type = 'purchase' AND value > 80.0
            ),
            first AS (SELECT u, min(wk) AS cohort_week FROM e GROUP BY u),
            act AS (SELECT DISTINCT u, wk FROM e),
            sizes AS (
                SELECT cohort_week, count(*) AS cohort_size
                FROM first GROUP BY cohort_week
            ),
            cells AS (
                SELECT f.cohort_week, a.wk - f.cohort_week AS week_offset,
                       count(DISTINCT a.u) AS active_users
                FROM act a JOIN first f USING (u)
                GROUP BY 1, 2
            )
            SELECT c.cohort_week, c.week_offset, s.cohort_size, c.active_users,
                   round(c.active_users * 1.0 / s.cohort_size, 6) AS retention
            FROM cells c JOIN sizes s USING (cohort_week)
        """,
        "hll_merged": """
            WITH h AS (
                SELECT event_type,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
                FROM events
            ),
            parts AS (
                SELECT event_type,
                       CAST(floor(hv / 67108864.0) AS BIGINT) AS bucket,
                       hv % 67108864 AS w
                FROM h
            ),
            rho AS (
                SELECT event_type, bucket,
                       CASE WHEN w = 0 THEN 27
                            ELSE 26 - CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT)
                       END AS rho
                FROM parts
            ),
            regs_t AS (
                SELECT event_type, bucket, max(rho) AS register
                FROM rho GROUP BY 1, 2
            ),
            regs_m AS (SELECT bucket, max(register) AS register FROM regs_t GROUP BY 1),
            regs_d AS (SELECT bucket, max(rho) AS register FROM rho GROUP BY 1),
            est_m AS (
                SELECT CASE WHEN 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*))) <= 160.0
                                 AND count(*) < 64
                            THEN 64.0 * ln(64.0 / (64 - count(*)))
                            ELSE 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*)))
                       END AS e
                FROM regs_m
            ),
            est_d AS (
                SELECT CASE WHEN 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*))) <= 160.0
                                 AND count(*) < 64
                            THEN 64.0 * ln(64.0 / (64 - count(*)))
                            ELSE 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*)))
                       END AS e
                FROM regs_d
            ),
            ex AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
            SELECT round(est_m.e, 4) AS merged_est,
                   round(est_d.e, 4) AS direct_est,
                   ex.exact_distinct,
                   CASE WHEN round(est_m.e, 4) = round(est_d.e, 4) THEN 1 ELSE 0 END AS merge_exact
            FROM est_m, est_d, ex
        """,
        "event_transitions": """
            WITH seq AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS next_type
                FROM events
            ),
            pairs AS (
                SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
                FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
            ),
            tot AS (SELECT from_type, sum(n) AS n_from FROM pairs GROUP BY 1)
            SELECT p.from_type, p.to_type, p.n,
                   round(p.n / t.n_from, 6) AS prob
            FROM pairs p JOIN tot t USING (from_type)
        """,
        "jsonl_ingest": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(NULL AS VARCHAR) AS error
            FROM documents WHERE doc_id < 100
            UNION ALL
            SELECT 'x1', CAST(1 AS BIGINT), NULL
            UNION ALL
            SELECT NULL, CAST(length('orphan text without id') AS BIGINT),
                   'MissingFieldError'
            UNION ALL
            SELECT NULL, NULL, 'MalformedJsonError'
        """,
        "price_histogram": """
            WITH mm AS (
                SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mlo,
                       max(CAST(l_extendedprice AS DOUBLE)) AS mhi
                FROM lineitem
            ),
            b AS (
                SELECT CASE WHEN mhi - mlo = 0 THEN 0
                            ELSE CAST(least(9, floor(
                                ((CAST(l_extendedprice AS DOUBLE) - mlo) * 10) / (mhi - mlo)
                            )) AS BIGINT)
                       END AS bin,
                       mlo, mhi
                FROM lineitem, mm
                WHERE l_extendedprice IS NOT NULL
            )
            SELECT bin,
                   round(mlo + bin * (mhi - mlo) / 10, 6) AS lo,
                   round(mlo + (bin + 1) * (mhi - mlo) / 10, 6) AS hi,
                   count(*) AS n
            FROM b GROUP BY bin, mlo, mhi
        """,
        "corpus_scorecard": """
            WITH base AS (
                SELECT doc_id, text,
                       string_split_regex(trim(text), '\\s+') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents
            ),
            m AS (
                SELECT doc_id,
                       len(toks) AS n_tokens,
                       round(length(regexp_replace(text, '\\s', '', 'g'))
                             / greatest(len(toks), 1), 6) AS mean_word_len,
                       round(len(list_filter(toks,
                                 t -> regexp_matches(t, '[A-Za-z]')))
                             / greatest(len(toks), 1), 6) AS alpha_word_ratio,
                       round(len(list_filter(lines,
                                 l -> regexp_matches(trim(l), '^[-*•]')))
                             / greatest(len(lines), 1), 6) AS bullet_line_ratio,
                       round(len(list_filter(lines,
                                 l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                             / greatest(len(lines), 1), 6) AS ellipsis_line_ratio,
                       round(1.0 - len(list_distinct(lines))
                             / greatest(len(lines), 1), 6) AS dup_line_fraction,
                       round(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                             / greatest(len(toks), 1), 6) AS symbol_word_ratio
                FROM base
            ),
            gate AS (
                SELECT doc_id, n_tokens,
                       (n_tokens >= 50 AND n_tokens <= 100000
                        AND mean_word_len >= 3 AND mean_word_len <= 10
                        AND alpha_word_ratio >= 0.8
                        AND bullet_line_ratio <= 0.9
                        AND ellipsis_line_ratio <= 0.3
                        AND dup_line_fraction <= 0.3
                        AND symbol_word_ratio <= 0.1) AS gopher_pass
                FROM m
            ),
            lmtoks AS (
                SELECT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t
                    FROM documents
                ) WHERE t <> ''
            ),
            lmcounts AS (SELECT token, count(*) AS c FROM lmtoks GROUP BY token),
            lmstats AS (
                SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS vocab
                FROM lmcounts
            ),
            lmscored AS (
                SELECT t.doc_id,
                       round(-log2((c + 1.0) / (n_total + vocab)), 9) AS nllv
                FROM lmtoks t JOIN lmcounts USING (token) CROSS JOIN lmstats
            ),
            nll AS (
                SELECT doc_id, round(sum(nllv) / count(*), 6) AS avg_nll_bits
                FROM lmscored GROUP BY doc_id
            ),
            dl AS (
                SELECT doc_id,
                       CAST(generate_subscripts(regexp_extract_all(text, '\\S+( \\S+){0,2}'), 1) - 1 AS BIGINT) AS line_no,
                       unnest(regexp_extract_all(text, '\\S+( \\S+){0,2}')) AS line
                FROM documents
            ),
            dlr AS (
                SELECT doc_id, line_no, line,
                       len(string_split(line, ' ')) AS n_words,
                       row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
                FROM dl
            ),
            dupf AS (
                SELECT doc_id,
                       CASE WHEN count(*) FILTER (WHERE n_words >= 2 AND rn > 1) > 0
                            THEN 1 ELSE 0 END AS has_dup_lines
                FROM dlr GROUP BY doc_id
            )
            SELECT d.lang, count(*) AS n_docs,
                   round(avg(CASE WHEN gate.gopher_pass THEN 1 ELSE 0 END), 6) AS pct_gopher_pass,
                   round(avg(nll.avg_nll_bits), 6) AS mean_nll_bits,
                   round(avg(dupf.has_dup_lines), 6) AS dup_line_doc_rate,
                   round(avg(CAST(gate.n_tokens AS DOUBLE)), 6) AS mean_tokens
            FROM documents d
            JOIN gate USING (doc_id)
            JOIN nll USING (doc_id)
            JOIN dupf USING (doc_id)
            GROUP BY d.lang
        """,
        "scd2_user_state": """
            WITH upd AS (
                SELECT user_id, event_id, ts, event_type AS state FROM events
            ),
            seq AS (
                SELECT user_id, event_id, ts, state,
                       lag(state) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_state
                FROM upd
            ),
            chg AS (
                SELECT user_id, event_id, ts, state
                FROM seq WHERE prev_state IS NULL OR prev_state <> state
            ),
            ver AS (
                SELECT user_id, state, ts AS valid_from,
                       lead(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS valid_to
                FROM chg
            )
            SELECT user_id, state, valid_from, valid_to,
                   CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
            FROM ver
        """,
        "fuzzy_source_match": """
            WITH canon AS (SELECT DISTINCT source FROM documents),
            dirty AS (
                SELECT DISTINCT
                       CASE WHEN doc_id % 2 = 0 THEN 'z' || substr(source, 2)
                            ELSE source || 'x' END AS dirty
                FROM documents WHERE doc_id % 3 = 0
            )
            SELECT d.dirty, c.source AS canonical,
                   CAST(levenshtein(d.dirty, c.source) AS BIGINT) AS dist
            FROM dirty d CROSS JOIN canon c
            WHERE levenshtein(d.dirty, c.source) <= 1
        """,
        "value_trend": """
            WITH pts AS (
                SELECT event_type,
                       epoch_us(ts) / 86400000000.0 - 19723.0 AS x,
                       CAST(value AS DOUBLE) AS y
                FROM events
            ),
            s AS (
                SELECT event_type,
                       CAST(count(*) AS DOUBLE) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx,
                       sum(y * y) AS syy
                FROM pts GROUP BY event_type
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
                   round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
            FROM s
        """,
        "data_quality_report": """
            SELECT 'completeness(l_shipdate)' AS check_name,
                   round(count(l_shipdate) * 1.0 / count(*), 6) AS metric,
                   CASE WHEN round(count(l_shipdate) * 1.0 / count(*), 6) >= 1.0
                        THEN 1 ELSE 0 END AS passed
            FROM lineitem
            UNION ALL
            SELECT 'uniqueness(o_orderkey)',
                   round(uniq * 1.0 / n, 6),
                   CASE WHEN round(uniq * 1.0 / n, 6) >= 1.0 THEN 1 ELSE 0 END
            FROM (
                SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uniq
                FROM (
                    SELECT o_orderkey, count(*) AS c FROM orders
                    WHERE o_orderkey IS NOT NULL GROUP BY 1
                )
            )
            UNION ALL
            SELECT 'uniqueness(user_id)',
                   round(uniq * 1.0 / n, 6),
                   CASE WHEN round(uniq * 1.0 / n, 6) >= 1.0 THEN 1 ELSE 0 END
            FROM (
                SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uniq
                FROM (
                    SELECT user_id, count(*) AS c FROM events
                    WHERE user_id IS NOT NULL GROUP BY 1
                )
            )
            UNION ALL
            SELECT 'referential(o_custkey)',
                   round(m * 1.0 / n, 6),
                   CASE WHEN round(m * 1.0 / n, 6) >= 1.0 THEN 1 ELSE 0 END
            FROM (
                SELECT (SELECT count(o_custkey) FROM orders) AS n,
                       (SELECT count(*) FROM orders
                        WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS m
            )
            UNION ALL
            SELECT 'accepted(l_returnflag)',
                   round(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END) * 1.0
                         / count(l_returnflag), 6),
                   CASE WHEN round(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END) * 1.0
                                   / count(l_returnflag), 6) >= 1.0 THEN 1 ELSE 0 END
            FROM lineitem
            UNION ALL
            SELECT 'in_range(value)',
                   round(sum(CASE WHEN value >= 0.0 AND value <= 100.0 THEN 1 ELSE 0 END) * 1.0
                         / count(value), 6),
                   CASE WHEN round(sum(CASE WHEN value >= 0.0 AND value <= 100.0 THEN 1 ELSE 0 END) * 1.0
                                   / count(value), 6) >= 1.0 THEN 1 ELSE 0 END
            FROM events
        """,
        "ewma_user_value": """
            WITH ordered AS (
                SELECT user_id, event_id, CAST(value AS DOUBLE) AS x,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) - 1 AS t
                FROM events
            ),
            w AS (
                SELECT user_id, event_id, x, t,
                       CASE WHEN t = 0 THEN 0.0
                            ELSE x * power(0.8, -CAST(t AS DOUBLE)) END AS wterm
                FROM ordered
            ),
            c AS (
                SELECT user_id, event_id, x, t,
                       sum(wterm) OVER (
                           PARTITION BY user_id ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum,
                       first_value(x) OVER (PARTITION BY user_id ORDER BY t) AS x0
                FROM w
            )
            SELECT user_id, event_id,
                   round(power(0.8, CAST(t AS DOUBLE)) * (x0 + 0.2 * cum), 6) AS ewma
            FROM c
        """,
        "events_sliding_windows": """
            WITH e AS (
                SELECT event_type, value, epoch_us(ts) AS t FROM events
            ),
            x AS (
                SELECT event_type, value,
                       (t // 1800000000) * 1800000000 AS w0
                FROM e
            ),
            hop AS (
                SELECT event_type, value, w0 AS ws FROM x
                UNION ALL
                SELECT event_type, value, w0 - 1800000000 FROM x
            )
            SELECT ws AS window_start_us, event_type,
                   count(*) AS n, round(sum(value), 6) AS sum_value
            FROM hop GROUP BY 1, 2
        """,
        "twap_user_value": """
            WITH e AS (
                SELECT user_id, value, epoch_us(ts) AS t_us,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS next_us
                FROM events
            ),
            h AS (
                SELECT user_id, value, (next_us - t_us) / 1e6 AS hold_s
                FROM e WHERE next_us IS NOT NULL
            )
            SELECT user_id, count(*) AS n_intervals,
                   round(sum(hold_s), 6) AS span_s,
                   round(sum(value * hold_s) / sum(hold_s), 6) AS twap,
                   round(avg(value), 6) AS plain_avg
            FROM h GROUP BY user_id
        """,
        "value_outliers": """
            WITH s AS (
                SELECT event_type, avg(value) AS mu, count(*) AS n,
                       sum(value * value) AS sxx, sum(value) AS sx
                FROM events GROUP BY event_type
            ),
            s2 AS (
                SELECT event_type, mu,
                       sqrt((sxx - sx * sx / n) / n) AS sigma
                FROM s
            )
            SELECT e.event_type, e.event_id, e.value,
                   round((e.value - s2.mu) / s2.sigma, 6) AS z
            FROM events e JOIN s2 USING (event_type)
            WHERE abs(round((e.value - s2.mu) / s2.sigma, 6)) > 2.5
        """,
        "similarity_join_exact": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
                GROUP BY 1, 2
            ),
            j AS (
                SELECT i.doc_a, i.doc_b,
                       round(i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
                FROM inter i
                JOIN sizes sa ON sa.doc = i.doc_a
                JOIN sizes sb ON sb.doc = i.doc_b
            )
            SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
        """,
        "lang_source_chi2": """
            WITH cells AS (
                SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
            ),
            r AS (SELECT lang, count(*) AS row_n FROM documents GROUP BY 1),
            c AS (SELECT source, count(*) AS col_n FROM documents GROUP BY 1),
            t AS (SELECT count(*) AS total FROM documents),
            grid AS (
                SELECT r.lang, c.source, r.row_n, c.col_n FROM r CROSS JOIN c
            ),
            con AS (
                SELECT g.row_n * g.col_n / CAST(t.total AS DOUBLE) AS e,
                       COALESCE(cl.o, 0) AS o
                FROM grid g
                LEFT JOIN cells cl ON g.lang = cl.lang AND g.source = cl.source
                CROSS JOIN t
            ),
            con2 AS (SELECT round((o - e) * (o - e) / e, 9) AS cc FROM con)
            SELECT round(sum(cc), 6) AS chi2,
                   CAST(((SELECT count(*) FROM r) - 1)
                        * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof
            FROM con2
        """,
        "top_event_paths": """
            WITH seq AS (
                SELECT event_type,
                       lead(event_type, 1) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS t2,
                       lead(event_type, 2) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS t3
                FROM events
            ),
            paths AS (
                SELECT event_type || '>' || t2 || '>' || t3 AS path, count(*) AS n
                FROM seq WHERE t3 IS NOT NULL GROUP BY 1
            )
            SELECT path, n FROM paths ORDER BY n DESC, path ASC LIMIT 20
        """,
        "crawl_budget_allocation": """
            WITH demands AS (
                SELECT source, CAST(sum(n_chars) AS DOUBLE) AS demand
                FROM documents GROUP BY 1
            ),
            tot AS (SELECT 0.9 * sum(demand) AS b FROM demands),
            ranked AS (
                SELECT source, demand,
                       row_number() OVER (ORDER BY demand ASC, source ASC) AS k,
                       sum(demand) OVER (
                           ORDER BY demand ASC, source ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS s,
                       count(*) OVER () AS n
                FROM demands
            ),
            f AS (
                SELECT *,
                       CASE WHEN (s - demand) + demand * (n - k + 1)
                                 <= (SELECT b FROM tot)
                            THEN 1 ELSE 0 END AS fully
                FROM ranked
            ),
            agg AS (
                SELECT CAST(sum(fully) AS BIGINT) AS j,
                       COALESCE(sum(CASE WHEN fully = 1 THEN demand END), 0.0) AS s_j,
                       count(*) AS n
                FROM f
            ),
            lvl AS (
                SELECT CASE WHEN j = n THEN NULL
                            ELSE ((SELECT b FROM tot) - s_j) / (n - j)
                       END AS t
                FROM agg
            )
            SELECT f.source, f.demand AS demand,
                   round(CASE WHEN lvl.t IS NULL THEN f.demand
                              ELSE least(f.demand, lvl.t) END, 6) AS alloc,
                   CASE WHEN lvl.t IS NOT NULL AND f.demand > lvl.t
                        THEN 1 ELSE 0 END AS capped
            FROM f, lvl
        """,
        "langid_confusion": f"""
            WITH hits AS (
                SELECT doc_id,
                       {_lang_hits_sql('de')} AS h_de,
                       {_lang_hits_sql('en')} AS h_en,
                       {_lang_hits_sql('es')} AS h_es,
                       {_lang_hits_sql('fr')} AS h_fr
                FROM documents
            ),
            sw AS (
                SELECT doc_id,
                       CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                            WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                            WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                            WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                            ELSE 'de'
                       END AS stopword_lang
                FROM hits
            ),
            pats(lang_c, pat) AS (VALUES {_trigram_pats_sql()}),
            scores AS (
                SELECT d.doc_id, p.lang_c,
                       len(regexp_extract_all(lower(d.text), p.pat)) AS score
                FROM documents d CROSS JOIN pats p
            ),
            ranked AS (
                SELECT doc_id, lang_c, score,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, lang_c DESC
                       ) AS rn
                FROM scores
            ),
            tg AS (
                SELECT doc_id,
                       CASE WHEN score > 0 THEN lang_c ELSE 'und' END AS trigram_lang
                FROM ranked WHERE rn = 1
            )
            SELECT d.lang AS gold, sw.stopword_lang, tg.trigram_lang,
                   count(*) AS n
            FROM documents d
            JOIN sw USING (doc_id)
            JOIN tg USING (doc_id)
            GROUP BY 1, 2, 3
        """,
        "term_pmi": """
            WITH w AS (
                SELECT string_split_regex(trim(text), '\\s+') AS l FROM documents
            ),
            big AS (
                SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM w
            ),
            pc AS (
                SELECT p[1] AS w1, p[2] AS w2, count(*) AS c12
                FROM big GROUP BY 1, 2
            ),
            uni AS (SELECT unnest(l) AS tok FROM w),
            uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
            tot AS (
                SELECT (SELECT CAST(sum(c12) AS BIGINT) FROM pc) AS big_c,
                       (SELECT CAST(sum(c) AS BIGINT) FROM uc) AS n_words
            ),
            j AS (
                SELECT pc.w1, pc.w2, pc.c12,
                       round(log2((pc.c12 * t.n_words * t.n_words) * 1.0
                                  / (t.big_c * u1.c * u2.c)), 6) AS pmi
                FROM pc
                JOIN uc u1 ON pc.w1 = u1.tok
                JOIN uc u2 ON pc.w2 = u2.tok
                CROSS JOIN tot t
                WHERE pc.c12 >= 10
            )
            SELECT w1, w2, c12, pmi FROM j
            ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
        """,
        "nfc_normalize": """
            WITH aug AS (
                SELECT doc_id,
                       text || CASE WHEN doc_id % 2 = 0
                                    THEN ' cafe' || chr(769)
                                    ELSE ' cafe' END AS t
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END AS changed,
                   md5(nfc_normalize(t)) AS nfc_md5
            FROM aug
        """,
        "lsh_quality_eval": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            mins AS (
                SELECT doc, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minh
                FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS seed) seeds
                GROUP BY doc, seed
            ),
            bandh AS (
                SELECT doc, seed // 4 AS band_id,
                       md5(string_agg(minh, '|' ORDER BY seed)) AS band_hash
                FROM mins GROUP BY doc, seed // 4
            ),
            cands AS (
                SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
                FROM bandh a
                JOIN bandh b ON a.band_id = b.band_id
                            AND a.band_hash = b.band_hash
                            AND a.doc < b.doc
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
                GROUP BY 1, 2
            ),
            truth AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes sa ON sa.doc = doc_a
                JOIN sizes sb ON sb.doc = doc_b
                WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
            ),
            hits AS (
                SELECT c.doc_a FROM cands c
                JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
            ),
            agg AS (
                SELECT (SELECT count(*) FROM cands) AS n_candidates,
                       (SELECT count(*) FROM truth) AS n_true,
                       (SELECT count(*) FROM hits) AS n_hit
            )
            SELECT n_candidates, n_true, n_hit,
                   round(n_hit * 1.0 / n_candidates, 6) AS precision,
                   round(n_hit * 1.0 / n_true, 6) AS recall
            FROM agg
        """,
        "snapshot_diff": """
            WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
            new_rows AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                                ELSE text END) AS h
                FROM documents WHERE doc_id % 11 != 0
                UNION ALL
                SELECT doc_id + 100000, md5('new:' || text)
                FROM documents WHERE doc_id < 25
            ),
            j AS (
                SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                       o.h AS h_old, n.h AS h_new
                FROM old o FULL OUTER JOIN new_rows n ON o.doc_id = n.doc_id
            )
            SELECT doc_id,
                   CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        WHEN h_old <> h_new THEN 'changed'
                        ELSE 'unchanged' END AS change
            FROM j
            WHERE (CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        WHEN h_old <> h_new THEN 'changed'
                        ELSE 'unchanged' END) != 'unchanged'
        """,
        "cdc_chunks": """
            WITH toks AS (
                SELECT doc_id,
                       generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) - 1 AS pos,
                       unnest(string_split_regex(trim(text), '\\s+')) AS word
                FROM documents
            ),
            g AS (
                SELECT doc_id, pos, word,
                       lag(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
                       lag(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
                FROM toks
            ),
            flagged AS (
                SELECT doc_id, pos, word,
                       CASE WHEN pos >= 2
                                 AND CAST(('0x' || substr(md5(w2 || ' ' || w1 || ' ' || word), 1, 8)) AS BIGINT) % 8 = 0
                            THEN 1 ELSE 0 END AS flag
                FROM g
            ),
            chunked AS (
                SELECT doc_id, pos, word,
                       sum(flag) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS chunk_id
                FROM flagged
            )
            SELECT doc_id, chunk_id, count(*) AS n_words,
                   md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_md5
            FROM chunked GROUP BY doc_id, chunk_id
        """,
        "readability_scores": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+')) AS n_words,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
                   len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables,
                   round(0.39 * len(regexp_extract_all(text, '\\S+'))
                              / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                         + 11.8 * len(regexp_extract_all(lower(text), '[aeiouy]+'))
                                / greatest(len(regexp_extract_all(text, '\\S+')), 1)
                         - 15.59, 6) AS fk_grade
            FROM documents
        """,
        "hll_intersection": """
            WITH h AS (
                SELECT event_type,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
                FROM events WHERE event_type IN ('view', 'purchase')
            ),
            parts AS (
                SELECT event_type,
                       CAST(floor(hv / 67108864.0) AS BIGINT) AS bucket,
                       hv % 67108864 AS w
                FROM h
            ),
            rho AS (
                SELECT event_type, bucket,
                       CASE WHEN w = 0 THEN 27
                            ELSE 26 - CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT)
                       END AS rho
                FROM parts
            ),
            regs_a AS (
                SELECT bucket, max(rho) AS register FROM rho
                WHERE event_type = 'view' GROUP BY 1
            ),
            regs_b AS (
                SELECT bucket, max(rho) AS register FROM rho
                WHERE event_type = 'purchase' GROUP BY 1
            ),
            regs_u AS (
                SELECT bucket, max(register) AS register FROM (
                    SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b
                ) GROUP BY 1
            ),
            ea AS (
                SELECT CASE WHEN 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*))) <= 160.0
                                 AND count(*) < 64
                            THEN 64.0 * ln(64.0 / (64 - count(*)))
                            ELSE 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*)))
                       END AS e
                FROM regs_a
            ),
            eb AS (
                SELECT CASE WHEN 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*))) <= 160.0
                                 AND count(*) < 64
                            THEN 64.0 * ln(64.0 / (64 - count(*)))
                            ELSE 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*)))
                       END AS e
                FROM regs_b
            ),
            eu AS (
                SELECT CASE WHEN 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*))) <= 160.0
                                 AND count(*) < 64
                            THEN 64.0 * ln(64.0 / (64 - count(*)))
                            ELSE 2905.460551022604 / (sum(power(2.0, -register)) + (64 - count(*)))
                       END AS e
                FROM regs_u
            ),
            ex AS (
                SELECT count(*) AS exact_intersection FROM (
                    SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
                    INTERSECT
                    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
                )
            )
            SELECT round(ea.e, 4) AS est_a, round(eb.e, 4) AS est_b,
                   round(eu.e, 4) AS est_union,
                   round(round(ea.e, 4) + round(eb.e, 4) - round(eu.e, 4), 4) AS est_intersection,
                   ex.exact_intersection
            FROM ea, eb, eu, ex
        """,
        "value_quantile_norm": """
            WITH ranked AS (
                SELECT event_type, event_id, value,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY value, event_id
                       ) AS rn
                FROM events
            ),
            ties AS (
                SELECT event_type, value, (min(rn) + max(rn)) / 2.0 AS avg_rank
                FROM ranked GROUP BY 1, 2
            ),
            n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
            SELECT r.event_type, r.event_id, r.value,
                   round(t.avg_rank / (n.n + 1), 6) AS u
            FROM ranked r
            JOIN ties t ON r.event_type = t.event_type AND r.value = t.value
            JOIN n ON r.event_type = n.event_type
        """,
        "label_centroids": """
            WITH vals AS (
                SELECT vec_id, label,
                       generate_subscripts(embedding, 1) - 1 AS p,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ),
            cent AS (
                SELECT label, p, round(avg(v), 9) AS c
                FROM vals GROUP BY 1, 2
            ),
            per_vec AS (
                SELECT vals.vec_id, vals.label,
                       round(sum(vals.v * cent.c)
                             / (sqrt(sum(vals.v * vals.v)) * sqrt(sum(cent.c * cent.c))), 9) AS cos
                FROM vals JOIN cent ON vals.label = cent.label AND vals.p = cent.p
                GROUP BY 1, 2
            )
            SELECT label, count(*) AS n_vecs,
                   round(avg(cos), 6) AS mean_cos,
                   round(min(cos), 6) AS min_cos
            FROM per_vec GROUP BY label
        """,
        "ab_test_proportions": """
            WITH users AS (
                SELECT DISTINCT user_id,
                       CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
                FROM events
            ),
            purch AS (
                SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 90.0
            ),
            pv AS (
                SELECT u.variant, count(*) AS n,
                       count(p.user_id) AS conv
                FROM users u LEFT JOIN purch p ON u.user_id = p.user_id
                GROUP BY u.variant
            ),
            j AS (
                SELECT a.n AS n_a, a.conv AS c_a, b.n AS n_b, b.conv AS c_b
                FROM (SELECT n, conv FROM pv WHERE variant = 'A') a,
                     (SELECT n, conv FROM pv WHERE variant = 'B') b
            )
            SELECT n_a, c_a, n_b, c_b,
                   round(c_a * 1.0 / n_a, 6) AS rate_a,
                   round(c_b * 1.0 / n_b, 6) AS rate_b,
                   round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                         / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                                * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                                * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
                   CASE WHEN abs(round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                         / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                                * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                                * (1.0 / n_a + 1.0 / n_b)), 6)) >= 1.96
                        THEN 1 ELSE 0 END AS significant_05
            FROM j
        """,
        "revenue_gini": """
            WITH rev AS (
                SELECT o_custkey, CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS r
                FROM orders GROUP BY 1
            ),
            ranked AS (
                SELECT r, row_number() OVER (ORDER BY r ASC, o_custkey ASC) AS i
                FROM rev
            ),
            agg AS (
                SELECT count(*) AS n, sum(r) AS total, sum(i * r) AS weighted
                FROM ranked
            )
            SELECT n, round(total, 2) AS total_revenue,
                   round(2.0 * weighted / (n * total) - (n + 1) * 1.0 / n, 6) AS gini
            FROM agg
        """,
        "user_entropy": """
            WITH counts AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY 1, 2
            ),
            tot AS (
                SELECT user_id, CAST(sum(c) AS BIGINT) AS n
                FROM counts GROUP BY 1
            ),
            terms AS (
                SELECT c.user_id,
                       round(-(c.c * 1.0 / t.n) * log2(c.c * 1.0 / t.n), 9) AS t
                FROM counts c JOIN tot t USING (user_id)
            )
            SELECT user_id, round(sum(t), 6) AS entropy_bits,
                   count(*) AS n_types
            FROM terms GROUP BY user_id
        """,
        "sequence_packing_sharded": """
            WITH toks AS (
                SELECT doc_id, doc_id % 8 AS shard,
                       len(string_split_regex(trim(text), '\\s+')) AS n
                FROM documents
            ),
            cum AS (
                SELECT shard, doc_id, n,
                       CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) - n AS BIGINT) AS s,
                       CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS e
                FROM toks
            ),
            seg AS (
                SELECT shard, doc_id, s, e,
                       CAST(unnest(generate_series(s // 512, (e - 1) // 512)) AS BIGINT) AS seq_id
                FROM cum WHERE n > 0
            )
            SELECT CAST(shard AS BIGINT) AS shard, doc_id, seq_id,
                   CAST(greatest(s, seq_id * 512) - s AS BIGINT) AS doc_offset,
                   CAST(greatest(s, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_offset,
                   CAST(least(e, (seq_id + 1) * 512)
                        - greatest(s, seq_id * 512) AS BIGINT) AS n_tokens
            FROM seg
        """,
        "graph_degree_stats": """
            WITH nsrc AS (SELECT count(DISTINCT source) AS n FROM documents),
            edges AS (
                SELECT DISTINCT source AS src,
                       'src' || CAST(CAST(('0x' || substr(md5('link:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                     % (SELECT n FROM nsrc) AS VARCHAR) AS dst
                FROM documents
            ),
            outd AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY 1),
            ind AS (SELECT dst AS node, count(*) AS in_deg FROM edges GROUP BY 1),
            recip AS (
                SELECT e.src AS node, count(*) AS n_recip
                FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
                GROUP BY 1
            )
            SELECT COALESCE(o.node, i.node) AS node,
                   CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
                   CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
                   round(COALESCE(r.n_recip, 0) * 1.0
                         / greatest(COALESCE(o.out_deg, 0), 1), 6) AS reciprocity
            FROM outd o
            FULL OUTER JOIN ind i ON o.node = i.node
            LEFT JOIN recip r ON COALESCE(o.node, i.node) = r.node
        """,
        "curation_shortlist": f"""
            WITH q AS (
                SELECT lang, doc_id,
                       len(string_split_regex(trim(text), '\\s+')) AS token_count,
                       round(
                           round(len(list_intersect(
                                     list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
                                     [{_EN_STOPS}]))
                                 / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))), 1),
                                 6)
                           * round(ln(1.0 + len(string_split_regex(trim(text), '\\s+'))), 9),
                       6) AS score
                FROM documents
            )
            SELECT lang, doc_id, CAST(token_count AS BIGINT) AS token_count, score,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY score DESC, doc_id
                   ) AS BIGINT) AS rank
            FROM q QUALIFY rank <= 3
        """,
        "hits_domains": _hits_oracle(iterations=3),
        "rate_limit_admission": """
            WITH RECURSIVE ev AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ) AS idx
                FROM events
            ),
            rec AS (
                SELECT user_id, idx, ts_us,
                       TRUE AS admitted,
                       CAST(3000000 - 1000000 AS BIGINT) AS token_units
                FROM ev WHERE idx = 1
                UNION ALL
                SELECT e.user_id, e.idx, e.ts_us,
                       pre >= 1000000 AS admitted,
                       CAST(CASE WHEN pre >= 1000000 THEN pre - 1000000
                            ELSE pre END AS BIGINT) AS token_units
                FROM rec r
                JOIN ev e ON e.user_id = r.user_id AND e.idx = r.idx + 1,
                LATERAL (
                    SELECT least(3000000,
                                 r.token_units + (e.ts_us - r.ts_us) // 100000) AS pre
                ) p
            )
            SELECT user_id,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
                   CAST(sum(CASE WHEN admitted THEN 0 ELSE 1 END) AS BIGINT) AS n_denied,
                   round(sum(CASE WHEN admitted THEN 1 ELSE 0 END) * 1.0
                         / count(*), 6) AS admit_rate
            FROM rec GROUP BY user_id
        """,
        "quality_token_pyramid": f"""
            WITH scored AS (
                SELECT round(len(list_intersect(
                           list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
                           [{_EN_STOPS}]))
                       / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))), 1),
                       9) AS q,
                       len(string_split_regex(trim(text), '\\s+')) AS n_tokens
                FROM documents
            ),
            e AS (
                SELECT list_transform(
                    quantile_cont(q, [0.2, 0.4, 0.6, 0.8]), x -> round(x, 9)
                ) AS edges
                FROM scored
            ),
            tiers AS (
                SELECT CAST(len(list_filter(e.edges, t -> s.q > t)) AS BIGINT) AS tier,
                       count(*) AS n_docs,
                       CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens
                FROM scored s, e GROUP BY 1
            ),
            tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM tiers)
            SELECT tier, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
                   round(sum(n_tokens) OVER (
                       ORDER BY tier DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) / tot.total, 6) AS cum_token_share
            FROM tiers, tot
        """,
        "source_vocab_kl": """
            WITH toks AS (
                SELECT source,
                       unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
                FROM documents
            ),
            tk AS (SELECT source, term FROM toks WHERE term <> ''),
            sc AS (SELECT source, term, count(*) AS c_s FROM tk GROUP BY 1, 2),
            cc AS (SELECT term, count(*) AS c_c FROM tk GROUP BY 1),
            stot AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM sc GROUP BY 1),
            ctot AS (SELECT CAST(sum(c_c) AS BIGINT) AS n_c FROM cc),
            terms AS (
                SELECT sc.source,
                       round((sc.c_s * 1.0 / st.n_s)
                             * log2((sc.c_s * 1.0 / st.n_s)
                                    / (cc.c_c * 1.0 / ct.n_c)), 9) AS t
                FROM sc
                JOIN cc USING (term)
                JOIN stot st USING (source)
                CROSS JOIN ctot ct
            )
            SELECT source, round(sum(t), 6) AS kl_bits,
                   count(*) AS n_terms
            FROM terms GROUP BY source
        """,
        "packing_stats": """
            WITH toks AS (
                SELECT doc_id,
                       len(string_split_regex(trim(text), '\\s+')) AS n
                FROM documents
            ),
            cum AS (
                SELECT doc_id, n,
                       CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s,
                       CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS e
                FROM toks
            ),
            seg AS (
                SELECT doc_id,
                       CAST(unnest(generate_series(s // 512, (e - 1) // 512)) AS BIGINT) AS seq_id,
                       s, e
                FROM cum WHERE n > 0
            ),
            segs AS (
                SELECT doc_id, seq_id,
                       least(e, (seq_id + 1) * 512)
                       - greatest(s, seq_id * 512) AS n_tokens
                FROM seg
            ),
            per_seq AS (
                SELECT seq_id, sum(n_tokens) AS fill, count(*) AS segs
                FROM segs GROUP BY 1
            ),
            per_doc AS (
                SELECT doc_id, count(*) AS parts FROM segs GROUP BY 1
            )
            SELECT (SELECT count(*) FROM per_seq) AS n_sequences,
                   (SELECT CAST(sum(segs) AS BIGINT) FROM per_seq) AS n_segments,
                   (SELECT round(avg(fill / 512.0), 6) FROM per_seq) AS mean_fill,
                   (SELECT round(sum(CASE WHEN parts > 1 THEN 1 ELSE 0 END) * 1.0
                                 / count(*), 6) FROM per_doc) AS pct_docs_split
        """,
        "user_burstiness": """
            WITH gaps AS (
                SELECT user_id,
                       epoch(ts) - epoch(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       )) AS gap
                FROM events
            ),
            stats AS (
                SELECT user_id, count(*) AS n_gaps,
                       avg(gap) AS mean_gap, stddev_samp(gap) AS sd_gap
                FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
            )
            SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
                   round(mean_gap, 6) AS mean_gap,
                   round(round(sd_gap / mean_gap, 9), 6) AS cv,
                   round((round(sd_gap / mean_gap, 9) - 1)
                         / (round(sd_gap / mean_gap, 9) + 1), 6) AS burstiness
            FROM stats WHERE n_gaps >= 2
        """,
        "zipf_fit": """
            WITH toks AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
                FROM documents
            ),
            freq AS (
                SELECT term, count(*) AS freq FROM toks
                WHERE term <> '' GROUP BY term
            ),
            pts AS (
                SELECT round(log10(row_number() OVER (ORDER BY freq DESC, term)), 9) AS x,
                       round(log10(freq), 9) AS y
                FROM freq
            ),
            s AS (
                SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
                FROM pts
            )
            SELECT CAST(n AS BIGINT) AS n,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
                   round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
            FROM s
        """,
        "fk_audit": """
            SELECT 'orders.custkey' AS fk, count(*) AS n_orphans
            FROM orders o WHERE NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'lineitem.orderkey', count(*)
            FROM lineitem l WHERE NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
            UNION ALL
            SELECT 'lineitem.partkey', count(*)
            FROM lineitem l WHERE NOT EXISTS (
                SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        """,
        "media_sniff": """
            WITH m(i, magic) AS (VALUES
                (0, 'FFD8FF'), (1, '89504E470D0A1A0A'), (2, '47494638'),
                (3, '52494646'), (4, '25504446'),
                (5, '000000186674797069736F6D'), (6, '')),
            blobs AS (
                SELECT from_hex(m.magic) || encode(d.text) AS content
                FROM documents d JOIN m ON d.doc_id % 7 = m.i
            ),
            sniffed AS (
                SELECT CASE
                    WHEN substring(hex(content), 9, 8) = '66747970' THEN 'mp4'
                    WHEN starts_with(hex(content), '89504E470D0A1A0A') THEN 'png'
                    WHEN starts_with(hex(content), 'FFD8FF') THEN 'jpeg'
                    WHEN starts_with(hex(content), '47494638') THEN 'gif'
                    WHEN starts_with(hex(content), '52494646') THEN 'riff'
                    WHEN starts_with(hex(content), '25504446') THEN 'pdf'
                    ELSE 'unknown' END AS kind,
                    octet_length(content) AS n_bytes
                FROM blobs
            )
            SELECT kind, count(*) AS n_files,
                   CAST(sum(n_bytes) AS BIGINT) AS total_bytes
            FROM sniffed GROUP BY kind
        """,
        "value_equidepth": """
            WITH e AS (
                SELECT list_transform(
                    quantile_cont(value, [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]),
                    x -> round(x, 9)
                ) AS edges
                FROM events WHERE value IS NOT NULL
            ),
            b AS (
                SELECT CAST(len(list_filter(e.edges[2:5], t -> ev.value > t)) AS BIGINT) AS bin
                FROM events ev, e WHERE ev.value IS NOT NULL
            )
            SELECT bin,
                   round(e.edges[CAST(bin AS INT) + 1], 6) AS lo,
                   round(e.edges[CAST(bin AS INT) + 2], 6) AS hi,
                   count(*) AS n
            FROM b, e
            GROUP BY 1, 2, 3
        """,
        "source_overlap": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT doc_a, doc_b,
                       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
                FROM inter
                JOIN sizes sa ON sa.doc = doc_a
                JOIN sizes sb ON sb.doc = doc_b
                WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
            ),
            labeled AS (
                SELECT least(da.source, db.source) AS source_a,
                       greatest(da.source, db.source) AS source_b,
                       p.jaccard
                FROM pairs p
                JOIN documents da ON da.doc_id = p.doc_a
                JOIN documents db ON db.doc_id = p.doc_b
            )
            SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
                   round(avg(jaccard), 6) AS mean_jaccard
            FROM labeled GROUP BY 1, 2
        """,
        "key_skew_profile": """
            WITH counts AS (
                SELECT user_id AS key, count(*) AS n
                FROM events GROUP BY 1
            ),
            tot AS (
                SELECT CAST(sum(n) AS DOUBLE) AS total,
                       CAST(count(*) AS DOUBLE) AS n_keys
                FROM counts
            ),
            ranked AS (
                SELECT key, CAST(n AS BIGINT) AS n,
                       round(n / tot.total, 6) AS frac,
                       round(n / (tot.total / tot.n_keys), 6) AS hot_factor,
                       CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
                FROM counts, tot
            )
            SELECT key, n, frac, hot_factor, rank FROM ranked WHERE rank <= 10
        """,
        "novelty_scores": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents
            ),
            first_seen AS (
                SELECT shingle, min(doc) AS first_doc FROM sh GROUP BY 1
            ),
            scored AS (
                SELECT sh.doc,
                       count(*) AS n_shingles,
                       CAST(sum(CASE WHEN f.first_doc < sh.doc THEN 1 ELSE 0 END) AS BIGINT) AS n_seen_before
                FROM sh JOIN first_seen f USING (shingle)
                GROUP BY 1
            )
            SELECT doc AS doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
                   n_seen_before,
                   round(n_seen_before * 1.0 / n_shingles, 6) AS redundancy,
                   round(1.0 - n_seen_before * 1.0 / n_shingles, 6) AS novelty
            FROM scored
        """,
        "domain_boilerplate": """
            WITH lines AS (
                SELECT source AS domain, doc_id,
                       unnest(list_distinct(regexp_extract_all(text, '\\S+( \\S+){0,1}', 0))) AS line
                FROM documents
            ),
            per_line AS (
                SELECT domain, line, count(*) AS n_docs
                FROM lines GROUP BY 1, 2
            ),
            per_dom AS (
                SELECT source AS domain, count(DISTINCT doc_id) AS dom_docs
                FROM documents GROUP BY 1
            )
            SELECT domain, line, CAST(n_docs AS BIGINT) AS n_docs,
                   round(n_docs * 1.0 / dom_docs, 6) AS doc_frac
            FROM per_line JOIN per_dom USING (domain)
            WHERE round(n_docs * 1.0 / dom_docs, 6) >= 0.2
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id AS doc,
                       unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc, term, count(*) AS tf
                FROM toks WHERE term <> '' GROUP BY 1, 2
            ),
            dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
            n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc, tf.term, tf.tf,
                       round(tf.tf * round(ln(n.n_docs / dft.df_t), 9), 6) AS score
                FROM tf JOIN dft USING (term), n
            ),
            ranked AS (
                SELECT doc AS doc_id, term, tf, score,
                       CAST(row_number() OVER (
                           PARTITION BY doc ORDER BY score DESC, term
                       ) AS BIGINT) AS rank
                FROM scored
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score, rank
            FROM ranked WHERE rank <= 3
        """,
        "containment_pairs": """
            WITH sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
                       ))) AS shingle
                FROM documents WHERE doc_id < 300
            ),
            sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
            inter AS (
                SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc <> b.doc
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_inter * 1.0 / sa.n_sh, 6) AS containment
            FROM inter JOIN sizes sa ON sa.doc = doc_a
            WHERE round(n_inter * 1.0 / sa.n_sh, 6) >= 0.5
        """,
        "sequence_packing": """
            WITH toks AS (
                SELECT doc_id,
                       len(string_split_regex(trim(text), '\\s+')) AS n
                FROM documents
            ),
            cum AS (
                SELECT doc_id, n,
                       CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s,
                       CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS e
                FROM toks
            ),
            seg AS (
                SELECT doc_id, s, e,
                       CAST(unnest(generate_series(s // 512, (e - 1) // 512)) AS BIGINT) AS seq_id
                FROM cum WHERE n > 0
            )
            SELECT doc_id, seq_id,
                   CAST(greatest(s, seq_id * 512) - s AS BIGINT) AS doc_offset,
                   CAST(greatest(s, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_offset,
                   CAST(least(e, (seq_id + 1) * 512)
                        - greatest(s, seq_id * 512) AS BIGINT) AS n_tokens
            FROM seg
        """,
        "hybrid_search_rrf": """
            WITH d AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
                FROM documents
            ),
            pd AS (
                SELECT doc_id,
                       CAST(len(toks) AS DOUBLE) AS dl,
                       CAST(len(list_filter(toks, w -> w = 'stream')) AS DOUBLE) AS tf_0,
                       CAST(len(list_filter(toks, w -> w = 'window')) AS DOUBLE) AS tf_1,
                       CAST(len(list_filter(toks, w -> w = 'query')) AS DOUBLE) AS tf_2
                FROM d
            ),
            st AS (
                SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                       avg(dl) AS avgdl,
                       CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
                       CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
                       CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_2
                FROM pd
            ),
            scored AS (
                SELECT doc_id,
                       round(
                           round(ln(1 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
                                 * tf_0 * 2.2 / (tf_0 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)
                         + round(ln(1 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
                                 * tf_1 * 2.2 / (tf_1 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)
                         + round(ln(1 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
                                 * tf_2 * 2.2 / (tf_2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)
                       , 6) AS score
                FROM pd, st
            ),
            lex15 AS (
                SELECT doc_id, score FROM scored WHERE score > 0
                ORDER BY score DESC, doc_id ASC LIMIT 15
            ),
            lex AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
                FROM lex15
            ),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            cos15 AS (
                SELECT vec_id,
                       round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 4) AS cosine
                FROM embeddings, q
                ORDER BY cosine DESC, vec_id LIMIT 15
            ),
            cosr AS (
                SELECT vec_id AS doc_id,
                       row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS cos_rank
                FROM cos15
            )
            SELECT COALESCE(l.doc_id, c.doc_id) AS doc_id,
                   l.bm25_rank, c.cos_rank,
                   round(COALESCE(1.0 / (60 + l.bm25_rank), 0)
                         + COALESCE(1.0 / (60 + c.cos_rank), 0), 6) AS rrf
            FROM lex l FULL OUTER JOIN cosr c ON l.doc_id = c.doc_id
        """,
        "semdedup": """
            WITH cents AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                       embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id >= 100
                ORDER BY vec_id LIMIT 8
            ),
            corpus AS (
                SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                       (SELECT c.cell FROM cents c
                        ORDER BY round(list_aggregate(list_transform(
                                    list_zip(c.cv, e.embedding::DOUBLE[]),
                                    x -> (x[1] - x[2]) ^ 2), 'sum'), 9),
                                 c.cell
                        LIMIT 1) AS cell
                FROM embeddings e
            )
            SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
                   CASE WHEN EXISTS (
                       SELECT 1 FROM corpus b
                       WHERE b.cell = a.cell AND b.vec_id < a.vec_id
                         AND round(list_cosine_similarity(a.v, b.v), 4) >= 0.35
                   ) THEN 0 ELSE 1 END AS keep
            FROM corpus a
        """,
        "dsir_weights": """
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                                   t -> t <> '') AS l
                FROM documents
            ),
            uni AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5('dsir1:' || t.g), 1, 8)) AS BIGINT) % 256 AS bucket
                FROM toks, unnest(l) AS t(g)
            ),
            bi AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5('dsir2:' || p[1] || ' ' || p[2]), 1, 8)) AS BIGINT) % 256 AS bucket
                FROM toks, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z(p)
            ),
            feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
            raw AS (SELECT bucket, count(*) AS c_r FROM feats GROUP BY 1),
            tgt AS (SELECT bucket, count(*) AS c_t FROM feats WHERE lang = 'en' GROUP BY 1),
            tot AS (SELECT (SELECT sum(c_r) FROM raw) AS n_r,
                           (SELECT sum(c_t) FROM tgt) AS n_t),
            dim AS (
                SELECT r.bucket,
                       round(ln((COALESCE(t.c_t, 0) + 1) * 1.0 / (tot.n_t + 256))
                             - ln((r.c_r + 1) * 1.0 / (tot.n_r + 256)), 9) AS log_ratio
                FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
            ),
            dc AS (SELECT doc_id, bucket, count(*) AS c_df FROM feats GROUP BY 1, 2)
            , su AS (
                SELECT doc_id, CAST(sum(c_df) AS BIGINT) AS n_feats,
                       CAST(sum(CAST(round(c_df * log_ratio * 1e9) AS BIGINT)) AS BIGINT) AS s
                FROM dc JOIN dim USING (bucket)
                GROUP BY doc_id
            )
            SELECT doc_id, n_feats,
                   (CAST(sign(s) AS BIGINT) * ((abs(s) + 500) // 1000)) / 1e6 AS log_w
            FROM su
        """,
        "value_ks_drift": """
            WITH arms AS (
                SELECT event_type AS key, value AS v, user_id % 2 = 0 AS a
                FROM events
                UNION ALL
                SELECT 'click_shifted' AS key,
                       CASE WHEN user_id % 2 = 0 THEN value
                            ELSE round(value * 1.75, 9) END AS v,
                       user_id % 2 = 0 AS a
                FROM events WHERE event_type = 'click'
            ),
            pts AS (
                SELECT key, v,
                       count(*) FILTER (a) AS a_c,
                       count(*) FILTER (NOT a) AS b_c
                FROM arms GROUP BY 1, 2
            ),
            cum AS (
                SELECT key,
                       sum(a_c) OVER (PARTITION BY key ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                       sum(b_c) OVER (PARTITION BY key ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
                       sum(a_c) OVER (PARTITION BY key) AS n_a,
                       sum(b_c) OVER (PARTITION BY key) AS n_b
                FROM pts
            ),
            agg AS (
                SELECT key,
                       CAST(max(n_a) AS BIGINT) AS n_a,
                       CAST(max(n_b) AS BIGINT) AS n_b,
                       round(max(round(abs(ca * 1.0 / n_a - cb * 1.0 / n_b), 9)), 6) AS ks
                FROM cum GROUP BY 1
            )
            SELECT key, n_a, n_b, ks,
                   round(1.358 * sqrt((n_a + n_b) * 1.0 / (n_a * n_b)), 6) AS ks_crit,
                   CASE WHEN ks > round(1.358 * sqrt((n_a + n_b) * 1.0 / (n_a * n_b)), 6)
                        THEN 1 ELSE 0 END AS drifted
            FROM agg
        """,
        "value_psi_drift": """
            WITH arms AS (
                SELECT event_type AS key, value AS v, user_id % 2 = 0 AS r
                FROM events
                UNION ALL
                SELECT 'click_shifted' AS key,
                       CASE WHEN user_id % 2 = 0 THEN value
                            ELSE round(value * 1.75, 9) END AS v,
                       user_id % 2 = 0 AS r
                FROM events WHERE event_type = 'click'
            ),
            edges AS (
                SELECT key,
                       list_transform(
                           quantile_cont(CASE WHEN r THEN v END,
                                         [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                           e -> round(e, 9)) AS ed
                FROM arms GROUP BY 1
            ),
            binned AS (
                SELECT e.key,
                       len(list_filter(ed, x -> e.v > x)) AS bin,
                       count(*) FILTER (e.r) AS r_c,
                       count(*) FILTER (NOT e.r) AS c_c
                FROM arms e JOIN edges g USING (key)
                GROUP BY 1, 2
            ),
            grid AS (
                SELECT key, unnest(generate_series(0, 9)) AS bin FROM edges
            ),
            dense AS (
                SELECT g.key, g.bin,
                       COALESCE(b.r_c, 0) AS r_c,
                       COALESCE(b.c_c, 0) AS c_c
                FROM grid g LEFT JOIN binned b
                  ON b.key = g.key AND b.bin = g.bin
            ),
            sm AS (
                SELECT key, r_c, c_c,
                       sum(r_c) OVER (PARTITION BY key) AS n_ref,
                       sum(c_c) OVER (PARTITION BY key) AS n_cur
                FROM dense
            ),
            terms AS (
                SELECT key, n_ref, n_cur,
                       CAST(round(round(((r_c + 1) * 1.0 / (n_ref + 10)
                                         - (c_c + 1) * 1.0 / (n_cur + 10))
                                        * ln(((r_c + 1) * 1.0 / (n_ref + 10))
                                             / ((c_c + 1) * 1.0 / (n_cur + 10))), 9)
                                  * 1e9) AS BIGINT) AS u
                FROM sm
            ),
            agg AS (
                SELECT key,
                       CAST(max(n_ref) AS BIGINT) AS n_ref,
                       CAST(max(n_cur) AS BIGINT) AS n_cur,
                       round(sum(u) / 1e9, 6) AS psi
                FROM terms GROUP BY 1
            )
            SELECT key, n_ref, n_cur, psi,
                   CASE WHEN psi > 0.2 THEN 1 ELSE 0 END AS drifted
            FROM agg
        """,
        "graph_triangles": """
            WITH nsrc AS (SELECT count(DISTINCT source) AS n FROM documents),
            edges0 AS (
                SELECT DISTINCT source AS src,
                       'src' || CAST(CAST(('0x' || substr(md5('link:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                     % (SELECT n FROM nsrc) AS VARCHAR) AS dst
                FROM documents
            ),
            und AS (
                SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                FROM edges0 WHERE src <> dst
            ),
            deg AS (
                SELECT n, count(*) AS deg FROM (
                    SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und
                ) GROUP BY 1
            ),
            tri AS (
                SELECT a.u AS x, a.v AS y, b.v AS z
                FROM und a
                JOIN und b ON a.v = b.u
                JOIN und c ON c.u = a.u AND c.v = b.v
            ),
            pern AS (
                SELECT n, count(*) AS t FROM (
                    SELECT x AS n FROM tri
                    UNION ALL SELECT y AS n FROM tri
                    UNION ALL SELECT z AS n FROM tri
                ) GROUP BY 1
            )
            SELECT d.n AS node, CAST(d.deg AS BIGINT) AS deg,
                   CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
                   round(CASE WHEN d.deg >= 2
                              THEN 2.0 * COALESCE(p.t, 0) / (d.deg * (d.deg - 1))
                              ELSE 0 END, 6) AS clustering
            FROM deg d LEFT JOIN pern p ON d.n = p.n
        """,
        "embedding_sq8": """
            WITH dims AS (
                SELECT r.i,
                       min(e.embedding[r.i]::DOUBLE) AS mn,
                       max(e.embedding[r.i]::DOUBLE) AS mx
                FROM embeddings e, range(1, 65) r(i)
                GROUP BY 1
            ),
            codes AS (
                SELECT e.vec_id, d.i,
                       CASE WHEN d.mx > d.mn
                            THEN least(255, CAST(floor(round(
                                 (e.embedding[d.i]::DOUBLE - d.mn) * 255.0
                                 / (d.mx - d.mn), 9)) AS INTEGER))
                            ELSE 0 END AS code
                FROM embeddings e CROSS JOIN dims d
            )
            SELECT vec_id,
                   string_agg(CAST(code AS VARCHAR), ',' ORDER BY i) AS codes_str
            FROM codes GROUP BY vec_id
        """,
        "winnow_fingerprints": """
            WITH toks AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS l
                FROM documents
            ),
            grams AS (
                SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
                       l[r.i] || ' ' || l[r.i + 1] || ' ' || l[r.i + 2] AS gram
                FROM toks, unnest(generate_series(1, len(l) - 2)) r(i)
                WHERE len(l) >= 3
                UNION ALL
                SELECT doc_id, 0 AS pos, array_to_string(l, ' ') AS gram
                FROM toks WHERE len(l) < 3
            ),
            hashed AS (
                SELECT doc_id, pos,
                       CAST(('0x' || substr(md5('win:' || gram), 1, 8)) AS BIGINT) * 1048576
                       + (1048575 - pos) AS combined
                FROM grams
            ),
            win AS (
                SELECT doc_id, pos,
                       min(combined) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
                       count(*) OVER (PARTITION BY doc_id) AS n
                FROM hashed
            ),
            sel AS (
                SELECT DISTINCT doc_id,
                       CAST(sel // 1048576 AS BIGINT) AS gram_hash,
                       CAST(1048575 - (sel % 1048576) AS BIGINT) AS sel_pos
                FROM win WHERE pos <= n - 4 OR (n < 4 AND pos = 0)
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
                   md5(string_agg(sel_pos || ':' || gram_hash, ';'
                                  ORDER BY sel_pos, gram_hash)) AS fp_digest
            FROM sel GROUP BY doc_id
        """,
        "coreset_k_center": _k_center_oracle(5),
        "quality_logit": f"""
            WITH f AS (
                SELECT doc_id,
                       round(len(list_intersect(
                                 list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
                                 [{_EN_STOPS}]))
                             / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))), 1),
                             6) AS stopword_ratio,
                       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                             / greatest(length(text), 1), 6) AS punct_ratio,
                       round(length(regexp_replace(text, '\\s', '', 'g'))
                             / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mean_word_length,
                       round(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                             t -> regexp_matches(t, '[A-Za-z]')))
                             / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS alpha_word_ratio,
                       round(ln(1.0 + len(string_split_regex(trim(text), '\\s+'))), 6) AS log_tokens
                FROM documents
            ),
            z AS (
                SELECT *, round(-3.15 + 4.0 * stopword_ratio + (-3.0) * punct_ratio
                                + 0.2 * mean_word_length + 1.5 * alpha_word_ratio
                                + 0.15 * log_tokens, 9) AS zz
                FROM f
            )
            SELECT doc_id, stopword_ratio, punct_ratio, mean_word_length,
                   alpha_word_ratio, log_tokens,
                   round(1.0 / (1.0 + exp(-zz)), 6) AS score,
                   CASE WHEN round(1.0 / (1.0 + exp(-zz)), 6) >= 0.5
                        THEN 1 ELSE 0 END AS keep
            FROM z
        """,
        "winnow_pairs": """
            WITH toks AS (
                SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS l
                FROM documents
            ),
            grams AS (
                SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
                       l[r.i] || ' ' || l[r.i + 1] || ' ' || l[r.i + 2] AS gram
                FROM toks, unnest(generate_series(1, len(l) - 2)) r(i)
                WHERE len(l) >= 3
                UNION ALL
                SELECT doc_id, 0 AS pos, array_to_string(l, ' ') AS gram
                FROM toks WHERE len(l) < 3
            ),
            hashed AS (
                SELECT doc_id, pos,
                       CAST(('0x' || substr(md5('win:' || gram), 1, 8)) AS BIGINT) * 1048576
                       + (1048575 - pos) AS combined
                FROM grams
            ),
            win AS (
                SELECT doc_id, pos,
                       min(combined) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
                       count(*) OVER (PARTITION BY doc_id) AS n
                FROM hashed
            ),
            sel AS (
                SELECT DISTINCT doc_id, CAST(sel // 1048576 AS BIGINT) AS gram_hash
                FROM win WHERE pos <= n - 4 OR (n < 4 AND pos = 0)
            ),
            rare AS (
                SELECT gram_hash FROM sel GROUP BY 1 HAVING count(*) <= 50
            ),
            kept AS (SELECT s.doc_id, s.gram_hash FROM sel s JOIN rare USING (gram_hash))
            SELECT a.doc_id AS a, b.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
            FROM kept a JOIN kept b USING (gram_hash)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "feature_hash_vectors": _FH_CTES + """
            SELECT d.doc_id, CAST(d.i AS INTEGER) AS i,
                   CASE WHEN n.nn > 0 THEN round(d.v / n.nn, 6) ELSE d.v END AS v
            FROM dense d JOIN nrm n USING (doc_id)
        """,
        "doc_sim_topk": _FH_CTES + """,
            unitv AS (
                SELECT d.doc_id,
                       list(CASE WHEN n.nn > 0 THEN round(d.v / n.nn, 6) ELSE d.v END
                            ORDER BY d.i) AS uv
                FROM dense d JOIN nrm n USING (doc_id) GROUP BY d.doc_id
            ),
            q AS (SELECT uv AS qv FROM unitv WHERE doc_id = 0)
            SELECT u.doc_id,
                   round(list_cosine_similarity(u.uv, q.qv), 4) AS cosine
            FROM unitv u, q WHERE u.doc_id <> 0
            ORDER BY cosine DESC, u.doc_id LIMIT 10
        """,
        "interleaved_media_spans": """
            SELECT doc_id, 0 AS ord, 'heading' AS kind,
                   '# Document ' || doc_id AS text,
                   CAST(NULL AS VARCHAR) AS media_ref
            FROM documents
            UNION ALL
            SELECT doc_id, 1 AS ord, 'image' AS kind,
                   '![hero ' || doc_id || '](https://img.test/' || doc_id || '/hero.png)' AS text,
                   'https://img.test/' || doc_id || '/hero.png' AS media_ref
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS ord,
                   'text' AS kind, text,
                   CAST(NULL AS VARCHAR) AS media_ref
            FROM documents
            UNION ALL
            SELECT doc_id, 2 AS ord, 'image' AS kind,
                   '![tail ' || doc_id || '](https://img.test/' || doc_id || '/tail.png)' AS text,
                   'https://img.test/' || doc_id || '/tail.png' AS media_ref
            FROM documents WHERE doc_id % 3 = 1
        """,
        "rendezvous_shards": """
            WITH keys AS (SELECT DISTINCT doc_id AS key FROM documents),
            w AS (
                SELECT k.key, s.i AS shard, n.n,
                       CAST(('0x' || substr(md5('hrw:' || s.i || ':' || CAST(k.key AS VARCHAR)), 1, 8)) AS BIGINT) AS wt
                FROM keys k,
                     unnest(generate_series(0, 8)) s(i),
                     (VALUES (8), (9)) n(n)
                WHERE s.i < n.n
            ),
            best AS (
                SELECT key, n, shard,
                       row_number() OVER (PARTITION BY key, n
                                          ORDER BY wt DESC, shard) AS rn
                FROM w
            )
            SELECT a.key, CAST(a.shard AS INTEGER) AS shard_a,
                   CAST(b.shard AS INTEGER) AS shard_b,
                   CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END AS moved
            FROM (SELECT key, shard FROM best WHERE n = 8 AND rn = 1) a
            JOIN (SELECT key, shard FROM best WHERE n = 9 AND rn = 1) b USING (key)
        """,
        "cms_join_size": """
            WITH dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
            va AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events WHERE event_type = 'view'),
            pb AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events WHERE event_type = 'purchase'),
            ca AS (
                SELECT d,
                       CAST(('0x' || substr(md5(d::VARCHAR || '|' || key), 1, 8)) AS BIGINT) % 64 AS w,
                       count(*) AS cnt
                FROM va, dd GROUP BY 1, 2
            ),
            cb AS (
                SELECT d,
                       CAST(('0x' || substr(md5(d::VARCHAR || '|' || key), 1, 8)) AS BIGINT) % 64 AS w,
                       count(*) AS cnt
                FROM pb, dd GROUP BY 1, 2
            ),
            ip AS (
                SELECT ca.d, sum(ca.cnt * cb.cnt) AS ip
                FROM ca JOIN cb ON ca.d = cb.d AND ca.w = cb.w
                GROUP BY 1
            ),
            est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_size FROM ip),
            tr AS (
                SELECT CAST(sum(a.na * b.nb) AS BIGINT) AS true_join_size
                FROM (SELECT key, count(*) AS na FROM va GROUP BY 1) a
                JOIN (SELECT key, count(*) AS nb FROM pb GROUP BY 1) b USING (key)
            )
            SELECT true_join_size, est_join_size,
                   est_join_size - true_join_size AS overcount
            FROM tr, est
        """,
        "kmv_distinct": """
            WITH u AS (
                SELECT DISTINCT event_type AS grp,
                       round((CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                             / 4294967296.0, 9) AS u
                FROM events
            ),
            rk AS (
                SELECT grp, u,
                       row_number() OVER (PARTITION BY grp ORDER BY u) AS pos
                FROM u
            ),
            sk AS (
                SELECT grp, CAST(max(pos) AS INTEGER) AS n_sketch,
                       max(CASE WHEN pos = 32 THEN u END) AS uk
                FROM rk WHERE pos <= 32 GROUP BY grp
            ),
            tr AS (
                SELECT event_type AS grp,
                       CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
                FROM events GROUP BY 1
            )
            SELECT t.grp AS event_type, t.true_distinct, s.n_sketch,
                   CASE WHEN s.n_sketch < 32 THEN s.n_sketch::DOUBLE
                        ELSE round(31 / s.uk, 6) END AS est_distinct,
                   round(CASE WHEN s.n_sketch < 32 THEN s.n_sketch::DOUBLE
                              ELSE round(31 / s.uk, 6) END
                         / t.true_distinct - 1.0, 6) AS rel_err
            FROM tr t JOIN sk s USING (grp)
        """,
        "span_kinds_full": """
            SELECT doc_id, 0 AS ord, 'heading' AS kind,
                   '# Document ' || doc_id AS text FROM documents
            UNION ALL
            SELECT doc_id, 1 AS ord, 'text' AS kind, text FROM documents
            UNION ALL
            SELECT doc_id, 2 AS ord, 'list_item' AS kind,
                   '- item ' || doc_id || ' a' AS text FROM documents
            UNION ALL
            SELECT doc_id, 3 AS ord, 'list_item' AS kind,
                   '- item ' || doc_id || ' b' AS text FROM documents
            UNION ALL
            SELECT doc_id, 4 AS ord, 'code' AS kind,
                   '```' || chr(10) || 'call(' || doc_id || ')' || chr(10) || '```' AS text
            FROM documents
            UNION ALL
            SELECT doc_id, 5 AS ord, 'table' AS kind,
                   '| k | v |' || chr(10) || '| --- | --- |' || chr(10)
                   || '| ' || doc_id || ' | ' || source || ' |' AS text
            FROM documents
            UNION ALL
            SELECT doc_id, 6 AS ord, 'text' AS kind,
                   'See [spec ' || doc_id || '](https://ref.test/' || doc_id || ') end.' AS text
            FROM documents
        """,
        "mojibake_repair": """
            WITH forms AS (
                SELECT chr(226) || chr(8364) || chr(8482) AS m_apos,
                       chr(226) || chr(8364) || chr(339)  AS m_ldq,
                       chr(226) || chr(8364) || chr(157)  AS m_rdq,
                       chr(226) || chr(8364) || chr(8212) AS m_mdash,
                       chr(195) || chr(169) AS m_eacute,
                       chr(195) || chr(168) AS m_egrave,
                       chr(8217) AS g_apos, chr(8220) AS g_ldq,
                       chr(8221) AS g_rdq, chr(8212) AS g_mdash,
                       chr(233) AS g_eacute, chr(232) AS g_egrave
            ),
            planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN text || ' it' || f.m_apos || 's ' || f.m_ldq
                                 || 'quoted' || f.m_rdq || ' caf' || f.m_eacute
                            ELSE text END AS p,
                       CASE WHEN doc_id % 5 = 0
                            THEN text || ' it' || f.g_apos || 's ' || f.g_ldq
                                 || 'quoted' || f.g_rdq || ' caf' || f.g_eacute
                            ELSE text END AS clean
                FROM documents, forms f
            ),
            fixed AS (
                SELECT doc_id, p, clean,
                       replace(replace(replace(replace(replace(replace(p,
                           f.m_apos, f.g_apos), f.m_ldq, f.g_ldq),
                           f.m_rdq, f.g_rdq), f.m_mdash, f.g_mdash),
                           f.m_eacute, f.g_eacute), f.m_egrave, f.g_egrave) AS fx
                FROM planted, forms f
            ),
            counted AS (
                SELECT doc_id,
                       CAST((length(p) - length(replace(p, f.m_apos, ''))) // 3
                          + (length(p) - length(replace(p, f.m_ldq, ''))) // 3
                          + (length(p) - length(replace(p, f.m_rdq, ''))) // 3
                          + (length(p) - length(replace(p, f.m_mdash, ''))) // 3
                          + (length(p) - length(replace(p, f.m_eacute, ''))) // 2
                          + (length(p) - length(replace(p, f.m_egrave, ''))) // 2 AS BIGINT) AS n_mojibake,
                       CAST((length(fx) - length(replace(fx, f.m_apos, ''))) // 3
                          + (length(fx) - length(replace(fx, f.m_ldq, ''))) // 3
                          + (length(fx) - length(replace(fx, f.m_rdq, ''))) // 3
                          + (length(fx) - length(replace(fx, f.m_mdash, ''))) // 3
                          + (length(fx) - length(replace(fx, f.m_eacute, ''))) // 2
                          + (length(fx) - length(replace(fx, f.m_egrave, ''))) // 2 AS BIGINT) AS n_residual,
                       CASE WHEN md5(fx) = md5(clean) THEN 1 ELSE 0 END AS repaired_ok
                FROM fixed, forms f
            )
            SELECT doc_id, n_mojibake, n_residual, repaired_ok FROM counted
        """,
        "hard_negatives": """
            WITH anch AS (
                SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av,
                       label AS anchor_label
                FROM embeddings WHERE vec_id < 20
            ),
            scored AS (
                SELECT a.anchor_id, a.anchor_label,
                       p.vec_id AS neg_id, p.label AS neg_label,
                       round(list_cosine_similarity(a.av, p.embedding::DOUBLE[]), 4) AS cosine
                FROM anch a JOIN embeddings p ON a.anchor_label <> p.label
            ),
            ranked AS (
                SELECT *, CAST(row_number() OVER (
                           PARTITION BY anchor_id
                           ORDER BY cosine DESC, neg_id) AS INTEGER) AS rank
                FROM scored
            )
            SELECT anchor_id, anchor_label, neg_id, neg_label, cosine, rank
            FROM ranked WHERE rank <= 3
        """,
        "kmv_jaccard": """
            WITH us AS (SELECT DISTINCT event_type AS g, user_id FROM events),
            hd AS (
                SELECT DISTINCT g,
                       round((CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                             / 4294967296.0, 9) AS u
                FROM us
            ),
            rk AS (SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS pos FROM hd),
            sk AS (SELECT g, u FROM rk WHERE pos <= 64),
            prs AS (
                SELECT a.g AS ga, b.g AS gb
                FROM (SELECT DISTINCT g FROM sk) a
                JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g
            ),
            un AS (
                SELECT p.ga, p.gb, s.u FROM prs p JOIN sk s ON s.g = p.ga
                UNION
                SELECT p.ga, p.gb, s.u FROM prs p JOIN sk s ON s.g = p.gb
            ),
            urk AS (
                SELECT ga, gb, u,
                       row_number() OVER (PARTITION BY ga, gb ORDER BY u) AS pos
                FROM un
            ),
            topu AS (SELECT ga, gb, u FROM urk WHERE pos <= 64),
            mem AS (
                SELECT t.ga, t.gb,
                       CASE WHEN sa.u IS NOT NULL THEN 1 ELSE 0 END AS in_a,
                       CASE WHEN sb.u IS NOT NULL THEN 1 ELSE 0 END AS in_b
                FROM topu t
                LEFT JOIN sk sa ON sa.g = t.ga AND sa.u = t.u
                LEFT JOIN sk sb ON sb.g = t.gb AND sb.u = t.u
            ),
            est AS (
                SELECT ga AS group_a, gb AS group_b,
                       CAST(count(*) AS BIGINT) AS union_k,
                       round(sum(in_a * in_b) * 1.0 / count(*), 6) AS jaccard_est
                FROM mem GROUP BY 1, 2
            ),
            sizes AS (SELECT g, count(*) AS c FROM us GROUP BY 1),
            tr AS (
                SELECT x.ga AS group_a, x.gb AS group_b,
                       round(x.inter * 1.0 / (ca.c + cb.c - x.inter), 6) AS true_jaccard
                FROM (
                    SELECT a.g AS ga, b.g AS gb, count(*) AS inter
                    FROM us a JOIN us b ON a.user_id = b.user_id AND a.g < b.g
                    GROUP BY 1, 2
                ) x
                JOIN sizes ca ON ca.g = x.ga
                JOIN sizes cb ON cb.g = x.gb
            )
            SELECT e.group_a, e.group_b, e.union_k, e.jaccard_est,
                   t.true_jaccard,
                   round(e.jaccard_est - t.true_jaccard, 6) AS err
            FROM est e JOIN tr t USING (group_a, group_b)
        """,
    }

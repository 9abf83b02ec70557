"""Benchmark decontamination: flag corpus documents that share an n-gram
with any item in an evaluation/benchmark set (the GPT-3 appendix-C /
"training-set contamination" procedure: normalize, window into n-grams,
report any document containing a benchmark n-gram).

Shuffle shape at 100 TB: the corpus side explodes to one row per DISTINCT
n-gram hash per document (bounded by token count), but the benchmark side
is tiny — every public eval suite together is megabytes — so the join is a
BROADCAST hash join: corpus rows never shuffle, the only wide operation is
the final per-document groupBy on doc id (map-side combined counts).
Production hashes shingles to 64-bit xxhash64 so the exploded rows carry
8 bytes instead of the n-gram text; the `hashed=False` twin joins on the
raw shingle string and is the SQL-expressible oracle form (identical
result set — xxhash64 collisions at corpus scale are possible in theory,
which is why contaminated docs are flagged for review/removal, not
silently rewritten).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reader_spark.spark.fanout import fanout_scan

from reader_spark.ops.dedup import shingles


def normalize_for_ngrams(text: Column) -> Column:
    """Contamination-matching normalization: lowercase, collapse every
    non-alphanumeric run to a single space, trim. After the collapse the
    only whitespace is single ASCII spaces, so Spark/DuckDB `trim` (which
    strips spaces only, not \\n/\\t) is safe on both sides of the oracle."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "bench_text",
    n: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """One row per contaminated document: (doc_id, n_hit_ngrams,
    n_bench_items) — the number of distinct benchmark n-grams the document
    contains and how many distinct benchmark items it collides with.

    Benchmark items shorter than n tokens contribute their full token
    sequence as a single "n-gram" (the shingles() short-text fallback), so
    they still participate rather than silently matching nothing.
    """
    def grams(frame: DataFrame, id_: str, text: Column) -> DataFrame:
        g = F.explode(shingles(normalize_for_ngrams(text), n=n)).alias("gram")
        out = frame.select(F.col(id_), g).where(F.col("gram") != "")
        if hashed:
            out = out.select(id_, F.xxhash64("gram").alias("gram"))
        return out

    doc_grams = grams(fanout_scan(docs), doc_id, F.col(doc_text))
    bench_grams = grams(benchmark, bench_id, F.col(bench_text)).dropDuplicates()

    return (
        doc_grams.join(F.broadcast(bench_grams), on="gram", how="inner")
        .groupBy(doc_id)
        .agg(
            F.countDistinct("gram").alias("n_hit_ngrams"),
            F.countDistinct(bench_id).alias("n_bench_items"),
        )
    )


def contamination_flags_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "bench_text",
    n: int = 8,
    hashed: bool = True,
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Two-phase decontamination with a Bloom prefilter — IDENTICAL output
    to :func:`contamination_flags` (a Bloom filter has no false
    negatives, so the prefilter is lossless and the shared oracle is the
    proof, same discipline as simhash_banded_md5):

    1. The benchmark's distinct n-grams build a Bloom bitset (<= m set
       bits, reader_spark.ops.bloom positions). The set-bit list rides as
       ONE broadcast row; each corpus gram checks all k positions with
       array_contains — scan-bound, no explode, no join per gram.
    2. Only MAYBE-contaminated docs (any gram passing the filter — the
       true hits plus the Bloom's ~(fill)^k false-positive sliver) enter
       the exact gram equi-join.

    Why it exists beside the broadcast-join form: exact benchmark gram
    sets can be 100M+ hashes (800 MB broadcast — undeliverable), while
    the same set as Bloom bits is tens of MB; phase 2 then touches only
    the flagged sliver of the corpus. At fixture scale both forms run in
    the same time; the op is the SHAPE for the big-benchmark regime.
    """
    from reader_spark.ops.bloom import _positions, bloom_build

    def grams(frame: DataFrame, id_: str, text: Column) -> DataFrame:
        g = F.explode(shingles(normalize_for_ngrams(text), n=n)).alias("gram")
        out = frame.select(F.col(id_), g).where(F.col("gram") != "")
        if hashed:
            out = out.select(id_, F.xxhash64("gram").alias("gram"))
        return out

    bench_grams = grams(benchmark, bench_id, F.col(bench_text)).dropDuplicates()
    bits = bloom_build(
        bench_grams, "gram", k=k, m=m, portable=not hashed
    ).agg(F.collect_set("bit").alias("__bits"))

    doc_grams = grams(fanout_scan(docs), doc_id, F.col(doc_text))
    pos = _positions(F.col("gram"), k, m, portable=not hashed)
    member = F.lit(True)
    for p in pos:
        member = member & F.array_contains(F.col("__bits"), p)
    maybe_ids = (
        doc_grams.crossJoin(F.broadcast(bits))
        .where(member)
        .select(doc_id)
        .distinct()
    )
    flagged_docs = docs.join(maybe_ids, doc_id, "left_semi")
    return contamination_flags(
        flagged_docs,
        benchmark,
        doc_id=doc_id,
        doc_text=doc_text,
        bench_id=bench_id,
        bench_text=bench_text,
        n=n,
        hashed=hashed,
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    weights: list,
    tau_round4: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Embedding-similarity decontamination — the semantic complement
    of the n-gram overlap scan (the GPT-4 technical report's
    contamination check pairs n-gram matching with similarity; Yang et
    al. 2023 "Rethinking Benchmark and Contamination" shows paraphrased
    leaks evade exact n-grams entirely).  A training doc is flagged when
    its embedding is within ``tau_round4`` cosine of ANY eval item.

    Scale shape: both sides sketch with the SAME literal hyperplane
    family (ops/ann.md5_plane_weights — portable, or seeded xxhash64 in
    production); the eval side is small by contract (10^3-10^5 items)
    and BROADCASTS, so the 10^12-doc corpus flows through one scan +
    one bucket-filtered broadcast join — no shuffle of the corpus.
    Recall < 1 by construction (bucket-mates only), the documented
    LSH trade measured by the brute twin in tests.  Cosines compare at
    round-4 (the embedding_dedup_lsh_md5 house discipline — exact
    cross-engine doubles).

    Returns ``(vec_id, n_eval_hits, max_cosine)`` per flagged doc.
    """
    from reader_spark.ops.ann import cosine_col, hyperplane_sketch_literal

    fv = F.col(vec_col).cast("array<double>")
    cb = corpus_emb.select(
        F.col(id_col).alias("vec_id"),
        fv.alias("cv"),
        hyperplane_sketch_literal(fv, weights).alias("bucket"),
    )
    eb = eval_emb.select(
        F.col(eval_id_col).alias("eval_id"),
        fv.alias("ev"),
        hyperplane_sketch_literal(fv, weights).alias("bucket"),
    )
    pairs = cb.join(F.broadcast(eb), "bucket").select(
        "vec_id",
        "eval_id",
        F.round(cosine_col(F.col("cv"), F.col("ev")), 4).alias("cos"),
    )
    return (
        pairs.where(F.col("cos") >= tau_round4)
        .groupBy("vec_id")
        .agg(
            F.countDistinct("eval_id").cast("long").alias("n_eval_hits"),
            F.max("cos").alias("max_cosine"),
        )
    )

"""Training-data corpus preparation: the composite pipeline a 100 TB
pretraining-data run would execute on top of the extraction engine.

    docs (interleaved raw)                                 [scan]
      -> extract_dataframe            fused UDF            [no shuffle]
      -> quality gate                 native predicates    [no shuffle]
      -> exact dedup                  hash-groupBy         [narrow shuffles]
      -> near-dup clustering          MinHash-LSH + CC     [narrow shuffles]
      -> keeper selection             ONE wide anti-join   [full rows move once]
      -> clean corpus out             (doc_id, markdown, spans, stats)

All dedup decisions are computed on narrow (id, hash/signature/label)
projections; the full-width rows (spans + markdown + stats) cross exactly
one exchange — the final keeper anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..fixtures import BASE_URL_PREFIX
from ..ops.dedup import (
    connected_components,
    minhash_lsh_star_edges,
    minhash_lsh_star_edges_portable,
    minhash_signatures,
)
from ..ops.textstats import punct_ratio_col, token_count_col
from .job import extract_dataframe


@dataclass(frozen=True)
class CorpusPrepConfig:
    min_tokens: int = 20
    max_punct_ratio: float = 0.3
    shingle_n: int = 3
    minhash_hashes: int = 64
    lsh_bands: int = 16
    lsh_rows_per_band: int = 4
    # md5 hash family for the near-dup sketch: slower, but value-for-value
    # reproducible in ANSI SQL -- used by the oracle-checked driver query.
    portable_hashes: bool = False


def prepare_corpus(
    docs: DataFrame,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    prep: CorpusPrepConfig = CorpusPrepConfig(),
    base_url_prefix: str = BASE_URL_PREFIX,
) -> DataFrame:
    """Returns the deduplicated, quality-gated clean corpus:
    (doc_id, markdown, spans, token_count, punct_ratio)."""
    extracted = extract_dataframe(docs, cfg, base_url_prefix)
    ok = extracted.where(F.col("error_kind").isNull() & (F.length("markdown") > 0))

    gated = (
        ok.withColumn("token_count", token_count_col(F.col("markdown")))
        .withColumn("punct_ratio", F.round(punct_ratio_col(F.col("markdown")), 6))
        .where(
            (F.col("token_count") >= prep.min_tokens)
            & (F.col("punct_ratio") <= prep.max_punct_ratio)
        )
        .select("doc_id", "markdown", "spans", "token_count", "punct_ratio")
    )

    # Loser-id computation runs entirely on NARROW projections so the
    # full-width rows (spans + markdown + stats) cross exactly ONE exchange
    # (the final anti-join). Joining the wide frame per dedup stage instead
    # would re-shuffle every payload byte once per stage — at 10^12 docs
    # that is tens of TB of avoidable network.

    # Exact dedup: (doc_id, content_hash) only — 16 B/row shuffle.
    hashed = gated.select("doc_id", F.xxhash64("markdown").alias("content_hash"))
    exact_keepers = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keeper_id")
    )
    exact_losers = (
        hashed.join(exact_keepers, "content_hash")
        .where(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id")
    )

    # Near-dup clustering among exact-unique docs: MinHash signatures ->
    # LSH STAR edges -> connected components -> each cluster keeps min
    # doc_id. Star edges (member -> bucket hub) give components identical
    # to the all-pairs candidate form but stay LINEAR in bucket size — on a
    # boilerplate-heavy corpus where one template fills a bucket with
    # millions of docs, the pair form is quadratic and never finishes.
    # Sketch input carries markdown only (the one payload column the
    # sketch needs), not the full row.
    text_for_sketch = (
        gated.select("doc_id", "markdown").join(exact_losers, "doc_id", "left_anti")
    )
    if prep.portable_hashes:
        edges = minhash_lsh_star_edges_portable(
            text_for_sketch,
            "doc_id",
            "markdown",
            n=prep.shingle_n,
            num_hashes=prep.minhash_hashes,
            bands=prep.lsh_bands,
            rows_per_band=prep.lsh_rows_per_band,
        )
    else:
        signatures = minhash_signatures(
            text_for_sketch,
            "doc_id",
            "markdown",
            n=prep.shingle_n,
            num_hashes=prep.minhash_hashes,
        )
        edges = minhash_lsh_star_edges(
            signatures, bands=prep.lsh_bands, rows_per_band=prep.lsh_rows_per_band
        )
    components = connected_components(edges)
    near_dup_losers = components.where(F.col("doc") != F.col("component")).select(
        F.col("doc").alias("doc_id")
    )
    losers = exact_losers.unionByName(near_dup_losers).distinct()
    return gated.join(losers, "doc_id", "left_anti")

"""Web-graph trust queries: TrustRank propagation and relative spam
mass over the deterministic domain link graph (same md5-mod edge
construction the certified ``pagerank_domains`` row uses). Oracles live
in reader_spark/oracles.py under the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TR_ITERATIONS, TR_DAMPING, TR_SEEDS = 5, 0.85, 4


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _domain_edges(docs: DataFrame) -> DataFrame:
    """The pagerank_domains link graph: each document links its source
    domain to the domain picked by md5('link:'||doc_id) mod |domains|,
    weighted by link count (no collect — the modulus joins as a 1-row
    broadcast dim)."""
    nsrc = docs.agg(F.countDistinct("source").alias("nsrc"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("link:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.crossJoin(F.broadcast(nsrc))
        .select(
            F.col("source").alias("src"),
            F.concat(
                F.lit("src"), F.pmod(h, F.col("nsrc")).cast("string")
            ).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def _seeds(docs: DataFrame) -> DataFrame:
    # trusted seed dim: the TR_SEEDS lexicographically-smallest domains
    # (deterministic; TakeOrdered over the bounded domain dim)
    return (
        docs.select(F.col("source").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(TR_SEEDS)
    )


def _q_trustrank_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (ops.graph.trustrank, Gyongyi et al. VLDB 2004) over
    the deterministic domain link graph: teleport biased to the 4
    lexicographically-smallest domains, dangling mass redistributed
    along the seed vector, 5 iterations at damping 0.85 with the same
    per-iteration join + map-side-combined aggregate shape (and 9 dp
    lockstep rounding) as the certified pagerank_domains row."""
    from reader_spark.ops.graph import trustrank

    docs = _read(spark, sf_dir, "documents")
    out = trustrank(
        _domain_edges(docs),
        _seeds(docs),
        weight_col="w",
        iterations=TR_ITERATIONS,
        damping=TR_DAMPING,
    )
    return out.select(
        F.col("node").alias("domain"), F.round("tr", 6).alias("tr")
    )


def _q_spam_mass_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative spam mass (ops.graph.spam_mass, Gyongyi et al. 2006):
    rel_mass = (pr - tr)/pr over the same graph/iterations/damping —
    the fraction of each domain's PageRank not explained by trusted
    flow; rel_mass > 0.5 flags spam candidates. Division evaluated on
    the 6 dp display values so both engines agree bit-for-bit."""
    from reader_spark.ops.graph import spam_mass

    docs = _read(spark, sf_dir, "documents")
    out = spam_mass(
        _domain_edges(docs),
        _seeds(docs),
        weight_col="w",
        iterations=TR_ITERATIONS,
        damping=TR_DAMPING,
        threshold=0.5,
    )
    return out.select(
        F.col("node").alias("domain"),
        "pr",
        "tr",
        "rel_mass",
        "spam_candidate",
    )


def _q_salsa_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form SALSA authority weights (ops.graph.salsa_authorities,
    Lempel & Moran 2000): co-citation components via hub-star edges +
    the certified pointer-jumping CC, then the degree-proportional
    stationary split in exact integer micro-units — the TKC-immune
    sibling of the certified HITS row, over the same deterministic
    domain link graph."""
    from reader_spark.ops.graph import salsa_authorities

    docs = _read(spark, sf_dir, "documents")
    return salsa_authorities(
        _domain_edges(docs).select("src", "dst")
    )


LPA_ITERATIONS, LPA_GROUPS, LPA_BRIDGE_EVERY = 4, 8, 97


def _lpa_edges(docs: DataFrame) -> DataFrame:
    """Planted-partition doc graph for the community queries: each doc
    node stars to its residue-class anchor d(doc_id mod 8), and every
    97th doc bridges to the NEXT class's anchor — sparse cross-links a
    density-blind connected-components pass would merge but a vote-based
    community pass must not. Self-loop star rows (the anchors
    themselves) are dropped inside the op."""
    d = F.col("doc_id").cast("long")
    node = F.concat(F.lit("d"), d.cast("string"))
    stars = docs.select(
        node.alias("src"),
        F.concat(
            F.lit("d"), F.pmod(d, F.lit(LPA_GROUPS)).cast("string")
        ).alias("dst"),
    )
    bridges = docs.where(d % LPA_BRIDGE_EVERY == 0).select(
        node.alias("src"),
        F.concat(
            F.lit("d"), F.pmod(d + 1, F.lit(LPA_GROUPS)).cast("string")
        ).alias("dst"),
    )
    return stars.union(bridges)


def _q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (ops.graph.
    label_propagation, Raghavan et al. 2007) over the planted-partition
    doc graph: 4 rounds of self-vote + neighbour-vote with the
    (count desc, label asc) election — per-node community assignments.
    Every shuffle node-keyed; lineage localCheckpoint-truncated per
    round."""
    from reader_spark.ops.graph import label_propagation

    docs = _read(spark, sf_dir, "documents")
    return label_propagation(_lpa_edges(docs), iterations=LPA_ITERATIONS)


def _q_lpa_community_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-size rollup of the same LPA assignment — the
    mirror-farm / link-ring size profile (one map-side-combined
    groupBy over the per-node table)."""
    from reader_spark.ops.graph import label_propagation

    docs = _read(spark, sf_dir, "documents")
    out = label_propagation(_lpa_edges(docs), iterations=LPA_ITERATIONS)
    return out.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").alias("min_node"),
    )


QUERIES = {
    "trustrank_domains": _q_trustrank_domains,
    "spam_mass_domains": _q_spam_mass_domains,
    "salsa_authorities": _q_salsa_authorities,
    "lpa_communities": _q_lpa_communities,
    "lpa_community_sizes": _q_lpa_community_sizes,
}

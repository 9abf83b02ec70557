"""Host-layer queries: public-suffix-list registrable-domain (eTLD+1)
extraction and the PLD rollup — the host-grouping layer under every
per-domain statistic. Oracles live in reader_spark/oracles.py under
the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _hosts(docs: DataFrame) -> DataFrame:
    """Deterministic host fixture covering every PSL rule form:
    multi-label suffix (co.uk), plain gTLD, wildcard (*.ck), private
    section (github.io), the exception pair (www.ck / sub.www.ck), an
    unknown TLD (default rule), and a bare public suffix (no
    registrable domain)."""
    d = F.col("doc_id").cast("long")
    e = (d % 40).cast("string")
    host = (
        F.when(
            d % 6 == 0,
            F.when(d % 100 == 42, F.lit("co.uk")).otherwise(
                F.concat(F.lit("www.ex"), e, F.lit(".co.uk"))
            ),
        )
        .when(d % 6 == 1, F.concat(F.lit("blog.ex"), e, F.lit(".com")))
        .when(d % 6 == 2, F.concat(F.lit("a.b.ex"), e, F.lit(".ck")))
        .when(
            d % 6 == 3,
            F.concat(F.lit("user"), d.cast("string"), F.lit(".github.io")),
        )
        .when(
            d % 6 == 4,
            F.when(d % 4 == 0, F.lit("www.ck")).otherwise(
                F.lit("sub.www.ck")
            ),
        )
        .otherwise(F.concat(F.lit("ex"), e, F.lit(".unknowntld")))
    )
    return docs.select(d.alias("doc_id"), host.alias("host"))


def _q_registrable_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL public-suffix + registrable-domain per host (ops.psl.
    registrable_domain, publicsuffix.org algorithm): bounded trailing-
    suffix explode, broadcast rule-dim joins for the exact/wildcard/
    exception forms, packed-long election (exception beats all, then
    longest match), default rule '*' for unmatched TLDs. A bare public
    suffix resolves to NULL registrable domain; the !www.ck exception
    host is its own."""
    from reader_spark.ops.psl import registrable_domain

    docs = _read(spark, sf_dir, "documents")
    return registrable_domain(_hosts(docs))


def _q_pld_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs-per-PLD rollup over the same assignment (one map-side-
    combined groupBy) — the host-aggregation every crawl-budget /
    politeness / quality-prior table should key on instead of raw
    hosts. NULL registrable domains (bare public suffixes) group
    together deliberately: they are the rows a raw-host rollup would
    silently mis-key."""
    from reader_spark.ops.psl import registrable_domain

    docs = _read(spark, sf_dir, "documents")
    out = registrable_domain(_hosts(docs))
    return out.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )




def _q_robots_meta_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level robots directive gate (ops.robotstxt.robots_meta_gate)
    over planted <meta name=robots> strings covering the full REP
    vocabulary (case noise, `none` expansion, `all` no-op, unknown
    tokens, absent tag): the index/follow/archive flags a corpus build
    and a frontier expansion must honor. Pure row expression — no
    shuffle."""
    from reader_spark.ops.robotstxt import robots_meta_gate

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    robots = (
        F.when(d % 7 == 0, F.lit("index, follow"))
        .when(d % 7 == 1, F.lit("noindex"))
        .when(d % 7 == 2, F.lit("NOINDEX, NOFOLLOW"))
        .when(d % 7 == 3, F.lit("none"))
        .when(d % 7 == 4, F.lit("all"))
        .when(d % 7 == 5, F.lit(None).cast("string"))
        .otherwise(F.lit("noarchive, nofollow, max-snippet:-1"))
    )
    base = docs.select(d.alias("doc_id"), robots.alias("robots"))
    return robots_meta_gate(base)


def _q_canonical_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical chain resolution (ops.canonical.
    resolve_canonical_chains): pointer doubling over the planted
    canonical graph — roots, 1/2/3-hop chains and misconfigured
    2-cycles; chains resolve to their terminal with the hop count,
    cycles surface flagged with NULL canonical. Four doubling rounds
    cover depth 16; every join is key-bounded."""
    from reader_spark.ops.canonical import resolve_canonical_chains

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    u = F.concat(F.lit("u"), d.cast("string"))
    canon = (
        F.when(d % 5 == 0, F.lit(None).cast("string"))
        .when(
            (d % 5).isin(1, 2, 3),
            F.concat(F.lit("u"), (d - 1).cast("string")),
        )
        .when(d % 10 == 4, F.concat(F.lit("u"), (d + 5).cast("string")))
        .otherwise(F.concat(F.lit("u"), (d - 5).cast("string")))
    )
    pages = docs.select(u.alias("url"), canon.alias("canonical"))
    return resolve_canonical_chains(pages, rounds=4)




_HL_LANGS = ("en", "de", "fr")


def _hreflang_decls(docs: DataFrame) -> DataFrame:
    """Planted hreflang declaration rows: docs group into language
    trios (en/de/fr, url p{doc_id}); every member declares all three
    (self included). Misconfigurations: every 5th group's fr member
    declares only itself (its partners' annotations lose their return
    links), and in groups with g mod 7 == 3 the en member mislabels
    the fr edition as 'de' (the duplicate-language conflict)."""
    d = F.col("doc_id").cast("long")
    g = F.floor(d / 3)
    r = d % 3
    base = g * 3
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.lit(_HL_LANGS[k]).alias("lang"),
            )
            for k in range(3)
        ]
    )
    decl = docs.select(
        d.alias("did"),
        g.alias("g"),
        r.alias("r"),
        base.alias("base"),
        F.explode(rows).alias("m"),
    ).select(
        "did",
        "g",
        "r",
        F.col("m.k").alias("k"),
        F.concat(F.lit("p"), F.col("did").cast("string")).alias("url"),
        F.when(
            (F.col("g") % 7 == 3) & (F.col("r") == 0) & (F.col("m.k") == 2),
            F.lit("de"),
        )
        .otherwise(F.col("m.lang"))
        .alias("hreflang"),
        F.concat(
            F.lit("p"), (F.col("base") + F.col("m.k")).cast("string")
        ).alias("href"),
    )
    return decl.where(
        ~((F.col("g") % 5 == 0) & (F.col("r") == 2) & (F.col("k") != F.col("r")))
    ).select("url", "hreflang", "href")


def _q_hreflang_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-annotation hreflang audit (ops.hreflang.hreflang_audit,
    Google's reciprocity contract): self / reciprocal / missing_return
    classification via ONE (src,dst) self-equi-join — the standard SEO
    misconfiguration report, at corpus scale."""
    from reader_spark.ops.hreflang import hreflang_audit

    docs = _read(spark, sf_dir, "documents")
    return hreflang_audit(_hreflang_decls(docs))


def _q_hreflang_editions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-edition clusters (ops.hreflang.hreflang_editions):
    certified pointer-jumping CC over the RECIPROCAL edges only,
    min-inbound-annotation language per member, duplicate-language
    conflicts flagged — the table that keeps translations out of
    near-dup deletion and feeds bitext mining."""
    from reader_spark.ops.hreflang import hreflang_editions

    docs = _read(spark, sf_dir, "documents")
    return hreflang_editions(_hreflang_decls(docs))




def _q_lpt_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPT shard balancing (ops.lpt.lpt_shard_assignment, Graham 1969
    4/3-approx greedy) over per-source token masses: size-aware
    assignment of the bounded source dim to 4 shards — the skew-proof
    complement of the certified rendezvous_shards row (which targets
    unbounded key spaces). One groupBy for sizes, one within-row fold
    for the greedy."""
    from reader_spark.ops.lpt import lpt_shard_assignment

    docs = _read(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.trim(F.col("text")), "\\s+"),
                    lambda x: x != "",
                )
            )
        )
        .cast("long")
        .alias("size")
    )
    return lpt_shard_assignment(
        sizes, group_col="source", size_col="size", shards=4
    )


QUERIES = {
    "registrable_domains": _q_registrable_domains,
    "robots_meta_gate": _q_robots_meta_gate,
    "canonical_chains": _q_canonical_chains,
    "pld_rollup": _q_pld_rollup,
    "hreflang_audit": _q_hreflang_audit,
    "hreflang_editions": _q_hreflang_editions,
    "lpt_shards": _q_lpt_shards,
}

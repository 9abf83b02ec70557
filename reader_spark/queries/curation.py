"""Corpus-curation queries (session-3 family): clustering, fertility,
diversity, curriculum, entropy, blocklist, UniMax, CCNet buckets.
Factored out of __spark_entry__.py verbatim (VERDICT r4 #7); oracles
live in reader_spark/oracles.py under the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _q_text_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded text clustering over feature-hashed unit vectors (ops.
    vectorize.text_clusters): the corpus data-map / cluster-balanced
    sampling step — spherical k-means assignment with docs 0..7 as
    deterministic seeds. Seeds ride as k x dim literals; assignment is
    per-row over one scan of the hashed vectors."""
    from reader_spark.ops.vectorize import text_clusters

    docs = _read(spark, sf_dir, "documents")
    return text_clusters(docs, seed_ids=list(range(8)))


def _q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-budget audit (ops.textstats.
    tokenizer_fertility): chars/token, bytes/char (zh pays the UTF-8
    multibyte tax, en ~1.0), tokens/doc — the conversion table between
    byte-priced storage and token-priced training budgets. One
    map-side-combined groupBy on the language dim."""
    from reader_spark.ops.textstats import tokenizer_fertility

    return tokenizer_fertility(_read(spark, sf_dir, "documents"))


def _q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document distinct-n diversity per source (ops.textstats.
    source_diversity) — the self-BLEU-style template-collapse signal
    per-doc repetition rules can't see. One scan per n, one
    map-side-combined (source, gram) groupBy, source-keyed rollup."""
    from reader_spark.ops.textstats import source_diversity

    return source_diversity(_read(spark, sf_dir, "documents"))


def _q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering (ops.sampling.curriculum_order): short-to-long
    schedule with equi-width length buckets and a deterministic seeded
    md5 shuffle within each bucket; position = broadcast bucket offset +
    bucket-keyed rank. No global window — the only windows key on the
    8-bucket dim."""
    from reader_spark.ops.sampling import curriculum_order

    return curriculum_order(_read(spark, sf_dir, "documents"))


def _q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Shannon entropy (ops.textstats.
    token_entropy) — the repetitive-text / encoded-blob gibberish signal.
    Integer nano-unit term sums + integer 6-dp reduction keep hundreds of
    float terms engine-stable; zero-token docs survive via the spine
    left-join."""
    from reader_spark.ops.textstats import token_entropy

    return token_entropy(_read(spark, sf_dir, "documents"))


def _q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter (ops.textstats.blocklist_filter): exact
    token matches against a broadcast word dim instead of a giant
    alternation regex. Fixture list ('dup', plus an absent word proving
    zero-hit safety) flags 25 of 500 docs at sf0.01; production swaps in
    the public LDNOOBW file, same broadcast plumbing."""
    from reader_spark.ops.textstats import blocklist_filter

    docs = _read(spark, sf_dir, "documents")
    return blocklist_filter(docs, ("dup", "zzzqqqblocked"))


def _q_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language sampling (Chung et al., ICLR'23) over the corpus
    (ops.allocate.unimax_allocation): a 3.2x-corpus training budget split
    as uniformly as possible across languages with a 4-epoch cap per
    language. At sf0.01 the four smaller languages hit the epoch cap and
    en takes the uniform leftover (budget_limited=1). Closed-form
    water-filling on demand = 4*size — no iteration, window bounded by
    the language dim; the 1-row total fetch is the documented scalar."""
    from reader_spark.ops.allocate import unimax_allocation

    docs = _read(spark, sf_dir, "documents")
    sizes = docs.groupBy("lang").agg(F.sum("n_chars").alias("size_chars"))
    total = sizes.agg(F.sum("size_chars")).head()[0]
    return unimax_allocation(
        sizes, "lang", "size_chars", budget=3.2 * float(total), max_epochs=4.0
    )


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet per-language head/middle/tail perplexity bucketing
    (ops.textstats.ccnet_buckets): corpus-trained unigram LM scores +
    per-lang ntile(3) — the routing table a pretraining mix samples
    from. Exact ntile is the oracle contract; the approx-percentile cut
    is the documented petabyte path."""
    from reader_spark.ops.textstats import ccnet_buckets

    docs = _read(spark, sf_dir, "documents")
    return ccnet_buckets(docs, "doc_id", "text", "lang")


def _q_sentence_spans_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 three-span duplicate detection (ops.lines.sentence_spans_dedup,
    Raffel et al. 2020 §2.2): overlapping 3-unit sliding windows per doc
    (4-token chunks here — the fixture corpus is punctuation-free, same
    rationale as line_dedup), grouped corpus-wide on the 128-bit span
    hash; spans occurring more than once are the deletion list. Window
    construction is a within-row fold riding the scan; the only shuffle
    carries 32-hex-char hashes."""
    from reader_spark.ops.lines import sentence_spans_dedup

    docs = _read(spark, sf_dir, "documents")
    return sentence_spans_dedup(
        docs, "doc_id", "text", n=3, pattern=r"\S+( \S+){0,3}"
    )


def _q_sentence_spans_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 three-span CLEANING pass (ops.lines.sentence_spans_apply):
    duplicated 3-window spans keep only the globally-first occurrence
    (min over (doc_id, start)); covered sentences elsewhere are deleted
    and each doc is reassembled — per-doc (n_sents, n_kept, n_dropped,
    out_md5) over every input document. Election and survivor marking
    share one hash-keyed exchange; only 32-hex hashes and int indices
    shuffle."""
    from reader_spark.ops.lines import sentence_spans_apply

    docs = _read(spark, sf_dir, "documents")
    return sentence_spans_apply(
        docs, "doc_id", "text", n=3, pattern=r"\S+( \S+){0,3}"
    )

def _q_c4_page_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 page/line quality battery (ops.c4.c4_page_clean, Raffel
    et al. 2020) — the FIRST quality pass C4 runs on extracted pages:
    terminal-punctuation / >=5-word / javascript line rules, then
    badword / lorem-ipsum / curly-brace / <3-sentence page gates, with
    the cleaned page reassembled and md5'd inside one map-side-combined
    groupBy(doc_id). The punctuation-free fixture corpus is decorated
    deterministically (punct by (doc_id+line_no)%4, javascript every
    23rd line-slot, one page-gate trigger on line 0 of docs divisible
    by 41/43/47) — decoration is identical SQL in the oracle, so the op
    itself stays pure. Line flags are a pure map; ONE shuffle total."""
    from reader_spark.ops.c4 import c4_page_clean
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    lines = chunk_lines(docs, words_per_line=5)
    m4 = (F.col("doc_id") + F.col("line_no")) % 4
    punct = (
        F.when(m4 == 0, ".").when(m4 == 1, "!").when(m4 == 2, "?").otherwise("")
    )
    js = (F.col("doc_id") * 7 + F.col("line_no")) % 23 == 0
    base = F.when(
        js, F.concat(F.col("line"), F.lit(" enable javascript."))
    ).otherwise(F.concat(F.col("line"), punct))
    first = F.col("line_no") == 0
    decorated = (
        F.when(first & (F.col("doc_id") % 41 == 0), F.concat(base, F.lit(" {")))
        .when(
            first & (F.col("doc_id") % 43 == 0),
            F.concat(base, F.lit(" lorem ipsum")),
        )
        .when(
            first & (F.col("doc_id") % 47 == 0),
            F.concat(base, F.lit(" zzzqqqblocked.")),
        )
        .otherwise(base)
    )
    return c4_page_clean(
        lines.withColumn("line", decorated), badwords=("zzzqqqblocked",)
    )

def _q_justext_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText paragraph classification (ops.justext, Pomikálek 2011):
    link-density / stopword-density / length context-free rules, then
    the two context-sensitive revision passes where short and neargood
    paragraphs inherit from their nearest decisive neighbours. Fixture
    paragraphs are 25-word chunks with deterministic link_chars (half /
    tenth / none by (doc_id+3*par_no)%7) and a copyright-symbol inject
    every 31st slot; thresholds tuned so all four context-free classes
    occur (151 good / 390 neargood / 188 short / 589 bad at sf0.01).
    The windows partition on doc_id (bounded by paragraphs-per-page);
    the context-free pass is a pure map riding the scan."""
    from reader_spark.ops.justext import justext_classify
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    lines = (
        chunk_lines(docs, words_per_line=25)
        .withColumnRenamed("line_no", "par_no")
        .withColumnRenamed("line", "text")
    )
    m7 = (F.col("doc_id") + 3 * F.col("par_no")) % 7
    link = (
        F.when(m7 == 0, F.floor(F.length("text") / 2))
        .when(m7 == 1, F.floor(F.length("text") / 10))
        .otherwise(F.lit(0))
    ).cast("long")
    cc = (F.col("doc_id") * 5 + F.col("par_no")) % 31 == 0
    pars = lines.withColumn(
        "text",
        F.when(cc, F.concat(F.col("text"), F.lit(" ©"))).otherwise(F.col("text")),
    ).withColumn("link_chars", link)
    out = justext_classify(
        pars,
        stopwords=("a", "the", "table", "value"),
        length_low=70,
        length_high=120,
        stopwords_low=0.12,
        stopwords_high=0.18,
        max_link_density=0.2,
    )
    return out.select(
        "doc_id",
        "par_no",
        F.col("length").cast("long").alias("length"),
        F.col("n_words").cast("long").alias("n_words"),
        "link_density",
        "stopword_density",
        "cf_class",
        "final_class",
    )

def _q_boilerpipe_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerpipe NumWordsRules block classification (ops.boilerpipe,
    Kohlschütter et al. WSDM 2010): the published decision tree over
    words-per-block + link density of each block and its neighbours.
    Fixture blocks are synthesized per doc (1 + doc_id % 12 blocks;
    num_words cycles 1..50 crossing every tree threshold; link density
    cycles 0 / 0.5 / 1.0 so both link-density branches fire) — all
    eight leaves reachable. One lag/lead window partitioned by doc_id;
    everything else rides the scan."""
    from reader_spark.ops.boilerpipe import boilerpipe_classify

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    blocks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 12).cast("long"))
        ).alias("blk_no"),
    )
    m5 = (F.col("doc_id") + 3 * F.col("blk_no")) % 5
    feats = blocks.withColumn(
        "num_words", 1 + (F.col("doc_id") + 5 * F.col("blk_no")) % 50
    ).withColumn(
        "link_density",
        F.when(m5 == 0, 0.5).when(m5 == 1, 1.0).otherwise(0.0),
    )
    return boilerpipe_classify(feats).select(
        "doc_id", "blk_no", "num_words", "link_density", "is_content"
    )

def _q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-refresh delta (ops.delta.crawl_delta): added / changed /
    removed / unchanged between two snapshots, hash-only shuffle (each
    side pre-projects to (id, md5) before the full-outer equi-join).
    The new snapshot is a deterministic mutation of the old: docs % 17
    vanish (removed), % 13 get ' v2' appended (changed), % 19 spawn a
    shifted-id copy (added). The frontier variant feeding re-extraction
    is ops.delta.refresh_frontier, same join shape."""
    from reader_spark.ops.delta import crawl_delta

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    added = docs.where(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
    )
    new = base.unionByName(added)
    return crawl_delta(docs, new)

def _q_justext_headings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText WITH the two heading passes at corpus scale (ops.justext
    heading_col): same 25-word paragraph fixture as justext_classify
    plus a deterministic heading flag every 4th slot and a tight
    max_heading_distance so both promoted and budget-blocked headings
    occur. The oracle re-derives the promotions with cumulative char
    offsets — nearest-following-good within budget — proving the
    window form equals the reference's sequential scan."""
    from reader_spark.ops.justext import justext_classify
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    lines = (
        chunk_lines(docs, words_per_line=25)
        .withColumnRenamed("line_no", "par_no")
        .withColumnRenamed("line", "text")
    )
    heading = (F.col("doc_id") + F.col("par_no")) % 4 == 0
    # heading slots truncate to their first 5 words (mid-document
    # SHORT paragraphs — a tail-only short has nothing following to
    # promote it from) and carry no links
    short_text = F.array_join(
        F.slice(F.split(F.col("text"), " "), 1, 5), " "
    )
    lines = lines.withColumn(
        "text", F.when(heading, short_text).otherwise(F.col("text"))
    )
    m7 = (F.col("doc_id") + 3 * F.col("par_no")) % 7
    link = (
        F.when(heading, F.lit(0))
        .when(m7 == 0, F.floor(F.length("text") / 2))
        .when(m7 == 1, F.floor(F.length("text") / 10))
        .otherwise(F.lit(0))
    ).cast("long")
    pars = lines.withColumn("link_chars", link).withColumn(
        "is_heading", heading
    )
    out = justext_classify(
        pars,
        stopwords=("a", "the", "table", "value"),
        length_low=70,
        length_high=120,
        stopwords_low=0.12,
        stopwords_high=0.18,
        max_link_density=0.2,
        heading_col="is_heading",
        max_heading_distance=150,
    )
    return out.select(
        "doc_id",
        "par_no",
        F.col("length").cast("long").alias("length"),
        "cf_class",
        "final_class",
    )

def _q_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-scheduler change-frequency estimation (ops.delta.
    change_rate, Cho & Garcia-Molina 2003): per-doc Poisson rate from 8
    synthesized delta rounds (changed iff (doc_id*(r+1)+r^2)%5==0; docs
    % 3 lose one round to an 'added' status, proving the visited-only
    filter). Naive -ln(1-X/n) and the bias-reduced (n-X+.5)/(n+.5)
    estimator side by side. One map-side-combined groupBy."""
    from reader_spark.ops.delta import change_rate

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    hist = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("r")
    )
    status = (
        F.when(
            (F.col("doc_id") % 3 == 0) & (F.col("r") == F.col("doc_id") % 8),
            "added",
        )
        .when(
            (F.col("doc_id") * (F.col("r") + 1) + F.col("r") * F.col("r")) % 5
            == 0,
            "changed",
        )
        .otherwise("unchanged")
    )
    return change_rate(hist.withColumn("status", status))

def _q_anchor_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text corpus table (ops.anchors.anchor_corpus): per target
    URL, inbound reference counts, distinct anchors/domains, and the
    dominant anchor (max by (n_refs, anchor) — one deterministic struct
    max). Fixture links: 3 per doc over a 97-URL target space with
    anchors cycling through two filtered forms ('click here', '') and
    three real ones. Two-level aggregation with map-side combine; the
    distinct-domain fold joins back on the same url key."""
    from reader_spark.ops.anchors import anchor_corpus

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    links = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k")
    )
    m6 = (F.col("doc_id") + 7 * F.col("k")) % 6
    anchor = (
        F.when(m6 == 0, "click here")
        .when(m6 == 1, "spark guide")
        .when(m6 == 2, "data docs page")
        .when(m6 == 3, "spark guide")
        .when(m6 == 4, "")
        .otherwise(F.concat(F.lit("guide "), (F.col("doc_id") % 5).cast("string")))
    )
    frame = links.select(
        F.concat(
            F.lit("https://t.test/p"),
            ((F.col("doc_id") * (F.col("k") + 1)) % 97).cast("string"),
        ).alias("target_url"),
        anchor.alias("anchor"),
        F.concat(F.lit("d"), (F.col("doc_id") % 11).cast("string")).alias(
            "src_domain"
        ),
    )
    return anchor_corpus(frame)

def _q_section_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-section rollup (ops.sections.section_rollup): docs and mean
    quality per URL path prefix — the data-driven replacement for
    hand-written crawler include/exclude regexes. Fixture URLs:
    1 + doc_id % 4 path segments from a 6-name alphabet over 7 domains
    (root-only every 23rd doc); quality = (doc_id % 100)/100. Prefix
    explode is bounded by path depth; ONE map-side-combined groupBy."""
    from reader_spark.ops.sections import section_rollup

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    depth = 1 + F.col("doc_id") % 4
    segs = F.transform(
        F.sequence(F.lit(0), (depth - 1).cast("int")),
        lambda i: F.concat(
            F.lit("s"), ((F.col("doc_id") + i * 3) % 6).cast("string")
        ),
    )
    path = F.when(F.col("doc_id") % 23 == 0, F.lit("/")).otherwise(
        F.concat(F.lit("/"), F.array_join(segs, "/"))
    )
    frame = docs.select(
        F.concat(F.lit("d"), (F.col("doc_id") % 7).cast("string")).alias(
            "domain"
        ),
        path.alias("path"),
        ((F.col("doc_id") % 100) / 100.0).alias("quality"),
    )
    return section_rollup(frame)

def _q_justext_multilang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText with PER-LANGUAGE stopword routing (ops.justext
    stopwords_by_lang): the published algorithm ships one stopword list
    per language; a multilingual corpus picks each row's list by its
    lang column — literal arrays behind a lang CASE, still pure
    expressions (no join, no Python). The five corpus languages each
    get a distinct fixture list, so densities and classes genuinely
    diverge per language. Same paragraph fixture as justext_classify,
    minus the copyright inject."""
    from reader_spark.ops.justext import justext_classify
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    lines = (
        chunk_lines(docs, words_per_line=25)
        .withColumnRenamed("line_no", "par_no")
        .withColumnRenamed("line", "text")
    )
    # re-attach lang (chunk_lines keeps only id + line)
    lines = lines.join(docs.select("doc_id", "lang"), "doc_id")
    m7 = (F.col("doc_id") + 3 * F.col("par_no")) % 7
    link = (
        F.when(m7 == 0, F.floor(F.length("text") / 2))
        .when(m7 == 1, F.floor(F.length("text") / 10))
        .otherwise(F.lit(0))
    ).cast("long")
    pars = lines.withColumn("link_chars", link)
    out = justext_classify(
        pars,
        stopwords=("a", "the"),
        length_low=70,
        length_high=120,
        stopwords_low=0.12,
        stopwords_high=0.18,
        max_link_density=0.2,
        stopwords_by_lang={
            "en": ("a", "the", "table", "value"),
            "es": ("data", "value", "a"),
            "fr": ("table", "key", "the"),
            "de": ("row", "scan", "a"),
            "zh": ("fast", "slow"),
        },
    )
    return out.select(
        "doc_id",
        "par_no",
        F.col("length").cast("long").alias("length"),
        "stopword_density",
        "cf_class",
        "final_class",
    )

def _q_url_variant_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-variant clustering (ops.dedup.url_variant_clusters): raw
    crawl URLs folded to their canonical key (U3 native twin) with a
    shortest-then-lexicographic canonical election. Fixture: every doc
    yields a www/port/query/index-file long form (A) and a short+slash
    form (C); the bare short form (B) is absent on docs % 5 and
    DUPLICATED on docs % 7, so n_hits vs n_variants genuinely diverge
    and the election flips between B and C."""
    from reader_spark.ops.dedup import url_variant_clusters

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    base = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    a = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com:443/Docs/"),
        F.col("doc_id").cast("string"), F.lit("/index.html?utm=1#frag"),
    )
    c = F.concat(base, F.lit("/"))
    rows = docs.select(a.alias("url")).unionByName(
        docs.select(c.alias("url"))
    ).unionByName(
        docs.where(F.col("doc_id") % 5 != 0).select(base.alias("url"))
    ).unionByName(
        docs.where(F.col("doc_id") % 7 == 0).select(base.alias("url"))
    )
    return url_variant_clusters(rows)

def _q_content_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror/alias detection (ops.dedup.content_aliases): identical
    content behind different URLs/hosts, grouped on the map-side
    content digest (hash-only shuffle). Fixture: each synthetic body is
    shared by the doc pair (d, d+250) served from different mirror
    hosts, so every group has 2 URLs across 2 hosts and the first_url
    election is non-trivial."""
    from reader_spark.ops.dedup import content_aliases

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    frame = docs.select(
        F.concat(F.lit("content-"), (d % 250).cast("string")).alias("text"),
        F.concat(
            F.lit("https://m"), (d % 3).cast("string"),
            F.lit(".mirror.test/p"), d.cast("string"),
        ).alias("url"),
        F.concat(F.lit("m"), (d % 3).cast("string")).alias("host"),
    )
    return content_aliases(frame)


def _q_cetr_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CETR line classification (ops.cetr, Weninger et al. WWW 2010):
    tag-ratio per raw HTML line, binomial-kernel smoothing, per-document
    mean cut — all integer micro-unit math so Spark and the DuckDB twin
    are bit-identical. Fixture lines are 8-word chunks wrapped in
    deterministic markup by (doc_id + 5*line_no) % 4: tag-heavy nav
    (6 tags), a plain <p>, bare text (TR spike), and a list-item link —
    so smoothing and the mean threshold both genuinely move labels.
    ONE doc_id exchange: kernel taps and the mean-cut aggregate share
    the same partitioning (plan-pinned)."""
    from reader_spark.ops.cetr import cetr_classify
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    lines = chunk_lines(docs, words_per_line=8)
    m4 = (F.col("doc_id") + 5 * F.col("line_no")) % 4
    html = (
        F.when(
            m4 == 0,
            F.concat(
                F.lit('<div class="nav"><a href="/x">'),
                F.col("line"),
                F.lit('</a> <a href="/y">more</a></div>'),
            ),
        )
        .when(m4 == 1, F.concat(F.lit("<p>"), F.col("line"), F.lit("</p>")))
        .when(
            m4 == 3,
            F.concat(
                F.lit('<li><a href="#">'), F.col("line"), F.lit("</a></li>")
            ),
        )
        .otherwise(F.col("line"))
    )
    out = cetr_classify(lines.withColumn("html", html).drop("line"))
    return out.select(
        "doc_id",
        "line_no",
        "tag_count",
        "text_chars",
        "tr_micro",
        "smoothed_micro",
        "deriv_micro",
        "is_content",
    )


def _q_sitemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (ops.sitemaps.parse_sitemaps): per-domain
    <urlset> leaf files plus one <sitemapindex> hub, synthesized
    deterministically (7 domains; lastmod absent for docs % 5 == 0,
    changefreq absent % 11 == 0 / 'never' % 13 == 0, priority absent
    % 10 == 3) and parsed back with the two RE2 block regexes. The
    \\b word boundaries must keep <urlset>/<sitemapindex> wrappers out
    of the entry stream; field absence exercises every NULL path and
    the spec's 0.5 priority default. XML assembly is ONE ordered
    string_agg per domain; parsing is a bounded explode riding the
    scan."""
    from reader_spark.ops.sitemaps import parse_sitemaps

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    dom = (d % 7).cast("string")
    nl = "\n"
    cf = F.when(d % 13 == 0, F.lit("never")).otherwise(
        F.element_at(
            F.array(
                F.lit("always"), F.lit("hourly"), F.lit("daily"),
                F.lit("weekly"), F.lit("monthly"), F.lit("yearly"),
            ),
            (d % 6).cast("int") + 1,
        )
    )
    entry = F.concat(
        F.lit(nl + "  <url>" + nl + "    <loc> https://d"), dom,
        F.lit(".test/p"), d.cast("string"), F.lit(" </loc>"),
        F.when(
            d % 5 != 0,
            F.concat(
                F.lit(nl + "    <lastmod>2026-0"),
                (1 + d % 9).cast("string"), F.lit("-15</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 != 0,
            F.concat(F.lit(nl + "    <changefreq>"), cf, F.lit("</changefreq>")),
        ).otherwise(F.lit("")),
        F.when(
            d % 10 != 3,
            F.concat(
                F.lit(nl + "    <priority>0."), (d % 10).cast("string"),
                F.lit("</priority>"),
            ),
        ).otherwise(F.lit("")),
        F.lit(nl + "  </url>"),
    )
    leaf = (
        docs.select(dom.alias("dom"), d.alias("d"), entry.alias("e"))
        .groupBy("dom")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>' + nl),
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("d"), F.col("e")))
                        ),
                        lambda x: x["e"],
                    ),
                ),
                F.lit(nl + "</urlset>"),
            ).alias("xml")
        )
        .select(
            F.concat(
                F.lit("https://d"), F.col("dom"), F.lit(".test/sitemap.xml")
            ).alias("sitemap_url"),
            "xml",
        )
    )
    k = F.col("k").cast("string")
    idx = (
        docs.select((d % 7).alias("k"))
        .distinct()
        .select(
            F.col("k"),
            F.concat(
                F.lit(nl + "  <sitemap>" + nl + "    <loc>https://d"), k,
                F.lit(".test/sitemap.xml</loc>" + nl + "    <lastmod>2026-01-0"),
                (F.col("k") + 1).cast("string"),
                F.lit("</lastmod>" + nl + "  </sitemap>"),
            ).alias("e"),
        )
        .groupBy()
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>' + nl),
                F.lit('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("k"), F.col("e")))
                        ),
                        lambda x: x["e"],
                    ),
                ),
                F.lit(nl + "</sitemapindex>"),
            ).alias("xml")
        )
        .select(
            F.lit("https://hub.test/sitemap_index.xml").alias("sitemap_url"),
            "xml",
        )
    )
    return parse_sitemaps(leaf.unionByName(idx)).select(
        "sitemap_url", "kind", "loc", "lastmod", "changefreq",
        "freq_hours", "priority_milli",
    )


def _q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-due schedule (ops.sitemaps.recrawl_schedule): publisher
    changefreq hints combined with OBSERVED Cho & Garcia-Molina change
    rates from the same 8-round delta history change_rate certifies —
    precedence observation > hint > 168h default, revisit interval
    floor(24/λ) hours, no-lastmod rows always due. The rates dim joins
    on the URL string key (same cardinality as entries — a plain
    equi-join, deliberately NOT broadcast). as_of is pinned so the
    schedule replays."""
    from reader_spark.ops.delta import change_rate
    from reader_spark.ops.sitemaps import recrawl_schedule

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    loc = F.concat(
        F.lit("https://d"), (d % 7).cast("string"), F.lit(".test/p"),
        d.cast("string"),
    )
    freq = F.when(d % 13 == 0, F.lit(None).cast("long")).otherwise(
        F.element_at(
            F.array(
                F.lit(0), F.lit(1), F.lit(24), F.lit(168), F.lit(730),
                F.lit(8766),
            ),
            (d % 6).cast("int") + 1,
        ).cast("long")
    )
    entries = docs.select(
        loc.alias("loc"),
        F.when(
            d % 5 != 0,
            F.concat(
                F.lit("2026-0"), (1 + d % 9).cast("string"), F.lit("-15")
            ),
        ).alias("lastmod"),
        F.when(d % 11 != 0, freq).alias("freq_hours"),
        F.when(d % 10 != 3, d % 10 * 100).otherwise(F.lit(500))
        .cast("long")
        .alias("priority_milli"),
    )
    hist = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("r")
    )
    status = (
        F.when(
            (F.col("doc_id") % 3 == 0) & (F.col("r") == F.col("doc_id") % 8),
            "added",
        )
        .when(
            (F.col("doc_id") * (F.col("r") + 1) + F.col("r") * F.col("r")) % 5
            == 0,
            "changed",
        )
        .otherwise("unchanged")
    )
    rates = change_rate(hist.withColumn("status", status)).select(
        F.concat(
            F.lit("https://d"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".test/p"), F.col("doc_id").cast("string"),
        ).alias("loc"),
        "rate_cho",
    )
    return recrawl_schedule(entries, as_of="2026-06-15", rates=rates)


def _q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index (ops.cdx): SURT urlkey + SHA-256 digest per
    capture. Fixture URLs exercise every canonicalization rule — case
    folding, www/www2 prefix strip, default-port drop (both :443 and
    :80), non-default port kept, query-parameter sorting, fragment
    drop, a non-http scheme, and an unparseable row (NULL urlkey).
    Key and digest are pure maps riding the scan."""
    from reader_spark.ops.cdx import cdx_index

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = F.col("source")
    m6 = d % 6
    url = (
        F.when(
            m6 == 0,
            F.concat(
                F.lit("https://WWW."), s, F.lit(".Example.COM:443/Docs/"),
                d.cast("string"), F.lit("?b=2&a=1#frag"),
            ),
        )
        .when(
            m6 == 1,
            F.concat(
                F.lit("http://"), s, F.lit(".example.com:8080/Page/"),
                d.cast("string"),
            ),
        )
        .when(
            m6 == 2,
            F.concat(F.lit("https://www2."), s, F.lit(".example.com/x/y")),
        )
        .when(
            m6 == 3,
            F.concat(F.lit("http://"), s, F.lit(".example.com:80/p?z=1")),
        )
        .when(
            m6 == 4,
            F.concat(F.lit("ftp://files."), s, F.lit(".example.com")),
        )
        .otherwise(F.concat(F.lit("not a url "), d.cast("string")))
    )
    caps = docs.select(
        url.alias("url"),
        F.concat(
            F.lit("20260615"), F.lpad((d % 86400).cast("string"), 6, "0")
        ).alias("ts"),
        F.when(d % 2 == 0, "text/html")
        .otherwise("application/pdf")
        .alias("mime"),
        F.when(d % 3 == 0, 200).when(d % 3 == 1, 404).otherwise(301)
        .alias("status"),
        F.col("text").alias("payload"),
    )
    return cdx_index(caps)


def _q_ensemble_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble extraction (ops.ensemble): jusText, Boilerpipe and CETR
    run over ONE shared 25-word paragraph frame (same link_chars ladder
    as justext_classify, char-based link density for the Boilerpipe
    tree, m7-keyed markup decoration for CETR's tag ratios) and vote
    2-of-3 per block — the Dragnet insight as a deterministic majority.
    Every arm windows on doc_id and the verdict joins key on
    (doc_id, par_no), so the composed plan never leaves the document
    key. All-integer verdicts; the oracle composes the three certified
    oracle bodies over the same frame."""
    from reader_spark.ops.boilerpipe import boilerpipe_classify
    from reader_spark.ops.cetr import cetr_classify
    from reader_spark.ops.ensemble import ensemble_vote
    from reader_spark.ops.justext import justext_classify
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    pars = (
        chunk_lines(docs, words_per_line=25)
        .withColumnRenamed("line_no", "par_no")
        .withColumnRenamed("line", "text")
    )
    m7 = (F.col("doc_id") + 3 * F.col("par_no")) % 7
    link = (
        F.when(m7 == 0, F.floor(F.length("text") / 2))
        .when(m7 == 1, F.floor(F.length("text") / 10))
        .otherwise(F.lit(0))
    ).cast("long")
    pars = pars.withColumn("link_chars", link)

    jt = justext_classify(
        pars,
        stopwords=("a", "the", "table", "value"),
        length_low=70,
        length_high=120,
        stopwords_low=0.12,
        stopwords_high=0.18,
        max_link_density=0.2,
    ).select(
        "doc_id",
        "par_no",
        F.col("final_class").isin("good", "neargood").cast("int").alias(
            "v_justext"
        ),
    )

    bp_feats = pars.select(
        "doc_id",
        "par_no",
        F.size(F.split("text", " ")).alias("num_words"),
        (F.col("link_chars") / F.greatest(F.length("text"), F.lit(1))).alias(
            "link_density"
        ),
    )
    bp = boilerpipe_classify(bp_feats, order_col="par_no").select(
        "doc_id", "par_no", F.col("is_content").cast("int").alias("v_boilerpipe")
    )

    html = (
        F.when(
            m7 == 0,
            F.concat(
                F.lit('<div class="nav"><a href="/x">'),
                F.col("text"),
                F.lit("</a></div>"),
            ),
        )
        .when(
            m7 == 1,
            F.concat(
                F.lit('<p><a href="/y">ln</a> '), F.col("text"), F.lit("</p>")
            ),
        )
        .when(m7.isin(2, 3), F.col("text"))
        .otherwise(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")))
    )
    ct = cetr_classify(
        pars.select("doc_id", "par_no", html.alias("html")),
        order_col="par_no",
    ).select(
        "doc_id", "par_no", F.col("is_content").cast("int").alias("v_cetr")
    )

    joined = jt.join(bp, ["doc_id", "par_no"]).join(ct, ["doc_id", "par_no"])
    return ensemble_vote(
        joined, ("v_justext", "v_boilerpipe", "v_cetr")
    ).select(
        "doc_id", "par_no", "v_justext", "v_boilerpipe", "v_cetr",
        "votes", "is_content",
    )


def _q_politeness_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness fetch slots (ops.sitemaps.politeness_slots): per-host
    serial queues ordered (priority desc, loc asc), slot k at offset
    (k-1)·crawl_delay, host makespan = n·delay. Fixture: 13 hosts,
    priorities cycling mod 10, delays 500·(1+host%4) ms with host d0
    missing from the dim (default 1000 ms path). Host-keyed window +
    same-key delay join; all integer milliseconds."""
    from reader_spark.ops.sitemaps import politeness_slots

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    frontier = docs.select(
        F.concat(
            F.lit("https://d"), (d % 13).cast("string"), F.lit(".test/p"),
            d.cast("string"),
        ).alias("loc"),
        F.concat(F.lit("d"), (d % 13).cast("string")).alias("host"),
        ((d % 10) * 100).cast("long").alias("priority_milli"),
    )
    hosts = (
        docs.select((d % 13).alias("k"))
        .distinct()
        .where(F.col("k") != 0)  # d0 absent -> default-delay path
        .select(
            F.concat(F.lit("d"), F.col("k").cast("string")).alias("host"),
            (500 * (1 + F.col("k") % 4)).cast("long").alias("crawl_delay_ms"),
        )
    )
    return politeness_slots(frontier, hosts)


def _q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale robots.txt parse (ops.robotstxt, RFC 9309): one
    fetched file per host (13 hosts; crawl-delay absent for k % 3 == 0,
    a multi-agent second group for even k, a second sitemap for
    k % 4 == 0, and a directive BEFORE any group that must be dropped).
    Group assignment is lag + running sum per host; group directives
    fan out to every agent of their group; Sitemap rows are
    group-independent (NULL agent)."""
    from reader_spark.ops.robotstxt import robots_parse

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    k = F.col("k")
    ks = k.cast("string")
    hosts = docs.select((F.col("doc_id") % 13).alias("k")).distinct()
    content = F.concat(
        F.lit("# robots for d"), ks, F.lit("\n"),
        F.lit("Disallow: /ignored-before-group\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /private\n"),
        F.when(
            k % 3 != 0,
            F.concat(
                F.lit("Crawl-delay: "), (1 + k % 5).cast("string"),
                F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        F.lit("Allow: /public\n\n"),
        F.when(
            k % 2 == 0,
            F.lit("User-agent: badbot\nUser-agent: otherbot\nDisallow: /\n"),
        ).otherwise(F.lit("")),
        F.lit("Sitemap: https://d"), ks, F.lit(".test/sitemap.xml\n"),
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("Sitemap: https://d"), ks,
                F.lit(".test/sitemap2.xml"),
            ),
        ).otherwise(F.lit("")),
    )
    files = hosts.select(
        F.concat(F.lit("d"), ks).alias("host"), content.alias("content")
    )
    return robots_parse(files)


def _q_cdx_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDX merge (ops.cdx.cdx_merge): yesterday's revisit
    index + today's captures in one key-pair groupBy, payloads never
    re-read. Fixture: the base index comes from the cdx_index fixture's
    parseable arms; today's crawl re-captures docs % 3 == 0 with the
    SAME content (revisit: n_captures grows, first_ts stays) and docs
    % 7 == 0 with CHANGED content (new digest row). Counters and keys
    shuffle; nothing else."""
    from reader_spark.ops.cdx import cdx_dedup_captures, cdx_index

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://a"), (d % 11).cast("string"), F.lit(".test/p"),
        d.cast("string"),
    )
    base_caps = docs.select(
        url.alias("url"),
        F.lit("20260101000000").alias("ts"),
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.col("text").alias("payload"),
    )
    base = cdx_dedup_captures(cdx_index(base_caps))
    today = docs.where((d % 3 == 0) | (d % 7 == 0)).select(
        url.alias("url"),
        F.lit("20260615000000").alias("ts"),
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.when(
            d % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("payload"),
    )
    from reader_spark.ops.cdx import cdx_merge

    return cdx_merge(base, cdx_dedup_captures(cdx_index(today)))


def _q_semantic_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Material-vs-cosmetic refresh delta (ops.delta.semantic_delta):
    byte-changed docs whose text is equal after typographic fold +
    whitespace collapse + case fold are 'cosmetic' and must NOT feed
    the change-rate estimator. Mutations: docs % 17 removed, % 19 add
    a shifted copy, % 13 get ' v2' (material), % 11 get smart-quote +
    double-space + case noise (cosmetic; the % 13 arm wins when both
    divide). Digest-only shuffle, two md5s per side."""
    from reader_spark.ops.delta import semantic_delta

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    base = docs.where(d % 17 != 0)
    cosmetic = F.concat(
        F.lit("  "),
        F.upper(F.replace(F.col("text"), F.lit(" "), F.lit("  "))),
        F.lit(" "),
    )
    mutated = (
        F.when(d % 13 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .when(d % 11 == 0, cosmetic)
        .otherwise(F.col("text"))
    )
    added = docs.where(d % 19 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    new = base.withColumn("text", mutated).unionByName(added)
    return semantic_delta(docs, new)


def _q_refresh_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-budget refresh allocation (ops.refresh.refresh_allocation,
    Cho & Garcia-Molina 2003): greedy-optimal accesses-per-page for a
    600-access budget over the SAME 8-round delta history change_rate
    certifies, with lam_milli = changes*1000 div visits. Marginal gains
    are exact integers (gain_q = lam*1e15 div slot denominators); the
    budget selection is orderBy().limit() = TakeOrderedAndProject, and
    the paper's abandon-the-hottest result falls out (gain_1 =
    1/(1+lam)). Zero-change pages are never revisited."""
    from reader_spark.ops.refresh import refresh_allocation

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    hist = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("r")
    )
    status = (
        F.when(
            (F.col("doc_id") % 3 == 0) & (F.col("r") == F.col("doc_id") % 8),
            "added",
        )
        .when(
            (F.col("doc_id") * (F.col("r") + 1) + F.col("r") * F.col("r")) % 5
            == 0,
            "changed",
        )
        .otherwise("unchanged")
    )
    visited = hist.withColumn("status", status).where(
        F.col("status").isin("changed", "unchanged")
    )
    pages = visited.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum((F.col("status") == "changed").cast("long")).alias("n_changes"),
    ).select(
        "doc_id",
        F.expr("n_changes * 1000 div n_visits").cast("long").alias("lam_milli"),
    )
    return refresh_allocation(pages, budget=600, max_slots=8)


def _trap_ledger(docs: DataFrame) -> DataFrame:
    """The synthesized trap/clean crawl ledger shared by
    crawl_trap_signals and crawl_priority: even-numbered hosts get
    calendar/session-id URLs all sharing ONE content digest (deep-path
    variant every 11th doc); odd hosts get unique clean URLs."""
    e = docs.select("doc_id", "source").select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
    )
    d, i = F.col("doc_id"), F.col("i")
    trap = F.substring("source", 4, 10).cast("long") % 2 == 0
    mm = F.lpad(((d + i) % 12 + 1).cast("string"), 2, "0")
    sid = F.substring(
        F.md5(F.concat_ws("-", d.cast("string"), i.cast("string"))), 1, 6
    )
    deep = F.lit("d/" * 9)
    trap_url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".test/cal/2020-"),
        mm,
        F.when((d % 11 == 0), deep).otherwise(F.lit("")),
        F.lit("/?sid="),
        sid,
    )
    norm_url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".test/p/"),
        d.cast("string"),
        F.lit("/"),
        i.cast("string"),
    )
    crawl = e.select(
        F.col("source").alias("host"),
        F.when(trap, trap_url).otherwise(norm_url).alias("url"),
        F.when(trap, F.md5(F.col("source")))
        .otherwise(
            F.md5(F.concat_ws(":", d.cast("string"), i.cast("string")))
        )
        .alias("digest"),
    )
    return crawl


def _q_crawl_trap_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl-trap scoring (ops.traps.trap_signals, Mercator-
    style heuristics): content-novelty gap, query-string share,
    date-segment share, path depth, and the weighted trap score over
    the synthesized trap/clean ledger (see _trap_ledger). Digests
    shuffle in a (host, digest) pre-aggregate — never payloads."""
    from reader_spark.ops.traps import trap_signals

    docs = _read(spark, sf_dir, "documents")
    return trap_signals(_trap_ledger(docs))


def _q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST-rule mining (ops.urltemplates.url_templates, Bar-Yossef et
    al. WWW 2007): URLs fold to typed templates (UUID/{U}, 16+ hex/{H},
    digit runs/{N}); per-(host, template) novelty rollup exposes
    session-id calendar URLs (one digest behind a {H} sid — dup_milli
    near 1000) vs genuine /p/{N}/{N} content series (dup 0). Digests
    shuffle in the pre-aggregate, never payloads."""
    from reader_spark.ops.urltemplates import url_templates

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    e = docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
    )
    d, i = F.col("doc_id"), F.col("i")
    trap = F.substring("source", 4, 10).cast("long") % 2 == 0
    mm = F.lpad(((d + i) % 12 + 1).cast("string"), 2, "0")
    sid = F.md5(F.concat_ws("-", d.cast("string"), i.cast("string")))
    trap_url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".test/cal/2020-"),
        mm,
        F.lit("/?sid="),
        sid,
    )
    norm_url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".test/p/"),
        d.cast("string"),
        F.lit("/"),
        i.cast("string"),
    )
    crawl = e.select(
        F.col("source").alias("host"),
        F.when(trap, trap_url).otherwise(norm_url).alias("url"),
        F.when(trap, F.md5(F.col("source")))
        .otherwise(
            F.md5(F.concat_ws(":", d.cast("string"), i.cast("string")))
        )
        .alias("digest"),
    )
    return url_templates(crawl)


def _q_crawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed crawl-scheduling priority per host: the three certified
    signal layers joined on the host dim — m-estimate quality
    (source_quality_shrunk), mean Cho-2003 change rate over the host's
    docs (change_rate history), and the trap score (crawl_trap_signals)
    — folded into one exact-integer priority:
    ``priority_milli = quality * lam_mean div 1000 * (1000 - trap) div
    1000`` (crawl hosts that are good, churning, and not traps). All
    joins are on the bounded host dim; each layer keeps its certified
    plan shape."""
    from reader_spark.ops.shrinkage import shrunk_rates
    from reader_spark.ops.textstats import gopher_quality_columns
    from reader_spark.ops.traps import trap_signals

    docs = _read(spark, sf_dir, "documents")

    # layer 1: quality (identical to source_quality_shrunk)
    flags = gopher_quality_columns(docs.select("doc_id", "text")).select(
        "doc_id", F.col("gopher_pass").cast("int").alias("is_good")
    ).join(docs.select("doc_id", "source"), "doc_id")
    quality = shrunk_rates(flags, group_col="source", prior_strength=100)

    # layer 2: mean change rate per host (identical per-doc lam_milli
    # derivation to refresh_allocation)
    hist = docs.select(
        "doc_id", "source",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("r"),
    )
    status = (
        F.when(
            (F.col("doc_id") % 3 == 0) & (F.col("r") == F.col("doc_id") % 8),
            "added",
        )
        .when(
            (F.col("doc_id") * (F.col("r") + 1) + F.col("r") * F.col("r")) % 5
            == 0,
            "changed",
        )
        .otherwise("unchanged")
    )
    visited = hist.withColumn("status", status).where(
        F.col("status").isin("changed", "unchanged")
    )
    per_doc = visited.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("status") == "changed").cast("long")).alias("x"),
    ).select(
        "source", F.expr("x * 1000 div n").cast("long").alias("lam")
    )
    lam = per_doc.groupBy("source").agg(
        F.expr("sum(lam) div count(*)").cast("long").alias("lam_mean_milli")
    )

    # layer 3: trap score (identical ledger to crawl_trap_signals)
    traps = trap_signals(_trap_ledger(docs)).select("host", "trap_milli")

    joined = (
        quality.select("source", "shrunk_milli")
        .join(lam, "source")
        .join(traps.withColumnRenamed("host", "source"), "source")
    )
    return joined.select(
        "source",
        "shrunk_milli",
        "lam_mean_milli",
        "trap_milli",
        F.expr(
            "((shrunk_milli * lam_mean_milli) div 1000"
            " * (1000 - least(trap_milli, 1000))) div 1000"
        )
        .cast("long")
        .alias("priority_milli"),
    )


def _q_source_quality_shrunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes per-source quality rates (ops.shrinkage
    .shrunk_rates, Cestnik 1990 m-estimate): the Gopher gate's pass
    rate per source shrunk toward the pooled corpus rate with K=100
    pseudo-observations — the crawl-prioritization score a raw rate
    can't be. Pooled rate = 1-row broadcast; exact trunc-div milli
    units."""
    from reader_spark.ops.shrinkage import shrunk_rates
    from reader_spark.ops.textstats import gopher_quality_columns

    docs = _read(spark, sf_dir, "documents")
    flags = gopher_quality_columns(docs.select("doc_id", "text")).select(
        "doc_id", F.col("gopher_pass").cast("int").alias("is_good")
    ).join(docs.select("doc_id", "source"), "doc_id")
    return shrunk_rates(flags, group_col="source", prior_strength=100)


def _q_weighted_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Jaccard MinHash digests (ops.dedup.weighted_minhash_md5,
    the Ioffe-2010 problem solved by exact duplication expansion with a
    multiplicity cap): md5-portable signature digest per doc — the
    repetition-aware sibling of the certified minhash_lsh_md5 row (a
    spam page that repeats its payload 50x no longer dominates the
    similarity)."""
    from reader_spark.ops.dedup import weighted_minhash_md5

    docs = _read(spark, sf_dir, "documents")
    return weighted_minhash_md5(docs)


def _q_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded weighted-MinHash candidates + the EXACT capped weighted
    Jaccard per candidate pair in integer milli units (ops.dedup.
    weighted_jaccard_pairs): band equi-join candidates only; the exact
    pass joins count vectors solely for candidate docs."""
    from reader_spark.ops.dedup import weighted_jaccard_pairs

    docs = _read(spark, sf_dir, "documents")
    return weighted_jaccard_pairs(docs)


def _q_pii_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-card PII audit (ops.textstats.card_count_columns): 13-19
    digit candidate runs vs the Luhn-checksum-valid subset (ISO/IEC
    7812 mod-10 as an exact integer fold). Planted fixture: a valid
    grouped test PAN on every 5th doc, a near-miss (last digit off) on
    the next, and a 15-digit order-id-style run on the one after —
    candidates that must NOT validate. Scan-bound row expressions."""
    from reader_spark.ops.textstats import card_count_columns

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    planted = (
        F.when(
            d % 5 == 0,
            F.concat(F.col("text"), F.lit(" card 4111 1111 1111 1111 ok")),
        )
        .when(
            d % 5 == 1,
            F.concat(F.col("text"), F.lit(" card 4111-1111-1111-1112 bad")),
        )
        .when(
            d % 5 == 2,
            F.concat(F.col("text"), F.lit(" order 123456789012345 ref")),
        )
        .otherwise(F.col("text"))
    )
    base = docs.select(d.alias("doc_id"), planted.alias("text"))
    return card_count_columns(base).select(
        "doc_id", "n_card_candidates", "n_cards_luhn_valid"
    )


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search (ops.search.phrase_search, IIR §2.4):
    every 7th doc gets ' the quick brown fox jumps' appended (every
    21st twice); searching "quick brown fox" must hit exactly those
    docs with exact token offsets — token-space matching the
    bag-of-words BM25 row cannot express. One posexplode + broadcast
    phrase dim + one (doc, start) groupBy."""
    from reader_spark.ops.search import phrase_search

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    planted = F.when(
        d % 21 == 0,
        F.concat(
            F.col("text"),
            F.lit(" the quick brown fox jumps the quick brown fox jumps"),
        ),
    ).when(
        d % 7 == 0,
        F.concat(F.col("text"), F.lit(" the quick brown fox jumps")),
    ).otherwise(F.col("text"))
    base = docs.select(d.alias("doc_id"), planted.alias("text"))
    return phrase_search(base, "quick brown fox")


def _planted_dates(docs: DataFrame) -> DataFrame:
    """Deterministic date plants: US long-form on every 3rd doc, ISO on
    every 5th, slashed on every 7th, and out-of-range garbage
    (9999-99-99, 45/77/2020) on every 11th that must NOT validate."""
    d = F.col("doc_id").cast("long")
    pad2 = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    month_name = F.element_at(
        F.array(*[F.lit(m.capitalize()) for m in (
            "january", "february", "march", "april", "may", "june",
            "july", "august", "september", "october", "november",
            "december",
        )]),
        (d % 12).cast("int") + 1,
    )
    t = F.col("text")
    t = F.when(
        d % 3 == 0,
        F.concat(t, F.lit(" on "), month_name, F.lit(" "),
                 (1 + d % 28).cast("string"), F.lit(", "),
                 (1990 + d % 40).cast("string"), F.lit(".")),
    ).otherwise(t)
    t = F.when(
        d % 5 == 0,
        F.concat(t, F.lit(" released "),
                 (1990 + d % 40).cast("string"), F.lit("-"),
                 pad2(1 + d % 12), F.lit("-"), pad2(1 + d % 28)),
    ).otherwise(t)
    t = F.when(
        d % 7 == 0,
        F.concat(t, F.lit(" filed "), (1 + d % 12).cast("string"),
                 F.lit("/"), (1 + d % 28).cast("string"), F.lit("/"),
                 (1995 + d % 30).cast("string")),
    ).otherwise(t)
    t = F.when(
        d % 11 == 0,
        F.concat(t, F.lit(" bogus 9999-99-99 and 45/77/2020 end")),
    ).otherwise(t)
    return docs.select(d.alias("doc_id"), t.alias("text"))


def _q_text_date_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document date-mention profile (ops.dates.date_mention_years):
    ISO / US-long / slashed mentions validated by range rules (planted
    garbage must count zero) — the recency columns a mix recipe routes
    on. Scan-bound row expressions."""
    from reader_spark.ops.dates import date_mention_years

    docs = _read(spark, sf_dir, "documents")
    return date_mention_years(_planted_dates(docs)).select(
        "doc_id", "n_dates", "min_year", "max_year"
    )


def _q_corpus_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus recency histogram (ops.dates.corpus_recency): validated
    date mentions rolled up over the bounded year dim — mentions and
    distinct docs per year."""
    from reader_spark.ops.dates import corpus_recency

    docs = _read(spark, sf_dir, "documents")
    return corpus_recency(_planted_dates(docs))


def _q_bm25f_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F field-weighted top-15 (ops.search.bm25f_rank, Robertson
    2004): body + planted inbound-anchor field fused BEFORE saturation
    (anchor weight 2.5, its own b) for the same 3-term query the
    certified bm25_search row uses — anchors mentioning 'stream query'
    on every 4th doc must outrank body-only matches of equal tf. Same
    no-explode / 1-row-stats / TakeOrdered plan as bm25_rank."""
    from reader_spark.ops.search import bm25f_rank

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    anchor = (
        F.when(d % 4 == 0, F.lit("stream query guide"))
        .when(d % 4 == 1, F.concat(F.lit("site ex"), (d % 40).cast("string"), F.lit(" homepage")))
        .otherwise(F.lit(""))
    )
    base = docs.select(
        d.alias("doc_id"), F.col("text"), anchor.alias("anchor")
    )
    return bm25f_rank(base, ["stream", "window", "query"], top_k=15)


def _q_lexicon_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIWC-style category profile (ops.textstats.
    lexicon_category_profile): per-(doc, category) hits over the
    broadcast (category, word) dim with exact milli shares — the
    multi-category generalization of the certified blocklist_filter
    row; every pair emitted, zero rows included."""
    from reader_spark.ops.textstats import lexicon_category_profile

    docs = _read(spark, sf_dir, "documents")
    return lexicon_category_profile(docs)


def _q_math_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-notation prefilter signals (ops/mathdetect.math_signals —
    the OpenWebMath rule-prefilter shape): display/inline dollar-math,
    TeX commands, operator-symbol counts, capped integer score + flag.
    LaTeX snippets are planted deterministically on the documents
    table by doc_id mod arithmetic (mirrored by the oracle) so all
    signal classes fire at fixture scale."""
    from reader_spark.ops.mathdetect import math_signals

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    tail = (
        F.when(
            d % 13 == 0,
            " The identity $e^{i\\pi}+1=0$ holds and"
            " $$\\int_0^1 x^2 dx = \\frac{1}{3}$$ follows.",
        )
        .when(d % 7 == 0, " Compute x = y + z and check 2 < 3.")
        .otherwise("")
    )
    planted = docs.select(
        "doc_id", F.concat(F.col("text"), tail).alias("text")
    )
    return math_signals(planted)


def _q_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n lexical diversity per source (ops/diversity.
    distinct_ngram_diversity, Li et al. 2016): unique/total n-gram
    ratios WITH multiplicity for n=1,2,3, exact integer milli — the
    cross-document template-collapse audit."""
    from reader_spark.ops.diversity import distinct_ngram_diversity

    docs = _read(spark, sf_dir, "documents")
    return distinct_ngram_diversity(docs)


def _q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-similarity decontamination (ops/decontam.
    semantic_decontaminate): eval set = every 31st embedding, corpus =
    the rest; 2 literal md5 planes so buckets genuinely collide at
    fixture scale; round-4 cosine >= 0.35 (the embedding_dedup family
    threshold). Flags paraphrased leaks exact n-grams miss."""
    from reader_spark.ops.ann import md5_plane_weights
    from reader_spark.ops.decontam import semantic_decontaminate

    emb = _read(spark, sf_dir, "embeddings")
    evals = emb.where(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") % 31 != 0)
    w = md5_plane_weights(dim=64, planes=2)
    return semantic_decontaminate(corpus, evals, w)

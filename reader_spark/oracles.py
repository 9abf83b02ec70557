"""DuckDB oracle SQL for every oracle-checked query in __spark_entry__.

Pure data + string builders, no Spark: each entry is the ANSI/DuckDB twin
of a queries() entry, run side-by-side by the round driver and by
scripts/check_oracles.py.  Split out of __spark_entry__ (VERDICT r3 #8)
so the driver-contract file stays reviewable; the contract is unchanged
-- __spark_entry__.oracle_sql re-exports :func:`oracle_sql`.

Engine-parity conventions proven over rounds 1-3 (see docs/ROUND*.md):
BIGINT casts on integer sums (DuckDB HUGEINT driver-hash trap), md5-head
arithmetic as the portable hash family, round-9 terms / round-6 sums for
float lockstep, integer nano-unit sums for long reductions, identical
aliases both engines.
"""

from __future__ import annotations

from reader_spark.functions.text import LANG_STOPWORDS

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
    # Bloom prefilter is lossless (no false negatives) — sharing the exact
    # oracle proves phase-1 never drops a contaminated doc.
    out["decontaminate_bloom"] = out["decontaminate"]
    # Calibration bins compose the two existing oracles they grade —
    # the score and the label are the SAME expressions the
    # quality_logit / gopher_rules rows already certify.
    out["calibration_bins"] = f"""
        WITH q AS ({out["quality_logit"]}),
        g AS ({out["gopher_rules"]}),
        j AS (
            SELECT q.doc_id, q.score,
                   CAST(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END
                        AS DOUBLE) AS label
            FROM q JOIN g ON q.doc_id = g.doc_id
        ),
        b AS (
            SELECT least(CAST(floor(score * 10) AS INTEGER), 9) AS bin,
                   score, label
            FROM j
        ),
        a AS (
            SELECT bin,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(score), 6) AS mean_score,
                   round(avg(label), 6) AS frac_pos
            FROM b GROUP BY bin
        )
        SELECT bin, n_docs, mean_score, frac_pos,
               round(abs(mean_score - frac_pos), 6) AS gap
        FROM a
    """
    out["ann_lsh_md5"] = _ann_lsh_md5_oracle()
    out["hard_negatives_bucketed"] = _hard_negatives_bucketed_oracle()
    out["doc_sim_topk_bucketed"] = _doc_sim_topk_bucketed_oracle()
    out["text_clusters"] = _text_clusters_oracle()
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
    out["pdf_dehyphenate"] = """
        SELECT * FROM (VALUES
            ('pdf-hyphenated', 0, 'heading', '# Hyphenation Test Title'),
            ('pdf-hyphenated', 1, 'text',
             'The quick deterministic corpus uses a state-Machine to reflow '
             || 'fragmented lines with a softhyphen inside. '
             || 'Trailing dash stays - intact.')
        ) AS t(doc_id, ord, kind, text)
    """
    out["extraction_eval"] = """
        SELECT doc_id,
               CAST(n_naive  AS BIGINT) AS n_naive,
               CAST(n_gold   AS BIGINT) AS n_gold,
               CAST(n_common AS BIGINT) AS n_common,
               CAST(p  AS DOUBLE) AS precision,
               CAST(r  AS DOUBLE) AS recall,
               CAST(f1 AS DOUBLE) AS f1
        FROM (VALUES
            ('dialog-class-body', 24, 24, 24, 1.0,    1.0,    1.0),
            ('example-domain',    21, 24, 20, 0.9524, 0.8333, 0.8889),
            ('generic-sample',    37, 33, 29, 0.7838, 0.8788, 0.8286),
            ('kitchen-sink',      45, 53, 43, 0.9556, 0.8113, 0.8776),
            ('protected-content',  8,  8,  8, 1.0,    1.0,    1.0),
            ('saas-landing',      29, 22, 22, 0.7586, 1.0,    0.8627),
            ('simple-static',     55, 50, 46, 0.8364, 0.92,   0.8762),
            ('wikipedia-like',    44, 39, 39, 0.8864, 1.0,    0.9398)
        ) AS t(doc_id, n_naive, n_gold, n_common, p, r, f1)
    """
    out["crawl_fixture"] = """
        SELECT * FROM (VALUES
            ('https://c.test/start',  0, 'Start', CAST(NULL AS VARCHAR)),
            ('https://c.test/blog/a', 1, 'A',     CAST(NULL AS VARCHAR)),
            ('https://c.test/blog/b', 1, 'B',     CAST(NULL AS VARCHAR)),
            ('https://c.test/blog/c', 2, 'C',     CAST(NULL AS VARCHAR))
        ) AS t(url, depth, title, description)
    """
    out["bpe_token_counts"] = _bpe_token_counts_oracle()
    out["bpe_sequence_packing"] = _bpe_sequence_packing_oracle()
    out["bpe_encode_sample"] = _bpe_encode_sample_oracle()
    out["bpe_learn_merges"] = _bpe_learn_merges_oracle()
    out["length_batches"] = _length_batches_oracle()
    out["batch_padding_compare"] = _batch_padding_compare_oracle()
    out["nextfit_packing"] = _nextfit_packing_oracle()
    out.update(_chat_oracles())
    out.update(_preference_oracles())
    out.update(_accounting_oracles())
    out.update(_code_oracles())
    out["kmeans_clusters"] = _kmeans_oracle()
    out["bitext_mutual_pairs"] = _bitext_oracle(bucketed=False)
    out["bitext_mutual_bucketed"] = _bitext_oracle(bucketed=True)
    out["bitext_csls_pairs"] = _bitext_csls_oracle()
    out["doremi_weights"] = _doremi_oracle()
    out["bootstrap_len_ci"] = _bootstrap_oracle()
    out["mix_schedule"] = _mix_schedule_oracle()
    out.update(_privacy_oracles())
    out.update(_governance_oracles())
    out["eval_attribution"] = _eval_attribution_oracle()
    out.update(_audit_oracles())
    out["pack_leakage"] = _pack_leakage_oracle()
    # m-estimate shrinkage composes the certified gopher gate: the flag
    # is the SAME expression gopher_rules already value-certifies.
    out["source_quality_shrunk"] = f"""
        WITH g AS ({out["gopher_rules"]}),
        flags AS (
            SELECT d.source,
                   CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS f
            FROM g JOIN documents d ON g.doc_id = d.doc_id
        ),
        per_group AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(f) AS BIGINT) AS n_good
            FROM flags GROUP BY source
        ),
        pool AS (
            SELECT CAST(CAST(sum(n_good) AS BIGINT) * 1000000
                        // CAST(sum(n_items) AS BIGINT) AS BIGINT)
                       AS pool_micro
            FROM per_group
        )
        SELECT source, n_items, n_good,
               CAST(n_good * 1000 // n_items AS BIGINT) AS raw_milli,
               CAST((n_good * 1000000 + 100 * p.pool_micro)
                    // ((n_items + 100) * 1000) AS BIGINT) AS shrunk_milli,
               CAST((n_good * 1000000 + 100 * p.pool_micro)
                    // ((n_items + 100) * 1000)
                    - n_good * 1000 // n_items AS BIGINT) AS delta_milli
        FROM per_group CROSS JOIN pool p
    """
    out.update(_arena_oracles())
    out["lsh_s_curve"] = _lsh_s_curve_oracle()
    out.update(_feed_oracles())
    out.update(_tiling_oracles())
    out.update(_keyword_ocr_oracles())
    out.update(_trustrank_oracles())
    out.update(_confusable_oracles())
    out["refresh_allocation"] = _refresh_oracle()
    out.update(_quote_oracles())
    out["crawl_trap_signals"] = _trap_oracle()
    out["url_templates"] = _url_template_oracle()
    # composed crawl-scheduling priority: the three certified layers
    # (quality shrinkage, change-rate mean, trap score) joined on the
    # host dim -- each CTE is the exact oracle body already certified.
    out["crawl_priority"] = f"""
        WITH q AS ({out["source_quality_shrunk"]}),
        t AS ({out["crawl_trap_signals"]}),
        hist2 AS (
            SELECT doc_id, source, unnest(range(8)) AS r FROM documents
        ),
        st2 AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 3 = 0 AND r = doc_id % 8
                            THEN 'added'
                        WHEN (doc_id * (r + 1) + r * r) % 5 = 0
                            THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM hist2
        ),
        pd2 AS (
            SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0
                            END) AS BIGINT) AS x
            FROM st2 WHERE status IN ('changed', 'unchanged')
            GROUP BY 1, 2
        ),
        lam AS (
            SELECT source,
                   CAST(sum(x * 1000 // n) // count(*) AS BIGINT)
                       AS lam_mean_milli
            FROM pd2 GROUP BY 1
        )
        SELECT q.source, q.shrunk_milli, lam.lam_mean_milli,
               t.trap_milli,
               CAST(((q.shrunk_milli * lam.lam_mean_milli) // 1000
                     * (1000 - least(t.trap_milli, 1000))) // 1000
                    AS BIGINT) AS priority_milli
        FROM q JOIN lam USING (source) JOIN t ON t.host = q.source
    """
    out.update(_kneser_oracles())
    out.update(_lpa_oracles())
    out.update(_linkage_oracles())
    out.update(_psl_oracles())
    out["facility_location"] = _submodular_oracle()
    out.update(_coverage_oracles())
    out["conformal_threshold"] = _conformal_oracle(out)
    out["salsa_authorities"] = _salsa_oracle()
    out["event_bursts"] = _burst_oracle()
    out["robots_meta_gate"] = _robots_meta_oracle()
    out["canonical_chains"] = _canonical_oracle()
    out.update(_weighted_minhash_oracles())
    out["pii_card_audit"] = _card_audit_oracle()
    out.update(_hreflang_oracles())
    out["phrase_search"] = _phrase_search_oracle()
    out["lpt_shards"] = _lpt_oracle()
    out["embedding_outliers"] = _outlier_oracle()
    out.update(_date_oracles())
    out["bm25f_search"] = _bm25f_oracle()
    out["lexicon_profile"] = _lexicon_oracle()
    out["rouge_l_near_dups"] = _rouge_oracle()
    out["fim_samples"] = _fim_oracle()
    out["license_detect"] = _license_oracle()
    out["math_signals"] = _math_oracle()
    out["notebook_scripts"] = _notebook_oracle()
    out["repo_context"] = _repo_context_oracle()
    out["distinct_ngram_diversity"] = _diversity_oracle()
    out["semantic_decontaminate"] = _semantic_decontam_oracle()
    out["url_parallel_pairs"] = _url_parallel_oracle()
    return out


def _pack_leakage_oracle(seq_len: int = 512) -> str:
    """Twin of ops/packing.pack_leakage_audit over the certified
    sequence_packing construction (same cum/segment CTEs) with flags
    on every 41st doc."""
    return f"""
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
                   CAST(unnest(generate_series(
                       s // {seq_len}, (e - 1) // {seq_len}))
                       AS BIGINT) AS seq_id
            FROM cum WHERE n > 0
        ),
        segs AS (
            SELECT doc_id, seq_id,
                   CAST(least(e, (seq_id + 1) * {seq_len})
                        - greatest(s, seq_id * {seq_len}) AS BIGINT)
                       AS n_tokens,
                   doc_id % 41 = 0 AS fl
            FROM seg
        )
        SELECT seq_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT CASE WHEN fl THEN doc_id END)
                    AS BIGINT) AS n_flagged_docs,
               CAST(sum(CASE WHEN fl THEN n_tokens ELSE 0 END)
                    AS BIGINT) AS flagged_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               (count(DISTINCT CASE WHEN fl THEN doc_id END) > 0
                AND count(DISTINCT CASE WHEN fl THEN doc_id END)
                    < count(DISTINCT doc_id)) AS mixed
        FROM segs GROUP BY seq_id
    """


def _audit_oracles() -> dict[str, str]:
    """Twins for the input-hygiene audits (ops/audits.py): the same
    corruption chain on the embeddings side, the certified
    detected_lang CASE (tie-break = max lang string) on the text side."""
    lang_case = f"""
        CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
             WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
             WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
             WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
             ELSE 'de' END"""
    return {
        "embedding_audit": """
            WITH base AS (
                SELECT vec_id,
                       CASE
                         WHEN vec_id % 97 = 0 THEN NULL
                         WHEN vec_id % 89 = 0 THEN list_transform(
                              embedding::DOUBLE[], x -> x * 0.0)
                         WHEN vec_id % 83 = 0 THEN list_concat(
                              ['NaN'::DOUBLE],
                              (embedding::DOUBLE[])[2:64])
                         WHEN vec_id % 79 = 0
                              THEN (embedding::DOUBLE[])[1:32]
                         ELSE embedding::DOUBLE[]
                       END AS v
                FROM embeddings
            ),
            fl AS (
                SELECT
                    CASE WHEN v IS NULL THEN 1 ELSE 0 END AS f_null,
                    CASE WHEN v IS NOT NULL AND len(v) <> 64
                         THEN 1 ELSE 0 END AS f_dim,
                    CASE WHEN v IS NOT NULL
                              AND len(list_filter(v, x -> isnan(x))) > 0
                         THEN 1 ELSE 0 END AS f_nan,
                    CASE WHEN v IS NOT NULL AND len(v) = 64
                              AND len(list_filter(v, x -> isnan(x))) = 0
                         THEN CAST(list_sum(list_transform(v,
                              x -> CAST(round(x * 1000000) AS BIGINT)
                                   * CAST(round(x * 1000000) AS BIGINT)))
                              AS BIGINT) // 1024
                    END AS nk
                FROM base
            )
            SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                   CAST(sum(f_null) AS BIGINT) AS n_null_vec,
                   CAST(sum(f_nan) AS BIGINT) AS n_nan_vec,
                   CAST(sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero_vec,
                   CAST(sum(f_dim) AS BIGINT) AS n_dim_bad,
                   CAST(min(nk) AS BIGINT) AS min_norm2_kilo,
                   CAST(max(nk) AS BIGINT) AS max_norm2_kilo,
                   CAST(CAST(sum(nk) AS BIGINT)
                        // greatest(count(nk), 1) AS BIGINT)
                       AS mean_norm2_kilo
            FROM fl
        """,
        "lang_mismatch_audit": f"""
            WITH hits AS (
                SELECT source, lang,
                       {_lang_hits_sql('de')} AS h_de,
                       {_lang_hits_sql('en')} AS h_en,
                       {_lang_hits_sql('es')} AS h_es,
                       {_lang_hits_sql('fr')} AS h_fr
                FROM documents
            ),
            det AS (
                SELECT source, lang, {lang_case} AS detected
                FROM hits
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN detected <> lang
                                 AND detected <> 'und'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
                   CAST(sum(CASE WHEN detected = 'und' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_undetected,
                   CAST((sum(CASE WHEN detected <> lang
                                  AND detected <> 'und'
                             THEN 1 ELSE 0 END) * 1000) // count(*)
                        AS BIGINT) AS mismatch_milli
            FROM det GROUP BY source
        """,
    }


def _eval_attribution_oracle(n: int = 3, k: int = 5, max_df: int = 50) -> str:
    """Twin of ops/attribution.eval_attribution at the registry
    parameters: same post-filter word positions, same DISTINCT-type
    credit, same max_df stop-n-gram guard, same (shared desc, doc_id
    asc) top-k."""
    return f"""
        WITH t0 AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                       '[^a-z0-9]+'), w -> w <> '') AS ws
            FROM documents
        ),
        tg AS (
            SELECT DISTINCT doc_id,
                   array_to_string(ws[i:i+{n - 1}], ' ') AS g
            FROM t0, unnest(generate_series(
                1, greatest(len(ws) - {n - 1}, 0))) s(i)
        ),
        guard AS (
            SELECT g FROM tg GROUP BY g HAVING count(*) <= {max_df}
        ),
        tgg AS (SELECT tg.doc_id, tg.g FROM tg JOIN guard USING (g)),
        e0 AS (
            SELECT doc_id AS eval_id,
                   list_filter(string_split_regex(lower(
                       array_to_string((string_split(text, ' '))[1:12],
                                       ' ')), '[^a-z0-9]+'),
                       w -> w <> '') AS ws
            FROM documents WHERE doc_id % 17 = 0
        ),
        eg AS (
            SELECT DISTINCT eval_id,
                   array_to_string(ws[i:i+{n - 1}], ' ') AS g
            FROM e0, unnest(generate_series(
                1, greatest(len(ws) - {n - 1}, 0))) s(i)
        ),
        shared AS (
            SELECT eg.eval_id, tgg.doc_id,
                   CAST(count(*) AS BIGINT) AS shared_ngrams
            FROM eg JOIN tgg USING (g)
            GROUP BY eg.eval_id, tgg.doc_id
        ),
        ranked AS (
            SELECT eval_id, doc_id, shared_ngrams,
                   CAST(row_number() OVER (
                       PARTITION BY eval_id
                       ORDER BY shared_ngrams DESC, doc_id) AS BIGINT)
                       AS rank
            FROM shared
        )
        SELECT eval_id, doc_id, shared_ngrams, rank
        FROM ranked WHERE rank <= {k}
    """


def _contains_any(expr: str, markers: tuple[str, ...]) -> str:
    terms = " OR ".join(
        f"contains({expr}, '" + m.replace("'", "''") + "')" for m in markers
    )
    return f"({terms})"


def _governance_oracles() -> dict[str, str]:
    """Twins for the contamination scan / profile (ops/contamination.py
    — marker dims imported from the op, one source of truth) and
    dedup-cluster policy propagation (ops/governance.py)."""
    from reader_spark.ops.contamination import (
        AI_SELFREF_MARKERS,
        CHAT_TEMPLATE_MARKERS,
        REFUSAL_MARKERS,
    )

    dec = """
        dec AS (
            SELECT doc_id, source,
                   lower(text
                     || CASE WHEN doc_id % 23 = 0
                             THEN ' <|im_start|>assistant reply'
                             ELSE '' END
                     || CASE WHEN doc_id % 31 = 0
                             THEN ' As an AI language model, I think'
                             ELSE '' END
                     || CASE WHEN doc_id % 37 = 0
                             THEN ' I''m sorry, but I can''t help'
                             ELSE '' END) AS low
            FROM documents
        )
    """
    t = _contains_any("low", CHAT_TEMPLATE_MARKERS)
    s = _contains_any("low", AI_SELFREF_MARKERS)
    r = _contains_any("low", REFUSAL_MARKERS)
    return {
        "contamination_scan": f"""
            WITH {dec}
            SELECT doc_id,
                   {t} AS has_chat_template,
                   {s} AS has_ai_selfref,
                   {r} AS has_refusal,
                   ({t} OR {s} OR {r}) AS contaminated
            FROM dec
        """,
        "contamination_profile": f"""
            WITH {dec},
            fl AS (
                SELECT source,
                       CASE WHEN {t} THEN 1 ELSE 0 END AS ft,
                       CASE WHEN {s} THEN 1 ELSE 0 END AS fs,
                       CASE WHEN {r} THEN 1 ELSE 0 END AS fr
                FROM dec
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(ft) AS BIGINT) AS n_chat_template,
                   CAST(sum(fs) AS BIGINT) AS n_ai_selfref,
                   CAST(sum(fr) AS BIGINT) AS n_refusal,
                   CAST((sum(greatest(ft, fs, fr)) * 1000) // count(*)
                        AS BIGINT) AS contaminated_milli
            FROM fl GROUP BY source
        """,
        "cluster_policy_purge": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, text
                FROM documents WHERE doc_id % 3 = 0
            ),
            h AS (SELECT doc_id, md5(text) AS hh FROM corpus),
            members AS (
                SELECT c.cluster_id, h.doc_id
                FROM h JOIN (
                    SELECT hh, CAST(min(doc_id) AS BIGINT) AS cluster_id
                    FROM h GROUP BY hh
                ) c ON h.hh = c.hh
            ),
            fl AS (
                SELECT m.cluster_id, m.doc_id,
                       m.doc_id % 41 = 0 AS flagged_self
                FROM members m
            ),
            cf AS (
                SELECT cluster_id,
                       max(CASE WHEN flagged_self THEN 1 ELSE 0 END) AS c
                FROM fl GROUP BY cluster_id
            )
            SELECT fl.doc_id, fl.cluster_id, fl.flagged_self,
                   cf.c = 1 AS flagged_cluster, cf.c = 1 AS purge
            FROM fl JOIN cf ON fl.cluster_id = cf.cluster_id
        """,
    }


def _mix_schedule_oracle(n_steps: int = 500) -> str:
    """Twin of ops/interleave.mix_schedule over the _synth_domains
    weights: same integer virtual times, same (vt, domain) order; a
    plain window row_number stands in for scalable_rank at fixture
    scale (bit-identity of the two rank forms is pinned separately in
    tests/test_plans.py)."""
    return f"""
        WITH d AS (
            SELECT source AS domain,
                   CAST(100 * (1 + CAST(substr(source, 4) AS BIGINT) % 4)
                        AS BIGINT) AS weight
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM d),
        cand AS (
            SELECT domain, s.k AS k,
                   ((s.k + 1) * tw * 1000) // weight AS vt
            FROM d, tot,
                 unnest(generate_series(
                     0, ({n_steps} * weight) // tw + 2)) s(k)
        ),
        r AS (
            SELECT domain, k,
                   row_number() OVER (ORDER BY vt, domain) AS step
            FROM cand
        )
        SELECT CAST(step AS BIGINT) AS step, domain,
               CAST(k AS BIGINT) AS k
        FROM r WHERE step <= {n_steps}
    """


_QUASI_CTE = """
        q AS (
            SELECT lang, source,
                   CAST(n_chars // 100 AS BIGINT) AS len_bucket
            FROM documents
        ),
        g AS (
            SELECT lang, source, len_bucket,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM q GROUP BY lang, source, len_bucket
        )
"""


def _privacy_oracles() -> dict[str, str]:
    """k-anonymity twins (ops/privacy.py) over the (lang, source,
    length-bucket) quasi-identifier at k=5."""
    return {
        "k_anonymity_audit": f"""
            WITH {_QUASI_CTE}
            SELECT lang, source, len_bucket, n_rows,
                   n_rows < 5 AS violates
            FROM g
        """,
        "k_anonymity_summary": f"""
            WITH {_QUASI_CTE}
            SELECT CAST(5 AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(CASE WHEN n_rows < 5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violating_groups,
                   CAST(sum(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END)
                        AS BIGINT) AS n_rows_at_risk,
                   CAST(min(n_rows) AS BIGINT) AS min_group_size
            FROM g
        """,
    }


def _bootstrap_oracle(replicates: int = 32, alpha_milli: int = 50) -> str:
    """Twin of ops/bootstrap.bootstrap_mean_ci on (documents, n_chars,
    source, doc_id): the same md5-seeded Poisson(1) inverse-CDF against
    the same micro-unit thresholds, exact integer replicate means, and
    the same sorted-rank CI cut."""
    from reader_spark.ops.bootstrap import POISSON1_CDF_MICRO

    case = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(POISSON1_CDF_MICRO)
    )
    lo_idx = (alpha_milli * replicates) // 1000
    hi_idx = replicates - 1 - lo_idx
    return f"""
        WITH reps AS (
            SELECT unnest(generate_series(0, {replicates - 1})) AS replicate
        ),
        f AS (
            SELECT d.source, d.n_chars, r.replicate,
                   CAST(('0x' || substr(md5(d.doc_id || ':' || r.replicate),
                        1, 8)) AS BIGINT) % 1000000 AS u
            FROM documents d CROSS JOIN reps r
        ),
        wt AS (
            SELECT source, replicate, n_chars,
                   CASE {case} ELSE {len(POISSON1_CDF_MICRO)} END AS w
            FROM f
        ),
        rm AS (
            SELECT source, replicate,
                   CAST((CAST(sum(w * n_chars) AS BIGINT) * 1000)
                        // greatest(CAST(sum(w) AS BIGINT), 1) AS BIGINT)
                       AS rep_mean
            FROM wt GROUP BY source, replicate
        ),
        ci AS (
            SELECT source, list_sort(list(rep_mean)) AS ms
            FROM rm GROUP BY source
        ),
        pt AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST((CAST(sum(n_chars) AS BIGINT) * 1000) // count(*)
                        AS BIGINT) AS mean_milli
            FROM documents GROUP BY source
        )
        SELECT pt.source, n_rows, mean_milli,
               CAST(ms[{lo_idx + 1}] AS BIGINT) AS lo_milli,
               CAST(ms[{hi_idx + 1}] AS BIGINT) AS hi_milli,
               CAST({replicates} AS BIGINT) AS n_replicates
        FROM pt JOIN ci ON pt.source = ci.source
    """


def _doremi_oracle(taylor_terms: int = 12) -> str:
    """Twin of ops/allocate.doremi_reweight at the registry parameters
    (eta=1000 so z == clamped excess): the SAME integer Taylor
    recurrence unrolled as one nested expression — non-negative
    throughout, so DuckDB's floor-div == Spark's trunc-div."""
    t = "1000000"
    terms = [t]
    for n in range(1, taylor_terms):
        t = f"(({t}) * z_milli) // {1000 * n}"
        terms.append(t)
    expsum = " + ".join(f"({x})" for x in terms)
    return f"""
        WITH d AS (
            SELECT source AS domain,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS available_tokens
            FROM documents GROUP BY source
        ),
        base AS (
            SELECT domain,
                   CAST(greatest(0, 2000 + (available_tokens % 7) * 400
                                    - 2600) AS BIGINT) AS excess_milli
            FROM d
        ),
        zc AS (
            SELECT domain, excess_milli,
                   CAST(least(excess_milli, 5000) AS BIGINT) AS z_milli
            FROM base
        ),
        ex AS (
            SELECT domain, excess_milli, z_milli,
                   CAST({expsum} AS BIGINT) AS exp_micro
            FROM zc
        ),
        tot AS (SELECT CAST(sum(exp_micro) AS BIGINT) AS z FROM ex)
        SELECT domain, excess_milli, z_milli, exp_micro,
               CAST((exp_micro * 1000) // z AS BIGINT) AS weight_milli
        FROM ex, tot
    """


def _bitext_csls_oracle(knn: int = 3) -> str:
    """Twin of ops/bitext.bitext_mine_csls (brute candidates, knn=3):
    the same integer-scaled CSLS margin 2*k*dot - rx - ry with rx/ry
    the top-k candidate-dot sums per endpoint, same two-phase
    elections, and the elected pair's own dot fetched by join-back."""
    return f"""
        WITH qv AS (
            SELECT vec_id, vec_id % 2 AS par,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000) AS BIGINT)) AS q
            FROM embeddings
        ),
        cand AS (
            SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
                   CAST(list_sum(list_transform(
                       range(1, len(s.q) + 1),
                       i -> s.q[i] * t.q[i])) AS BIGINT) AS dot
            FROM qv s JOIN qv t ON s.par = 0 AND t.par = 1
        ),
        rx AS (
            SELECT src_id,
                   CAST(list_sum(list_reverse_sort(list(dot))[1:{knn}])
                        AS BIGINT) AS rx
            FROM cand GROUP BY src_id
        ),
        ry AS (
            SELECT tgt_id,
                   CAST(list_sum(list_reverse_sort(list(dot))[1:{knn}])
                        AS BIGINT) AS ry
            FROM cand GROUP BY tgt_id
        ),
        sc AS (
            SELECT c.src_id, c.tgt_id, c.dot,
                   CAST(2 * {knn} * c.dot - rx.rx - ry.ry AS BIGINT)
                       AS margin
            FROM cand c
            JOIN rx ON c.src_id = rx.src_id
            JOIN ry ON c.tgt_id = ry.tgt_id
        ),
        fb AS (SELECT src_id, max(margin) AS b FROM sc GROUP BY src_id),
        fwd AS (
            SELECT s.src_id, min(s.tgt_id) AS tgt_id,
                   max(s.margin) AS margin
            FROM sc s JOIN fb ON s.src_id = fb.src_id
                      AND s.margin = fb.b
            GROUP BY s.src_id
        ),
        bb AS (SELECT tgt_id, max(margin) AS b FROM sc GROUP BY tgt_id),
        bwd AS (
            SELECT s.tgt_id, min(s.src_id) AS src_id
            FROM sc s JOIN bb ON s.tgt_id = bb.tgt_id
                      AND s.margin = bb.b
            GROUP BY s.tgt_id
        )
        SELECT f.src_id, f.tgt_id,
               sc.dot AS dot_micro2,
               f.margin AS margin_micro2
        FROM fwd f
        JOIN bwd b ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id
        JOIN sc ON sc.src_id = f.src_id AND sc.tgt_id = f.tgt_id
    """


def _bitext_oracle(bucketed: bool, planes: int = 4) -> str:
    """Mutual-NN bitext mining twin (ops/bitext.py): same micro-unit
    integer dots, same two-phase argmax with min-id tie-breaks, same
    vec_id-parity language split; the bucketed form restricts candidates
    to shared md5-hyperplane buckets (identical plane literals on both
    engines — the _md5_bucket_terms discipline)."""
    if bucketed:
        bucket = f"{_md5_bucket_terms(planes=planes)}"
        join_on = "s.bucket = t.bucket"
    else:
        bucket = "0"
        join_on = "1 = 1"
    return f"""
        WITH qv AS (
            SELECT vec_id, vec_id % 2 AS par,
                   embedding::DOUBLE[] AS v
            FROM embeddings
        ),
        iq AS (
            SELECT vec_id, par,
                   {bucket} AS bucket,
                   list_transform(v,
                       x -> CAST(round(x * 1000000) AS BIGINT)) AS q
            FROM qv
        ),
        cand AS (
            SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
                   CAST(list_sum(list_transform(
                       range(1, len(s.q) + 1),
                       i -> s.q[i] * t.q[i])) AS BIGINT) AS dot
            FROM iq s JOIN iq t
              ON s.par = 0 AND t.par = 1 AND {join_on}
        ),
        fb AS (SELECT src_id, max(dot) AS b FROM cand GROUP BY src_id),
        fwd AS (
            SELECT c.src_id, min(c.tgt_id) AS tgt_id, max(c.dot) AS dot
            FROM cand c JOIN fb ON c.src_id = fb.src_id AND c.dot = fb.b
            GROUP BY c.src_id
        ),
        bb AS (SELECT tgt_id, max(dot) AS b FROM cand GROUP BY tgt_id),
        bwd AS (
            SELECT c.tgt_id, min(c.src_id) AS src_id
            FROM cand c JOIN bb ON c.tgt_id = bb.tgt_id AND c.dot = bb.b
            GROUP BY c.tgt_id
        )
        SELECT f.src_id, f.tgt_id, f.dot AS dot_micro2
        FROM fwd f JOIN bwd b
          ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id
    """


def _kmeans_oracle(k: int = 8, n_iter: int = 3) -> str:
    """Unrolled Lloyd iterations twinning ops/kmeans.kmeans_fit: same
    micro-unit quantization, same packed ``dist*64+cluster`` argmin
    (ties -> smallest cluster id), same ``floor(sum/n)`` centroid
    update with empty clusters keeping their previous centroid, same
    kilo-unit inertia. All distances are exact integer sums, so the
    only float op — floor of an exact-integer double division — is
    IEEE-identical in both engines."""

    def assign(prev: str, name: str, with_dist: bool = False) -> str:
        dist_col = (
            f",\n                   CAST(min(dist * 64 + cluster) // 64"
            f" AS BIGINT) AS dist" if with_dist else ""
        )
        return f"""
        {name} AS (
            SELECT vec_id,
                   CAST(min(dist * 64 + cluster) % 64 AS BIGINT)
                       AS cluster{dist_col}
            FROM (
                SELECT q.vec_id, c.cluster,
                       CAST(list_sum(list_transform(
                           range(1, len(q.v) + 1),
                           i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i])))
                           AS BIGINT) AS dist
                FROM qv q CROSS JOIN {prev} c
            ) GROUP BY vec_id
        )"""

    def update(a: str, prev: str, name: str) -> str:
        return f"""
        {name}_m AS (
            SELECT cluster, pos,
                   CAST(floor(CAST(sum(comp) AS BIGINT) / count(*))
                        AS BIGINT) AS m
            FROM (
                SELECT a.cluster, generate_subscripts(q.v, 1) AS pos,
                       unnest(q.v) AS comp
                FROM {a} a JOIN qv q USING (vec_id)
            ) GROUP BY cluster, pos
        ),
        {name} AS (
            SELECT p.cluster, coalesce(mm.c, p.c) AS c
            FROM {prev} p LEFT JOIN (
                SELECT cluster, list(m ORDER BY pos) AS c
                FROM {name}_m GROUP BY cluster
            ) mm USING (cluster)
        )"""

    parts = [
        f"""
        qv AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000) AS BIGINT)) AS v
            FROM embeddings
        ),
        c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                       AS cluster, v AS c
            FROM (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT {k})
        )"""
    ]
    for it in range(1, n_iter + 1):
        parts.append(assign(f"c{it - 1}", f"a{it}"))
        parts.append(update(f"a{it}", f"c{it - 1}", f"c{it}"))
    parts.append(assign(f"c{n_iter}", "af", with_dist=True))
    ctes = ",".join(parts)
    return f"""
        WITH {ctes}
        SELECT a.cluster,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(a.dist // 1024) AS BIGINT) AS inertia_kilo,
               any_value(c.c) AS centroid
        FROM af a JOIN c{n_iter} c USING (cluster)
        GROUP BY a.cluster
    """


# Shared CTE rebuilding queries/code.synth_code_files exactly: words
# re-lined 5 per line (pos // 5 == the greedy regex chunker on the
# single-spaced corpus), the SAME first-match-wins decoration CASE, and
# newline reassembly. Stats mirror ops/code.code_file_stats in integer
# milli-units (Spark's double-div-then-cast == DuckDB // for these
# magnitudes; proven safe: rounding-up-to-integer needs den > 5e10).
_CODE_FILES_CTE = """
        w0 AS (
            SELECT doc_id,
                   generate_subscripts(
                       string_split_regex(trim(text), '\\s+'), 1) - 1 AS pos,
                   unnest(string_split_regex(trim(text), '\\s+')) AS word
            FROM documents
        ),
        l0 AS (
            SELECT doc_id, pos // 5 AS line_no,
                   string_agg(word, ' ' ORDER BY pos) AS line
            FROM w0 GROUP BY doc_id, pos // 5
        ),
        dec AS (
            SELECT doc_id, line_no,
                   CASE
                     WHEN doc_id % 17 = 0 AND line_no = 0
                       THEN '// auto-generated do not edit'
                     WHEN doc_id % 29 = 0 AND line_no = 0
                       THEN line || repeat(chr(10) || '~!@#$%+=[]{}', 100)
                     WHEN doc_id % 37 = 0 AND line_no = 1
                       THEN line || repeat('x', 1200)
                     WHEN doc_id % 13 = 0 AND line_no = 2
                       THEN line || ' ' || trim(repeat(
                            'deadbeefcafebabe0123456789abcdef ', 12))
                     WHEN doc_id % 31 = 0 THEN line || repeat('y', 150)
                     WHEN line_no % 4 = 1
                       THEN (CASE WHEN doc_id % 5 = 0 THEN '# '
                                  ELSE '// ' END) || line
                     ELSE line
                   END AS line
            FROM l0
        ),
        files AS (
            SELECT doc_id,
                   'src/m' || doc_id || '.' ||
                   CASE doc_id % 5 WHEN 0 THEN 'py' WHEN 1 THEN 'js'
                        WHEN 2 THEN 'ts' WHEN 3 THEN 'c'
                        ELSE 'json' END AS path,
                   string_agg(line, chr(10) ORDER BY line_no) AS content
            FROM dec GROUP BY doc_id
        ),
        st0 AS (
            SELECT doc_id, path, content,
                   lower(regexp_extract(path, '\\.([A-Za-z0-9]+)$', 1))
                       AS ext,
                   string_split(content, chr(10)) AS lines,
                   CAST(length(content) AS BIGINT) AS n_chars,
                   CASE WHEN length(trim(content)) = 0 THEN []
                        ELSE string_split_regex(trim(content), '\\s+')
                   END AS words,
                   lower(substr(content, 1, 200)) AS head
            FROM files
        ),
        stats AS (
            SELECT doc_id, path, ext,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   n_chars,
                   CAST(coalesce(list_max(
                       list_transform(lines, x -> length(x))), 0)
                       AS BIGINT) AS max_line_len,
                   CAST((n_chars - len(lines) + 1) * 1000
                        // greatest(len(lines), 1) AS BIGINT)
                       AS avg_line_milli,
                   CAST((n_chars - length(regexp_replace(
                            content, '[A-Za-z0-9]', '', 'g'))) * 1000
                        // greatest(n_chars, 1) AS BIGINT) AS alnum_milli,
                   CAST(len(list_filter(words, ww ->
                            regexp_full_match(ww, '[0-9a-f]{16,}')))
                        * 1000 // greatest(len(words), 1) AS BIGINT)
                       AS hex_milli,
                   CAST(len(list_filter(lines, l ->
                            starts_with(ltrim(l), '#')
                            OR starts_with(ltrim(l), '//')
                            OR starts_with(ltrim(l), '--')
                            OR starts_with(ltrim(l), '/*'))) * 1000
                        // greatest(len(lines), 1) AS BIGINT)
                       AS comment_milli,
                   CAST(len(words) AS BIGINT) AS n_words,
                   (contains(head, 'auto-generated')
                    OR contains(head, 'do not edit')
                    OR contains(head, 'generated by')) AS autogen
            FROM st0
        ),
        gated AS (
            SELECT *,
                   CASE WHEN autogen THEN 'autogenerated'
                        WHEN max_line_len > 1000 THEN 'long_line'
                        WHEN alnum_milli < 250 THEN 'low_alnum'
                        WHEN hex_milli > 150 THEN 'hex_blob'
                        WHEN avg_line_milli > 100000 THEN 'avg_line'
                        ELSE 'ok' END AS reason
            FROM stats
        )
"""


def _code_oracles() -> dict[str, str]:
    """DuckDB twins for the code-curation layer (ops/code.py): The-Stack
    / StarCoder file filters over the synthesized code corpus."""
    return {
        "code_file_stats": f"""
            WITH {_CODE_FILES_CTE}
            SELECT doc_id, path, ext, n_lines, n_chars, max_line_len,
                   avg_line_milli, alnum_milli, hex_milli, comment_milli,
                   n_words, autogen
            FROM stats
        """,
        "code_quality_gate": f"""
            WITH {_CODE_FILES_CTE}
            SELECT doc_id, ext, reason, reason = 'ok' AS keep
            FROM gated
        """,
        "code_language_profile": f"""
            WITH {_CODE_FILES_CTE}
            SELECT CASE ext WHEN 'py' THEN 'python'
                        WHEN 'js' THEN 'javascript'
                        WHEN 'ts' THEN 'typescript'
                        WHEN 'c' THEN 'c' WHEN 'h' THEN 'c'
                        WHEN 'json' THEN 'json'
                        WHEN 'md' THEN 'markdown'
                        ELSE 'other' END AS language,
                   CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN reason = 'ok' THEN n_chars
                                 ELSE 0 END) AS BIGINT) AS kept_chars,
                   CAST(max(max_line_len) AS BIGINT) AS max_line_len
            FROM gated GROUP BY 1
        """,
    }


_CHAT_TURNS_CTE = """
        segs AS (
            SELECT doc_id AS conv_id, string_split(text, ' ') AS l
            FROM documents
        ),
        turns AS (
            SELECT conv_id,
                   CAST(i - 1 AS BIGINT) AS turn_idx,
                   CASE WHEN (i - 1) % 2 = 0 THEN 'user'
                        ELSE 'assistant' END AS role,
                   array_to_string(l[(i-1)*8+1:(i-1)*8+8], ' ') AS content
            FROM segs,
                 unnest(generate_series(
                     1, least(6, (len(l) + 7) // 8))) s(i)
        )
"""


def _chat_oracles() -> dict[str, str]:
    """DuckDB twins for the SFT/chat layer (ops/chat.py): the turns CTE
    rebuilds queries/chat.synth_turns exactly (string_split on '. ',
    first 6 segments, alternating roles), then each oracle mirrors the
    operator's integer/char math. regexp_replace needs the 'g' flag
    (DuckDB replaces first match only by default; Spark replaces all)."""
    rendered = "'<|' || role || '|>' || content || '<|end|>'"
    thread_chains = """
        WITH RECURSIVE msgs AS (
            SELECT doc_id AS msg_id,
                   CASE WHEN doc_id % 101 = 7 THEN doc_id + 500000
                        WHEN doc_id % 13 = 0 THEN NULL
                        ELSE doc_id - (doc_id % 13)
                             + ((doc_id % 13 - 1) // 3) END AS parent_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'user'
                        ELSE 'assistant' END AS role,
                   substr(text, 1, 40) AS text
            FROM documents
        ),
        leaves AS (
            SELECT msg_id FROM msgs
            WHERE msg_id NOT IN (SELECT parent_id FROM msgs
                                 WHERE parent_id IS NOT NULL)
        ),
        walk(chain_id, node, anc, pos_up) AS (
            SELECT m.msg_id, m.msg_id, m.parent_id, 0
            FROM msgs m JOIN leaves l ON m.msg_id = l.msg_id
            UNION ALL
            SELECT w.chain_id, m.msg_id, m.parent_id, w.pos_up + 1
            FROM walk w JOIN msgs m ON w.anc = m.msg_id
            WHERE w.pos_up + 1 < 16
        ),
        agg AS (
            SELECT chain_id,
                   CAST(count(*) AS BIGINT) AS depth,
                   arg_max(node, pos_up) AS root_id,
                   arg_max(coalesce(anc, -999999), pos_up) <> -999999
                       AS truncated
            FROM walk GROUP BY chain_id
        )
        SELECT w.chain_id,
               CAST(a.depth - 1 - w.pos_up AS BIGINT) AS pos,
               w.node AS msg_id, a.root_id, a.depth, a.truncated,
               m.role, m.text
        FROM walk w
        JOIN agg a ON w.chain_id = a.chain_id
        JOIN msgs m ON w.node = m.msg_id
    """
    return {
        "thread_chains": thread_chains,
        "chat_render": f"""
            WITH {_CHAT_TURNS_CTE},
            r AS (
                SELECT conv_id, turn_idx, {rendered} AS rt FROM turns
            )
            SELECT conv_id,
                   string_agg(rt, '' ORDER BY turn_idx) AS chat_text,
                   CAST(length(string_agg(rt, '' ORDER BY turn_idx))
                        AS BIGINT) AS n_chars,
                   CAST(count(*) AS BIGINT) AS n_turns
            FROM r GROUP BY conv_id
        """,
        "chat_loss_masks": f"""
            WITH {_CHAT_TURNS_CTE}
            SELECT conv_id, turn_idx, role,
                   CAST(coalesce(sum(length({rendered})) OVER (
                            PARTITION BY conv_id ORDER BY turn_idx
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)
                        + length('<|' || role || '|>')
                        AS BIGINT) AS start_char,
                   CAST(coalesce(sum(length({rendered})) OVER (
                            PARTITION BY conv_id ORDER BY turn_idx
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)
                        + length('<|' || role || '|>')
                        + length(content)
                        AS BIGINT) AS end_char,
                   role = 'assistant' AS trainable
            FROM turns
        """,
        "chat_turn_dedup": f"""
            WITH {_CHAT_TURNS_CTE},
            a AS (
                SELECT conv_id, turn_idx,
                       md5(trim(regexp_replace(lower(content),
                                               '\\s+', ' ', 'g'))) AS h,
                       conv_id * 1000000 + turn_idx AS packed
                FROM turns WHERE role = 'assistant'
            ),
            g AS (
                SELECT h, min(packed) AS canon_packed,
                       CAST(count(*) AS BIGINT) AS n_copies
                FROM a GROUP BY h
            )
            SELECT conv_id, turn_idx,
                   CAST(canon_packed // 1000000 AS BIGINT) AS canon_conv,
                   CAST(canon_packed % 1000000 AS BIGINT) AS canon_turn,
                   n_copies,
                   packed = canon_packed AS is_canonical
            FROM a JOIN g USING (h)
        """,
        "chat_stats": f"""
            WITH {_CHAT_TURNS_CTE},
            t AS (
                SELECT conv_id, turn_idx, role,
                       CAST(length(content) AS BIGINT) AS clen,
                       CASE WHEN role = lag(role) OVER (
                                PARTITION BY conv_id ORDER BY turn_idx)
                            THEN 1 ELSE 0 END AS same_as_prev
                FROM turns
            )
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_user,
                   CAST(sum(CASE WHEN role = 'assistant' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_assistant,
                   arg_min(role, turn_idx) = 'user' AS starts_with_user,
                   arg_max(role, turn_idx) = 'assistant'
                       AS ends_with_assistant,
                   sum(same_as_prev) = 0 AS alternates,
                   CAST((1000 * sum(CASE WHEN role = 'assistant'
                                    THEN clen ELSE 0 END))
                        // greatest(sum(clen), 1)
                        AS BIGINT) AS assistant_char_milli
            FROM t GROUP BY conv_id
        """,
    }


_RESPONSES_CTE = """
        segs AS (
            SELECT doc_id AS prompt_id, string_split(text, ' ') AS l
            FROM documents
        ),
        resp AS (
            SELECT prompt_id,
                   CAST(k - 1 AS BIGINT) AS response_id,
                   array_to_string(l[1:8], ' ') AS prompt,
                   array_to_string(l[(k-1)*12+9:(k-1)*12+20], ' ')
                       AS response
            FROM segs,
                 unnest(generate_series(
                     1, least(4, (len(l) - 8) // 12))) s(k)
        ),
        scored AS (
            SELECT *,
                   CAST(length(response) * 1000
                        + ascii(substr(response, 1, 1)) AS BIGINT)
                       AS score_milli
            FROM resp
        )
"""

_PAIRS_CTE = """
        packed AS (
            SELECT prompt_id,
                   score_milli * 1000000 + (999999 - response_id) AS hi,
                   score_milli * 1000000 + response_id AS lo
            FROM scored
        ),
        pairs AS (
            SELECT prompt_id,
                   CAST(999999 - mh % 1000000 AS BIGINT) AS chosen_id,
                   CAST(ml % 1000000 AS BIGINT) AS rejected_id,
                   CAST(mh // 1000000 AS BIGINT) AS chosen_score,
                   CAST(ml // 1000000 AS BIGINT) AS rejected_score,
                   CAST(mh // 1000000 - ml // 1000000 AS BIGINT)
                       AS margin_milli
            FROM (SELECT prompt_id, max(hi) AS mh, min(lo) AS ml
                  FROM packed GROUP BY prompt_id)
            WHERE mh // 1000000 - ml // 1000000 > 0
        )
"""

_DPO_CTE = """
        j AS (
            SELECT s.prompt_id, s.response_id, s.prompt, s.response,
                   p.chosen_id, p.rejected_id, p.margin_milli
            FROM scored s JOIN pairs p USING (prompt_id)
            WHERE s.response_id = p.chosen_id
               OR s.response_id = p.rejected_id
        ),
        dpo AS (
            SELECT prompt_id,
                   max(CASE WHEN response_id = chosen_id THEN
                       '<|user|>' || prompt || '<|end|><|assistant|>'
                       || response || '<|end|>' END) AS chosen_text,
                   max(CASE WHEN response_id = rejected_id THEN
                       '<|user|>' || prompt || '<|end|><|assistant|>'
                       || response || '<|end|>' END) AS rejected_text,
                   CAST(max(CASE WHEN response_id = chosen_id
                            THEN length(response) END) AS BIGINT)
                       AS chosen_len,
                   CAST(max(CASE WHEN response_id = rejected_id
                            THEN length(response) END) AS BIGINT)
                       AS rejected_len,
                   margin_milli
            FROM j GROUP BY prompt_id, margin_milli
        )
"""


def _preference_oracles() -> dict[str, str]:
    """DuckDB twins for the preference/RLHF layer (ops/preference.py).
    The scored CTE rebuilds queries/preference.synth_responses exactly
    (first-8-token prompt, full 12-token response windows, max 4,
    length*1000+ascii score); the pairs CTE mirrors the packed-long
    (score, id) election bit-for-bit, so tie-breaks are certified, not
    just scores."""
    return {
        "preference_pairs": f"""
            WITH {_RESPONSES_CTE}, {_PAIRS_CTE}
            SELECT * FROM pairs
        """,
        "dpo_render": f"""
            WITH {_RESPONSES_CTE}, {_PAIRS_CTE}, {_DPO_CTE}
            SELECT prompt_id, chosen_text, rejected_text,
                   chosen_len, rejected_len, margin_milli
            FROM dpo
        """,
        "best_of_n": f"""
            WITH {_RESPONSES_CTE}
            SELECT * FROM (
                SELECT prompt_id, response_id, score_milli,
                       CAST(row_number() OVER (
                           PARTITION BY prompt_id
                           ORDER BY score_milli DESC, response_id
                       ) AS BIGINT) AS rank
                FROM scored
            ) WHERE rank <= 3
        """,
        "pair_length_bias": f"""
            WITH {_RESPONSES_CTE}, {_PAIRS_CTE}, {_DPO_CTE}
            SELECT CAST(margin_milli // 5000 AS BIGINT) AS margin_bucket,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(CASE WHEN chosen_len > rejected_len
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_chosen_longer,
                   CAST((1000 * sum(CASE WHEN chosen_len > rejected_len
                                    THEN 1 ELSE 0 END)) // count(*)
                        AS BIGINT) AS chosen_longer_milli,
                   CAST(sum(margin_milli) // count(*) AS BIGINT)
                       AS mean_margin_milli
            FROM dpo GROUP BY 1
        """,
    }


def _accounting_oracles() -> dict[str, str]:
    """DuckDB twins for the training-budget accounting queries
    (queries/accounting.py): the domain dim rebuilds _synth_domains
    exactly (source groups, whitespace token sums, 100*(1+idx%4)
    weights, 150k budget), and vocab_coverage mirrors the log2-bucket
    construction — ceil(log2(rank)) buckets identically in both engines
    because IEEE log2 is exact at powers of two (the only integer
    crossings)."""
    return {
        "epoch_schedule": """
            WITH d AS (
                SELECT source AS domain,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                           AS available_tokens,
                       CAST(100 * (1 + CAST(substr(source, 4) AS BIGINT)
                                   % 4) AS BIGINT) AS weight
                FROM documents GROUP BY source
            ),
            tw AS (SELECT CAST(sum(weight) AS BIGINT) AS total_w FROM d),
            t AS (
                SELECT domain, available_tokens, weight,
                       CAST((weight * 150000) // total_w AS BIGINT)
                           AS target_tokens
                FROM d, tw
            )
            SELECT domain, available_tokens, weight, target_tokens,
                   CAST((1000 * target_tokens)
                        // greatest(available_tokens, 1) AS BIGINT)
                       AS epochs_milli,
                   CAST(least(target_tokens, available_tokens) AS BIGINT)
                       AS unique_tokens,
                   CAST(greatest(0, target_tokens - available_tokens)
                        AS BIGINT) AS repeated_tokens,
                   CAST(greatest(0, target_tokens
                                 - (available_tokens * 4000) // 1000)
                        AS BIGINT) AS excess_tokens,
                   target_tokens > (available_tokens * 4000) // 1000
                       AS over_cap
            FROM t
        """,
        "vocab_coverage": """
            WITH tok AS (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM documents
            ),
            freqs AS (
                SELECT token, CAST(count(*) AS BIGINT) AS freq
                FROM tok WHERE token <> '' GROUP BY token
            ),
            ranked AS (
                SELECT freq,
                       row_number() OVER (ORDER BY freq DESC, token)
                           AS rank
                FROM freqs
            ),
            b AS (
                SELECT CASE WHEN rank = 1 THEN 0
                            ELSE CAST(ceil(log2(rank)) AS BIGINT)
                       END AS j, freq
                FROM ranked
            ),
            pb AS (
                SELECT j, CAST(count(*) AS BIGINT) AS bucket_types,
                       CAST(sum(freq) AS BIGINT) AS bucket_occ
                FROM b GROUP BY j
            ),
            cum AS (
                SELECT a.j,
                       CAST(sum(b.bucket_types) AS BIGINT) AS n_types,
                       CAST(sum(b.bucket_occ) AS BIGINT)
                           AS covered_occurrences
                FROM pb a JOIN pb b ON b.j <= a.j GROUP BY a.j
            ),
            tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM freqs)
            SELECT CAST(1::BIGINT << j AS BIGINT) AS k_cut,
                   n_types, covered_occurrences,
                   CAST((1000 * covered_occurrences) // total AS BIGINT)
                       AS coverage_milli
            FROM cum, tot
        """,
    }


def _bpe_costs_ctes(materialized: bool = False) -> str:
    """Shared CTE: per-doc exact BPE cost + shard (doc_id % 8) — the
    cost table the batching/packing oracles consume. ``materialized``
    pins every stage (REQUIRED under WITH RECURSIVE: an un-materialized
    cost chain re-evaluates per recursion step — sf0.1 went from >15 min
    to 2 s)."""
    m = "MATERIALIZED " if materialized else ""
    return f"""
        {_BPE_WORDS_CTE},
        enc AS {m}(SELECT doc_id, {_bpe_word_sql('word')} AS s FROM w),
        cnt AS {m}(
            SELECT doc_id,
                   CAST(sum((length(s) - length(replace(s, '|', ''))) // 2)
                        AS BIGINT) AS bpe_tokens
            FROM enc GROUP BY doc_id
        ),
        costs AS {m}(
            SELECT d.doc_id, CAST(d.doc_id % 8 AS BIGINT) AS shard,
                   COALESCE(c.bpe_tokens, 0) AS bpe_tokens
            FROM documents d LEFT JOIN cnt c USING (doc_id)
        )
    """


def _length_batches_oracle() -> str:
    return f"""
        WITH {_bpe_costs_ctes()},
        ranked AS (
            SELECT shard, doc_id, bpe_tokens,
                   CAST((row_number() OVER (
                       PARTITION BY shard ORDER BY bpe_tokens DESC, doc_id
                   ) - 1) // 8 AS BIGINT) AS batch_id
            FROM costs
        )
        SELECT shard, batch_id,
               CAST(count(*) AS BIGINT) AS n_items,
               max(bpe_tokens) AS max_cost,
               CAST(sum(bpe_tokens) AS BIGINT) AS sum_cost,
               CAST(count(*) * max(bpe_tokens) - sum(bpe_tokens) AS BIGINT)
                   AS padding_waste
        FROM ranked GROUP BY shard, batch_id
    """


def _batch_padding_compare_oracle() -> str:
    def leg(name: str, order: str) -> str:
        return f"""
        SELECT '{name}' AS strategy,
               CAST(count(*) AS BIGINT) AS n_batches,
               CAST(sum(s) AS BIGINT) AS sum_cost,
               CAST(sum(n * m) AS BIGINT) AS padded_cost,
               round((sum(n * m) - sum(s)) / sum(n * m), 6) AS waste_frac
        FROM (
            SELECT shard, batch_id, count(*) AS n,
                   max(bpe_tokens) AS m, sum(bpe_tokens) AS s
            FROM (
                SELECT shard, doc_id, bpe_tokens,
                       (row_number() OVER (
                           PARTITION BY shard ORDER BY {order}
                       ) - 1) // 8 AS batch_id
                FROM costs
            ) GROUP BY shard, batch_id
        )"""

    return f"""
        WITH {_bpe_costs_ctes()}
        {leg('length_grouped', 'bpe_tokens DESC, doc_id')}
        UNION ALL
        {leg('id_ordered', 'doc_id')}
    """


def _nextfit_packing_oracle(capacity: int = 512) -> str:
    return f"""
        WITH RECURSIVE {_bpe_costs_ctes(materialized=True)},
        t AS MATERIALIZED (
            SELECT shard, doc_id, bpe_tokens,
                   row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
            FROM costs
        ),
        r AS (
            SELECT shard, rn, doc_id, bpe_tokens,
                   CAST(0 AS BIGINT) AS bin_id, bpe_tokens AS fill
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.shard, t.rn, t.doc_id, t.bpe_tokens,
                   CASE WHEN r.fill + t.bpe_tokens <= {capacity}
                        THEN r.bin_id ELSE r.bin_id + 1 END,
                   CASE WHEN r.fill + t.bpe_tokens <= {capacity}
                        THEN r.fill + t.bpe_tokens ELSE t.bpe_tokens END
            FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1
        )
        SELECT shard, doc_id, bpe_tokens AS cost, bin_id,
               fill AS bin_fill, bpe_tokens > {capacity} AS oversize
        FROM r
    """


def _bpe_learn_merges_oracle(k: int = 12) -> str:
    """BPE training as k unrolled MATERIALIZED rounds (plain CTEs
    re-inline exponentially — the hits_domains lesson): w{i} is the
    word-frequency dim after i merges, p{i} the adjacent-pair counts,
    b{i} the argmax with the (count desc, lhs, rhs) tie-break."""
    parts = [
        r"""
        WITH w0 AS MATERIALIZED (
            SELECT regexp_replace(word, '(.)', '|\1|', 'g') || '|</w>|' AS s,
                   CAST(count(*) AS BIGINT) AS c
            FROM (
                SELECT unnest(list_filter(
                    string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> ''
                )) AS word
                FROM documents
            ) GROUP BY 1
        )"""
    ]
    for i in range(1, k + 1):
        parts.append(f""",
        p{i} AS MATERIALIZED (
            SELECT pr[1] AS lhs, pr[2] AS rhs,
                   CAST(sum(c) AS BIGINT) AS pair_count
            FROM (
                SELECT unnest(list_zip(sy[1:len(sy)-1], sy[2:len(sy)])) AS pr, c
                FROM (
                    SELECT string_split(s[2:len(s)-1], '||') AS sy, c
                    FROM w{i - 1}
                )
            ) GROUP BY 1, 2
        ),
        b{i} AS MATERIALIZED (
            SELECT {i - 1} AS merge_rank, lhs, rhs, pair_count FROM p{i}
            ORDER BY pair_count DESC, lhs, rhs LIMIT 1
        ),
        w{i} AS MATERIALIZED (
            SELECT replace(s, '|' || b.lhs || '||' || b.rhs || '|',
                           '|' || b.lhs || b.rhs || '|') AS s, c
            FROM w{i - 1}, b{i} b
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs, pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + "\n" + union


def _bpe_word_sql(expr: str) -> str:
    """The exact-BPE encode of one lowercase word as DuckDB SQL — the
    SAME chained-replace construction over the |sym| rendering that
    ops/bpe.py compiles for Spark, generated from the SAME literal merge
    table (one tokenizer, two engines)."""
    from reader_spark.ops.bpe import DEFAULT_MERGES

    s = f"(regexp_replace({expr}, '(.)', '|\\1|', 'g') || '|</w>|')"
    for l, r in DEFAULT_MERGES:
        s = f"replace({s}, '|{l}||{r}|', '|{l}{r}|')"
    return s


_BPE_WORDS_CTE = r"""
    w AS (
        SELECT doc_id,
               unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''
               )) AS word
        FROM documents
    )
"""


def _bpe_token_counts_oracle() -> str:
    return f"""
        WITH {_BPE_WORDS_CTE},
        enc AS (SELECT doc_id, {_bpe_word_sql('word')} AS s FROM w),
        cnt AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum((length(s) - length(replace(s, '|', ''))) // 2)
                        AS BIGINT) AS bpe_tokens
            FROM enc GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(c.n_words, 0) AS n_words,
               COALESCE(c.bpe_tokens, 0) AS bpe_tokens,
               CASE WHEN COALESCE(c.n_words, 0) > 0
                    THEN round(c.bpe_tokens / c.n_words, 6) END AS fertility
        FROM documents d LEFT JOIN cnt c USING (doc_id)
    """


def _bpe_sequence_packing_oracle() -> str:
    return f"""
        WITH {_BPE_WORDS_CTE},
        enc AS (SELECT doc_id, {_bpe_word_sql('word')} AS s FROM w),
        cnt AS (
            SELECT doc_id,
                   CAST(sum((length(s) - length(replace(s, '|', ''))) // 2)
                        AS BIGINT) AS n
            FROM enc GROUP BY doc_id
        ),
        toks AS (
            SELECT d.doc_id, d.doc_id % 8 AS shard, COALESCE(c.n, 0) AS n
            FROM documents d LEFT JOIN cnt c USING (doc_id)
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
    """


def _bpe_encode_sample_oracle() -> str:
    return f"""
        WITH w AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''
                   )) AS word
            FROM documents WHERE doc_id < 25
        )
        SELECT doc_id, word,
               trim(replace({_bpe_word_sql('word')}, '||', ' '), '|') AS token_str
        FROM w
    """


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


def _text_clusters_oracle() -> str:
    return _FH_CTES + """,
        unitv AS (
            SELECT d.doc_id,
                   list(CASE WHEN n.nn > 0 THEN round(d.v / n.nn, 6) ELSE d.v END
                        ORDER BY d.i) AS v
            FROM dense d JOIN nrm n USING (doc_id) GROUP BY d.doc_id
        ),
        cents AS (SELECT doc_id AS cid, v AS cv FROM unitv WHERE doc_id < 8),
        scored AS (
            SELECT u.doc_id, c.cid,
                   COALESCE(round(list_cosine_similarity(u.v, c.cv), 4), -2.0)
                       AS cosine
            FROM unitv u CROSS JOIN cents c
        ),
        ranked AS (
            SELECT doc_id, cid, cosine,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY cosine DESC, cid ASC
                   ) AS rn
            FROM scored
        )
        SELECT doc_id, CAST(cid AS BIGINT) AS cluster, cosine
        FROM ranked WHERE rn = 1
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


# The SQL-predictable span sequence the interleaved wrapper produces (see
# __spark_entry__._interleaved_spans): shared by interleaved_media_spans,
# caption_pairs, interleave_profile.
_INTERLEAVED_SPANS_SQL = """
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
        "binary_recall_eval": """
            WITH coded AS (
                SELECT vec_id, embedding::DOUBLE[] AS v,
                       CAST(list_sum(list_transform(generate_series(0, 31),
                            i -> CASE WHEN (embedding::DOUBLE[])[i + 1] > 0
                                      THEN 1::BIGINT << (31 - i)
                                      ELSE 0 END)) AS BIGINT) AS w0,
                       CAST(list_sum(list_transform(generate_series(0, 31),
                            i -> CASE WHEN (embedding::DOUBLE[])[i + 33] > 0
                                      THEN 1::BIGINT << (31 - i)
                                      ELSE 0 END)) AS BIGINT) AS w1
                FROM embeddings
            ),
            pairs AS (
                SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
                       round(list_cosine_similarity(q.v, c.v), 4) AS cosine,
                       CAST(bit_count(xor(q.w0, c.w0))
                            + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS hamming
                FROM coded q, coded c
                WHERE q.vec_id < 8
            ),
            ranked AS (
                SELECT *,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, corpus_id ASC) AS er,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY hamming ASC, corpus_id ASC) AS hr
                FROM pairs
            ),
            exact AS (
                SELECT query_id, corpus_id FROM ranked WHERE er <= 10
            ),
            bin AS (
                SELECT query_id, corpus_id FROM (
                    SELECT query_id, corpus_id,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, corpus_id ASC) AS rr
                    FROM ranked WHERE hr <= 50
                ) WHERE rr <= 10
            ),
            hits AS (
                SELECT e.query_id, count(*) AS c
                FROM exact e JOIN bin b
                  ON e.query_id = b.query_id AND e.corpus_id = b.corpus_id
                GROUP BY 1
            )
            SELECT qq.query_id,
                   COALESCE(h.c, 0)::BIGINT AS n_hit,
                   round(COALESCE(h.c, 0) / 10.0, 6) AS recall
            FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
                  WHERE vec_id < 8) qq
            LEFT JOIN hits h ON qq.query_id = h.query_id
        """,
        "binary_hamming_topk": """
            WITH q AS (
                SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
            ),
            codes AS (
                SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                       CAST(list_sum(list_transform(generate_series(0, 31),
                            i -> CASE WHEN (e.embedding::DOUBLE[])[i + 1] > 0
                                      THEN 1::BIGINT << (31 - i)
                                      ELSE 0 END)) AS BIGINT) AS w0,
                       CAST(list_sum(list_transform(generate_series(0, 31),
                            i -> CASE WHEN (e.embedding::DOUBLE[])[i + 33] > 0
                                      THEN 1::BIGINT << (31 - i)
                                      ELSE 0 END)) AS BIGINT) AS w1
                FROM embeddings e
            ),
            qcode AS (
                SELECT CAST(list_sum(list_transform(generate_series(0, 31),
                            i -> CASE WHEN qv[i + 1] > 0
                                      THEN 1::BIGINT << (31 - i)
                                      ELSE 0 END)) AS BIGINT) AS w0,
                       CAST(list_sum(list_transform(generate_series(0, 31),
                            i -> CASE WHEN qv[i + 33] > 0
                                      THEN 1::BIGINT << (31 - i)
                                      ELSE 0 END)) AS BIGINT) AS w1
                FROM q
            ),
            cand AS (
                SELECT c.vec_id, c.v,
                       CAST(bit_count(xor(c.w0, qc.w0))
                            + bit_count(xor(c.w1, qc.w1)) AS BIGINT) AS hamming
                FROM codes c, qcode qc
                ORDER BY hamming ASC, c.vec_id ASC
                LIMIT 50
            )
            SELECT vec_id, hamming,
                   round(list_cosine_similarity(v, (SELECT qv FROM q)), 4)
                       AS cosine
            FROM cand
            ORDER BY cosine DESC, vec_id ASC
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
        # C4 §2.2 three-span rule: 4-token chunks (fixture corpus is
        # punctuation-free), overlapping 3-chunk windows, corpus-wide
        # count on the span hash. range() is end-exclusive and DuckDB
        # list slices are 1-based inclusive, so i in [1, len-2] and
        # sents[i:i+2] is the 3-chunk window starting at i — identical
        # to Spark's sequence(1, size-2) + slice(sents, i, 3).
        "sentence_spans_dedup": """
            WITH s AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '\\S+( \\S+){0,3}'),
                               x -> trim(x)),
                           x -> x <> '') AS sents
                FROM documents
            ),
            sp AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, len(sents) - 1),
                           i -> md5(array_to_string(sents[i:i+2], chr(10)))
                       )) AS span_md5
                FROM s WHERE len(sents) >= 3
            )
            SELECT span_md5,
                   CAST(count(*) AS BIGINT) AS n_occ,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   min(doc_id) AS first_doc
            FROM sp GROUP BY span_md5 HAVING count(*) > 1
        """,
        # C4 §2.2 apply: same windows as sentence_spans_dedup; first
        # occurrence = min STRUCT(d, i) (DuckDB structs compare
        # lexicographically, matching Spark's min(struct(doc, start)));
        # a sentence is dropped iff any non-first duplicated window
        # covers its 1-based index (DuckDB list lambdas index 1-based,
        # matching the 1-based window starts directly).
        "sentence_spans_apply": """
            WITH s AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '\\S+( \\S+){0,3}'),
                               x -> trim(x)),
                           x -> x <> '') AS sents
                FROM documents
            ),
            w AS (
                SELECT doc_id, u.i AS start, u.h AS span_md5
                FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               range(1, len(sents) - 1),
                               i -> {'i': i,
                                     'h': md5(array_to_string(
                                              sents[i:i+2], chr(10)))}
                           )) AS u
                    FROM s WHERE len(sents) >= 3
                )
            ),
            e AS (
                SELECT span_md5,
                       min({'d': doc_id, 'i': start}) AS first
                FROM w GROUP BY span_md5 HAVING count(*) > 1
            ),
            r AS (
                SELECT w.doc_id,
                       unnest(range(w.start, w.start + 3)) AS di
                FROM w JOIN e USING (span_md5)
                WHERE NOT (e.first.d = w.doc_id AND e.first.i = w.start)
            ),
            d AS (
                SELECT doc_id, array_agg(DISTINCT di) AS drops
                FROM r GROUP BY doc_id
            ),
            k AS (
                SELECT s.doc_id, s.sents,
                       list_filter(
                           s.sents,
                           (x, i) -> NOT list_contains(
                               COALESCE(d.drops, []), i)) AS kept
                FROM s LEFT JOIN d USING (doc_id)
            )
            SELECT doc_id,
                   CAST(len(sents) AS BIGINT) AS n_sents,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   CAST(len(sents) - len(kept) AS BIGINT) AS n_dropped,
                   -- DuckDB array_to_string([]) is NULL, not ''
                   md5(COALESCE(array_to_string(kept, ' '), '')) AS out_md5
            FROM k
        """,
        # C4 §2.2 page/line quality battery: identical fixture
        # decoration as the Spark query (punct by (doc_id+line_no)%4,
        # javascript every 23rd slot, page-gate triggers on line 0 of
        # docs % 41/43/47), then the pure rule evaluation. string_agg
        # skips the non-kept NULL lines; empty pages hash md5('').
        "c4_page_clean": """
            WITH l0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,4}'),
                           (x, i) -> {'ln': CAST(i - 1 AS BIGINT),
                                      'line': x})) AS u
                FROM documents
            ),
            l1 AS (
                SELECT doc_id, u.ln AS line_no,
                       CASE WHEN (doc_id * 7 + u.ln) % 23 = 0
                            THEN u.line || ' enable javascript.'
                            ELSE u.line || CASE (doc_id + u.ln) % 4
                                 WHEN 0 THEN '.' WHEN 1 THEN '!'
                                 WHEN 2 THEN '?' ELSE '' END
                       END AS line1
                FROM l0
            ),
            dec AS (
                SELECT doc_id, line_no,
                       CASE WHEN line_no = 0 AND doc_id % 41 = 0
                                THEN line1 || ' {'
                            WHEN line_no = 0 AND doc_id % 43 = 0
                                THEN line1 || ' lorem ipsum'
                            WHEN line_no = 0 AND doc_id % 47 = 0
                                THEN line1 || ' zzzqqqblocked.'
                            ELSE line1
                       END AS line
                FROM l1
            ),
            flags AS (
                SELECT doc_id, line_no, line,
                       (regexp_matches(line, '[.!?"]$')
                        AND len(string_split(line, ' ')) >= 5
                        AND NOT regexp_matches(lower(line),
                                               '\\bjavascript\\b'))
                           AS line_keep,
                       len(regexp_extract_all(line, '[.!?]')) AS n_marks
                FROM dec
            ),
            agg AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_lines,
                       CAST(sum(CASE WHEN line_keep THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_kept_lines,
                       CAST(sum(CASE WHEN line_keep THEN n_marks ELSE 0 END)
                            AS BIGINT) AS n_sentences,
                       max(CASE WHEN regexp_matches(
                                    lower(line), '\\b(zzzqqqblocked)\\b')
                                THEN 1 ELSE 0 END) AS bad,
                       max(CASE WHEN contains(lower(line), 'lorem ipsum')
                                THEN 1 ELSE 0 END) AS lorem,
                       max(CASE WHEN contains(line, '{')
                                THEN 1 ELSE 0 END) AS curly,
                       md5(COALESCE(string_agg(
                               CASE WHEN line_keep THEN line END, ' '
                               ORDER BY line_no), '')) AS clean_md5
                FROM flags GROUP BY doc_id
            )
            SELECT doc_id, n_lines, n_kept_lines, n_sentences,
                   CASE WHEN bad = 1 THEN 'badword'
                        WHEN lorem = 1 THEN 'lorem_ipsum'
                        WHEN curly = 1 THEN 'curly_brace'
                        WHEN n_sentences < 3 THEN 'too_few_sentences'
                   END AS drop_reason,
                   CASE WHEN bad = 0 AND lorem = 0 AND curly = 0
                             AND n_sentences >= 3
                        THEN 1 ELSE 0 END AS page_kept,
                   clean_md5
            FROM agg
        """,
        # jusText twin: identical fixture decoration (25-word chunks,
        # link_chars by (doc_id+3*par_no)%7, copyright inject every
        # 31st slot), context-free CASE ladder, then the two revision
        # passes as IGNORE-NULLS window scans — neargood revision reads
        # the pass-1 labels so rescued shorts count as decisive, exactly
        # jusText's sequencing. Missing neighbours coalesce to 'bad'.
        "justext_classify": """
            WITH l0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,24}'),
                           (x, i) -> {'pn': CAST(i - 1 AS BIGINT),
                                      'txt': x})) AS u
                FROM documents
            ),
            pars AS (
                SELECT doc_id, u.pn AS par_no,
                       CASE WHEN (doc_id * 5 + u.pn) % 31 = 0
                            THEN u.txt || ' ©' ELSE u.txt END AS text
                FROM l0
            ),
            feat AS (
                SELECT doc_id, par_no,
                       CAST(length(text) AS BIGINT) AS length,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       CAST(CASE (doc_id + 3 * par_no) % 7
                            WHEN 0 THEN length(text) // 2
                            WHEN 1 THEN length(text) // 10
                            ELSE 0 END AS BIGINT) AS link_chars,
                       len(list_filter(string_split(text, ' '),
                           w -> list_contains(
                               ['a', 'the', 'table', 'value'],
                               lower(w)))) AS n_stop,
                       contains(text, '©') AS has_cc
                FROM pars
            ),
            flags AS (
                SELECT doc_id, par_no, length, n_words,
                       link_chars / greatest(length, 1) AS ld,
                       CASE WHEN n_words > 0
                            THEN n_stop / n_words ELSE 0.0 END AS sd,
                       has_cc
                FROM feat
            ),
            cf AS (
                SELECT doc_id, par_no, length, n_words, ld, sd,
                       CASE WHEN ld > 0.2 THEN 'bad'
                            WHEN has_cc THEN 'bad'
                            WHEN length < 70 THEN
                                 CASE WHEN ld > 0 THEN 'bad' ELSE 'short' END
                            WHEN sd >= 0.18 THEN
                                 CASE WHEN length > 120
                                      THEN 'good' ELSE 'neargood' END
                            WHEN sd >= 0.12 THEN 'neargood'
                            ELSE 'bad' END AS cf_class
                FROM flags
            ),
            p1 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb,
                       COALESCE(first_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb,
                       COALESCE(last_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_any,
                       COALESCE(first_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_any
                FROM cf
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            r1 AS (
                SELECT doc_id, par_no, length, n_words, ld, sd, cf_class,
                       CASE WHEN cf_class <> 'short' THEN cf_class
                            WHEN prev_gb = 'good' AND next_gb = 'good'
                                 THEN 'good'
                            WHEN prev_gb = 'bad' AND next_gb = 'bad'
                                 THEN 'bad'
                            WHEN (prev_gb = 'bad' AND prev_any = 'neargood')
                              OR (next_gb = 'bad' AND next_any = 'neargood')
                                 THEN 'good'
                            ELSE 'bad' END AS c1
                FROM p1
            ),
            p2 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb2,
                       COALESCE(first_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb2
                FROM r1
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            )
            SELECT doc_id, par_no, length, n_words,
                   round(ld, 6) AS link_density,
                   round(sd, 6) AS stopword_density,
                   cf_class,
                   CASE WHEN c1 <> 'neargood' THEN c1
                        WHEN prev_gb2 = 'bad' AND next_gb2 = 'bad'
                             THEN 'bad'
                        ELSE 'good' END AS final_class
            FROM p2
        """,
        # table_cells: the oracle side does NOT parse markdown — it
        # constructs the expected cells directly from the documents
        # row, so the Spark side's HTML→markdown→cells round trip is
        # checked against an independent derivation (incl. the ragged
        # third row padded to '' and the unescaped pipe in 'p|q<id>').
        "table_cells": """
            SELECT doc_id,
                   u.r AS row_idx, u.c AS col_idx, u.cell AS cell
            FROM (
                SELECT doc_id,
                       unnest([
                           {'r': 0, 'c': 0, 'cell': 'k'},
                           {'r': 0, 'c': 1, 'cell': 'v'},
                           {'r': 0, 'c': 2, 'cell': 'n'},
                           {'r': 1, 'c': 0,
                            'cell': CAST(doc_id AS VARCHAR)},
                           {'r': 1, 'c': 1, 'cell': source},
                           {'r': 1, 'c': 2, 'cell': lang},
                           {'r': 2, 'c': 0,
                            'cell': 'p|q' || CAST(doc_id AS VARCHAR)},
                           {'r': 2, 'c': 1,
                            'cell': CAST(n_chars AS VARCHAR)},
                           {'r': 2, 'c': 2, 'cell': ''}
                       ]) AS u
                FROM documents
            )
        """,
        # Boilerpipe NumWordsRules twin: same synthetic block features,
        # lag/lead with edge sentinels coalesced to 0 (boilerpipe's
        # EMPTY_START/EMPTY_END), the published tree as nested CASE.
        "boilerpipe_classify": """
            WITH b AS (
                SELECT doc_id,
                       unnest(range(0, doc_id % 12 + 1)) AS blk_no
                FROM documents
            ),
            f AS (
                SELECT doc_id, blk_no,
                       CAST(1 + (doc_id + 5 * blk_no) % 50 AS BIGINT)
                           AS num_words,
                       CAST(CASE (doc_id + 3 * blk_no) % 5
                            WHEN 0 THEN 0.5 WHEN 1 THEN 1.0
                            ELSE 0.0 END AS DOUBLE) AS link_density
                FROM b
            ),
            n AS (
                SELECT *,
                       COALESCE(lag(num_words) OVER w, 0) AS prev_nw,
                       COALESCE(lead(num_words) OVER w, 0) AS next_nw,
                       COALESCE(lag(link_density) OVER w, 0.0) AS prev_ld
                FROM f
                WINDOW w AS (PARTITION BY doc_id ORDER BY blk_no)
            )
            SELECT doc_id, blk_no, num_words, link_density,
                   CASE WHEN link_density > 0.333333 THEN 0
                        WHEN prev_ld <= 0.555556 THEN
                            CASE WHEN num_words <= 16 THEN
                                CASE WHEN next_nw <= 15 THEN
                                    CASE WHEN prev_nw <= 4
                                         THEN 0 ELSE 1 END
                                ELSE 1 END
                            ELSE 1 END
                        ELSE
                            CASE WHEN num_words <= 40 THEN
                                CASE WHEN next_nw <= 17
                                     THEN 0 ELSE 1 END
                            ELSE 1 END
                   END AS is_content
            FROM n
        """,
        # Cross-arm agreement: jusText and Boilerpipe re-derived over
        # the SAME 25-word block frame (linked fraction 0/0.5/1.0 by
        # (doc_id+3*blk_no)%5), then Cohen's kappa with the identical
        # expression order as the Spark query (all ratios
        # BIGINT/BIGINT, pe = pa*pb + (1-pa)*(1-pb)).
        "arm_agreement": """
            WITH l0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,24}'),
                           (x, i) -> {'bn': CAST(i - 1 AS BIGINT),
                                      'txt': x})) AS u
                FROM documents
            ),
            blocks AS (
                SELECT doc_id, u.bn AS blk_no, u.txt AS text,
                       CAST(CASE (doc_id + 3 * u.bn) % 5
                            WHEN 0 THEN 0.5 WHEN 1 THEN 1.0
                            ELSE 0.0 END AS DOUBLE) AS ldf
                FROM l0
            ),
            feat AS (
                SELECT doc_id, blk_no, text, ldf,
                       CAST(length(text) AS BIGINT) AS length,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       CAST(floor(length(text) * ldf) AS BIGINT)
                           AS link_chars,
                       len(list_filter(string_split(text, ' '),
                           w -> list_contains(
                               ['a', 'the', 'table', 'value'],
                               lower(w)))) AS n_stop
                FROM blocks
            ),
            cf AS (
                SELECT doc_id, blk_no, ldf, n_words,
                       CASE WHEN link_chars / greatest(length, 1) > 0.2
                                THEN 'bad'
                            WHEN contains(text, '©') THEN 'bad'
                            WHEN length < 70 THEN
                                CASE WHEN link_chars / greatest(length, 1)
                                          > 0 THEN 'bad' ELSE 'short' END
                            WHEN (CASE WHEN n_words > 0
                                       THEN n_stop / n_words
                                       ELSE 0.0 END) >= 0.18 THEN
                                CASE WHEN length > 120
                                     THEN 'good' ELSE 'neargood' END
                            WHEN (CASE WHEN n_words > 0
                                       THEN n_stop / n_words
                                       ELSE 0.0 END) >= 0.12
                                THEN 'neargood'
                            ELSE 'bad' END AS cf_class
                FROM feat
            ),
            p1 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb,
                       COALESCE(first_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb,
                       COALESCE(last_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_any,
                       COALESCE(first_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_any
                FROM cf
                WINDOW wp AS (PARTITION BY doc_id ORDER BY blk_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY blk_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            r1 AS (
                SELECT doc_id, blk_no,
                       CASE WHEN cf_class <> 'short' THEN cf_class
                            WHEN prev_gb = 'good' AND next_gb = 'good'
                                 THEN 'good'
                            WHEN prev_gb = 'bad' AND next_gb = 'bad'
                                 THEN 'bad'
                            WHEN (prev_gb = 'bad' AND prev_any = 'neargood')
                              OR (next_gb = 'bad' AND next_any = 'neargood')
                                 THEN 'good'
                            ELSE 'bad' END AS c1
                FROM p1
            ),
            p2 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb2,
                       COALESCE(first_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb2
                FROM r1
                WINDOW wp AS (PARTITION BY doc_id ORDER BY blk_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY blk_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            jx AS (
                SELECT doc_id, blk_no,
                       CASE WHEN (CASE WHEN c1 <> 'neargood' THEN c1
                                       WHEN prev_gb2 = 'bad'
                                            AND next_gb2 = 'bad'
                                            THEN 'bad'
                                       ELSE 'good' END) = 'good'
                            THEN 1 ELSE 0 END AS j_good
                FROM p2
            ),
            bp AS (
                SELECT doc_id, blk_no, n_words, ldf,
                       COALESCE(lag(n_words) OVER w, 0) AS prev_nw,
                       COALESCE(lead(n_words) OVER w, 0) AS next_nw,
                       COALESCE(lag(ldf) OVER w, 0.0) AS prev_ld
                FROM cf
                WINDOW w AS (PARTITION BY doc_id ORDER BY blk_no)
            ),
            bx AS (
                SELECT doc_id, blk_no,
                       CASE WHEN ldf > 0.333333 THEN 0
                            WHEN prev_ld <= 0.555556 THEN
                                CASE WHEN n_words <= 16 THEN
                                    CASE WHEN next_nw <= 15 THEN
                                        CASE WHEN prev_nw <= 4
                                             THEN 0 ELSE 1 END
                                    ELSE 1 END
                                ELSE 1 END
                            ELSE
                                CASE WHEN n_words <= 40 THEN
                                    CASE WHEN next_nw <= 17
                                         THEN 0 ELSE 1 END
                                ELSE 1 END
                       END AS b_good
                FROM bp
            ),
            agg AS (
                SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                       CAST(sum(CASE WHEN j.j_good = b.b_good
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
                       CAST(sum(j.j_good) AS BIGINT) AS n_good_justext,
                       CAST(sum(b.b_good) AS BIGINT) AS n_good_boilerpipe
                FROM jx j JOIN bx b USING (doc_id, blk_no)
            )
            SELECT n_blocks, n_agree, n_good_justext, n_good_boilerpipe,
                   round(n_agree / n_blocks, 6) AS agree_rate,
                   round(((n_agree / n_blocks) -
                          ((n_good_justext / n_blocks) *
                               (n_good_boilerpipe / n_blocks) +
                           (1 - n_good_justext / n_blocks) *
                               (1 - n_good_boilerpipe / n_blocks))) /
                         (1 - ((n_good_justext / n_blocks) *
                                   (n_good_boilerpipe / n_blocks) +
                               (1 - n_good_justext / n_blocks) *
                                   (1 - n_good_boilerpipe / n_blocks))),
                         6) AS kappa
            FROM agg
        """,
        # Crawl-refresh delta: same deterministic snapshot mutation,
        # full-outer join on md5 digests; side-nullness decides status
        # exactly as the Spark op's _old_md5/_new_md5 tests.
        "crawl_delta": """
            WITH newsnap AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0
                            THEN text || ' v2' ELSE text END AS text
                FROM documents WHERE doc_id % 17 <> 0
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id,
                       'new ' || text AS text
                FROM documents WHERE doc_id % 19 = 0
            ),
            o AS (SELECT doc_id, md5(text) AS oh FROM documents),
            n AS (SELECT doc_id, md5(text) AS nh FROM newsnap)
            SELECT doc_id,
                   CASE WHEN oh IS NULL THEN 'added'
                        WHEN nh IS NULL THEN 'removed'
                        WHEN oh <> nh THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM o FULL OUTER JOIN n USING (doc_id)
        """,
        # jusText WITH heading passes: cumulative char offsets; a
        # heading promotes when the nearest FOLLOWING good paragraph
        # starts within max_heading_distance (150) chars of its end —
        # pass 1 over context-free goods (short heading -> neargood),
        # final pass over revised goods (bad-from-short heading ->
        # good). Heading flag: (doc_id + par_no) % 4 = 0.
        "justext_headings": """
            WITH l0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,24}'),
                           (x, i) -> {'pn': CAST(i - 1 AS BIGINT),
                                      'txt': x})) AS u
                FROM documents
            ),
            tx AS (
                SELECT doc_id, u.pn AS par_no,
                       (doc_id + u.pn) % 4 = 0 AS heading,
                       CASE WHEN (doc_id + u.pn) % 4 = 0
                            THEN array_to_string(
                                string_split(u.txt, ' ')[1:5], ' ')
                            ELSE u.txt END AS text
                FROM l0
            ),
            feat AS (
                SELECT doc_id, par_no, text, heading,
                       CAST(length(text) AS BIGINT) AS length,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       CAST(CASE WHEN heading THEN 0
                            WHEN (doc_id + 3 * par_no) % 7 = 0
                                THEN length(text) // 2
                            WHEN (doc_id + 3 * par_no) % 7 = 1
                                THEN length(text) // 10
                            ELSE 0 END AS BIGINT) AS link_chars,
                       len(list_filter(string_split(text, ' '),
                           w -> list_contains(
                               ['a', 'the', 'table', 'value'],
                               lower(w)))) AS n_stop
                FROM tx
            ),
            cf AS (
                SELECT doc_id, par_no, length, heading,
                       CASE WHEN link_chars / greatest(length, 1) > 0.2
                                THEN 'bad'
                            WHEN contains(text, '©') THEN 'bad'
                            WHEN length < 70 THEN
                                CASE WHEN link_chars / greatest(length, 1)
                                          > 0 THEN 'bad' ELSE 'short' END
                            WHEN (CASE WHEN n_words > 0
                                       THEN n_stop / n_words
                                       ELSE 0.0 END) >= 0.18 THEN
                                CASE WHEN length > 120
                                     THEN 'good' ELSE 'neargood' END
                            WHEN (CASE WHEN n_words > 0
                                       THEN n_stop / n_words
                                       ELSE 0.0 END) >= 0.12
                                THEN 'neargood'
                            ELSE 'bad' END AS cf_class
                FROM feat
            ),
            offs AS (
                SELECT *,
                       COALESCE(sum(length) OVER wp_sum, 0) AS off
                FROM cf
                WINDOW wp_sum AS (PARTITION BY doc_id ORDER BY par_no
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING)
            ),
            h1 AS (
                SELECT *,
                       CASE WHEN heading AND cf_class = 'short'
                                 AND first_value(CASE WHEN cf_class = 'good'
                                     THEN off END IGNORE NULLS) OVER wn
                                     IS NOT NULL
                                 AND first_value(CASE WHEN cf_class = 'good'
                                     THEN off END IGNORE NULLS) OVER wn
                                     - (off + length) <= 150
                            THEN 'neargood' ELSE cf_class END AS c0
                FROM offs
                WINDOW wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            p1 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN c0 IN ('good', 'bad')
                               THEN c0 END IGNORE NULLS) OVER wp, 'bad')
                           AS prev_gb,
                       COALESCE(first_value(CASE WHEN c0 IN ('good', 'bad')
                               THEN c0 END IGNORE NULLS) OVER wn, 'bad')
                           AS next_gb,
                       COALESCE(last_value(CASE WHEN c0 <> 'short'
                               THEN c0 END IGNORE NULLS) OVER wp, 'bad')
                           AS prev_any,
                       COALESCE(first_value(CASE WHEN c0 <> 'short'
                               THEN c0 END IGNORE NULLS) OVER wn, 'bad')
                           AS next_any
                FROM h1
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            r1 AS (
                SELECT doc_id, par_no, length, heading, cf_class, off,
                       CASE WHEN c0 <> 'short' THEN c0
                            WHEN prev_gb = 'good' AND next_gb = 'good'
                                 THEN 'good'
                            WHEN prev_gb = 'bad' AND next_gb = 'bad'
                                 THEN 'bad'
                            WHEN (prev_gb = 'bad' AND prev_any = 'neargood')
                              OR (next_gb = 'bad' AND next_any = 'neargood')
                                 THEN 'good'
                            ELSE 'bad' END AS c1
                FROM p1
            ),
            p2 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END IGNORE NULLS) OVER wp, 'bad')
                           AS prev_gb2,
                       COALESCE(first_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END IGNORE NULLS) OVER wn, 'bad')
                           AS next_gb2
                FROM r1
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            c2t AS (
                SELECT doc_id, par_no, length, heading, cf_class, off,
                       CASE WHEN c1 <> 'neargood' THEN c1
                            WHEN prev_gb2 = 'bad' AND next_gb2 = 'bad'
                                 THEN 'bad'
                            ELSE 'good' END AS c2
                FROM p2
            )
            SELECT doc_id, par_no, length, cf_class,
                   CASE WHEN heading AND c2 = 'bad'
                             AND cf_class = 'short'
                             AND first_value(CASE WHEN c2 = 'good'
                                 THEN off END IGNORE NULLS) OVER wn
                                 IS NOT NULL
                             AND first_value(CASE WHEN c2 = 'good'
                                 THEN off END IGNORE NULLS) OVER wn
                                 - (off + length) <= 150
                        THEN 'good' ELSE c2 END AS final_class
            FROM c2t
            WINDOW wn AS (PARTITION BY doc_id ORDER BY par_no
                          ROWS BETWEEN 1 FOLLOWING
                                   AND UNBOUNDED FOLLOWING)
        """,
        # Cho & Garcia-Molina change-rate twin: same 8 synthetic delta
        # rounds; only changed/unchanged rounds count as visits.
        "change_rate": """
            WITH h AS (
                SELECT doc_id, unnest(range(0, 8)) AS r FROM documents
            ),
            s AS (
                SELECT doc_id, r,
                       CASE WHEN doc_id % 3 = 0 AND r = doc_id % 8
                                THEN 'added'
                            WHEN (doc_id * (r + 1) + r * r) % 5 = 0
                                THEN 'changed'
                            ELSE 'unchanged' END AS status
                FROM h
            ),
            a AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_visits,
                       CAST(sum(CASE WHEN status = 'changed'
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
                FROM s WHERE status IN ('changed', 'unchanged')
                GROUP BY doc_id
            )
            SELECT doc_id, n_visits, n_changes,
                   round(CASE WHEN n_changes < n_visits
                              THEN -ln(1 - n_changes / n_visits)
                         END, 6) AS rate_naive,
                   round(-ln((n_visits - n_changes + 0.5) /
                             (n_visits + 0.5)), 6) AS rate_cho
            FROM a
        """,
        # Anchor-corpus twin: same synthetic link rows; dominant anchor
        # = struct max on (n_refs, anchor), field order matching the
        # Spark struct so tie-breaks agree byte-for-byte.
        "anchor_corpus": """
            WITH l AS (
                SELECT doc_id, unnest(range(0, 3)) AS k FROM documents
            ),
            raw AS (
                SELECT 'https://t.test/p' ||
                           CAST((doc_id * (k + 1)) % 97 AS VARCHAR) AS url,
                       CASE (doc_id + 7 * k) % 6
                            WHEN 0 THEN 'click here'
                            WHEN 1 THEN 'spark guide'
                            WHEN 2 THEN 'data docs page'
                            WHEN 3 THEN 'spark guide'
                            WHEN 4 THEN ''
                            ELSE 'guide ' || CAST(doc_id % 5 AS VARCHAR)
                       END AS anchor,
                       'd' || CAST(doc_id % 11 AS VARCHAR) AS src
                FROM l
            ),
            kept AS (
                SELECT url, trim(anchor) AS anchor, src FROM raw
                WHERE length(trim(anchor)) > 0
                  AND length(trim(anchor)) <= 128
                  AND lower(trim(anchor)) NOT IN
                      ('click here', 'here', 'read more', 'more',
                       'link', 'this', 'home')
            ),
            pairs AS (
                SELECT url, anchor,
                       CAST(count(*) AS BIGINT) AS n_refs
                FROM kept GROUP BY 1, 2
            ),
            roll AS (
                SELECT url,
                       CAST(sum(n_refs) AS BIGINT) AS n_refs,
                       CAST(count(*) AS BIGINT) AS n_anchors,
                       max({'n': n_refs, 'a': anchor}) AS top
                FROM pairs GROUP BY url
            ),
            doms AS (
                SELECT url,
                       CAST(count(DISTINCT src) AS BIGINT) AS n_domains
                FROM kept GROUP BY url
            )
            SELECT r.url, r.n_refs, r.n_anchors, d.n_domains,
                   r.top.a AS top_anchor, r.top.n AS top_anchor_refs
            FROM roll r JOIN doms d USING (url)
        """,
        # Section-rollup twin: identical synthetic URLs; DuckDB list
        # slices are 1-based inclusive, matching Spark slice(arr, 1, i).
        "section_rollup": """
            WITH u AS (
                SELECT doc_id,
                       'd' || CAST(doc_id % 7 AS VARCHAR) AS domain,
                       CASE WHEN doc_id % 23 = 0 THEN '/'
                            ELSE '/' || array_to_string(
                                list_transform(
                                    range(0, CAST(1 + doc_id % 4 AS BIGINT)),
                                    i -> 's' || CAST((doc_id + i * 3) % 6
                                                     AS VARCHAR)),
                                '/')
                       END AS path,
                       (doc_id % 100) / 100.0 AS quality
                FROM documents
            ),
            segs AS (
                SELECT domain, quality,
                       list_filter(string_split(path, '/')[2:6],
                                   s -> s <> '') AS sg
                FROM u
            ),
            pref AS (
                SELECT domain, quality,
                       unnest(CASE WHEN len(sg) = 0 THEN ['/']
                              ELSE list_transform(
                                  range(1, len(sg) + 1),
                                  i -> '/' || array_to_string(sg[1:i], '/'))
                              END) AS section
                FROM segs
            )
            SELECT domain, section,
                   CAST(CASE WHEN section = '/' THEN 0
                        ELSE len(string_split(section, '/')) - 1
                        END AS INTEGER) AS depth,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(quality), 6) AS mean_quality
            FROM pref GROUP BY domain, section
        """,
        # Ranking-metrics twin: DuckDB list lambdas are 1-based, so the
        # IDCG discount is log2(i + 1.0) vs Spark's 0-based log2(i+2);
        # nano terms round-then-cast (both engines round first, so the
        # trunc-vs-round cast divergence never appears).
        "ranking_metrics": """
            WITH q AS (
                SELECT doc_id AS query_id FROM documents WHERE doc_id < 20
            ),
            res AS (
                SELECT query_id, unnest(range(1, 11)) AS rank FROM q
            ),
            res2 AS (
                SELECT query_id, rank,
                       (query_id * 31 + rank * 7) % 200 AS doc_id
                FROM res
            ),
            qr AS (
                SELECT query_id, unnest(range(0, 15)) AS j FROM q
            ),
            qr2 AS (
                SELECT query_id,
                       (query_id * 31 + j * 11) % 200 AS doc_id,
                       j % 4 AS rel
                FROM qr
            ),
            joined AS (
                SELECT r.query_id, r.rank, COALESCE(g.rel, 0) AS rel
                FROM res2 r LEFT JOIN qr2 g
                  ON r.query_id = g.query_id AND r.doc_id = g.doc_id
            ),
            ret AS (
                SELECT query_id,
                       CAST(sum(CAST(round((pow(2.0, rel) - 1)
                                / log2(rank + 1) * 1e9) AS BIGINT))
                            AS BIGINT) AS dcg_nanos,
                       min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
                       CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_ret_rel
                FROM joined WHERE rank <= 10 GROUP BY query_id
            ),
            spine AS (
                SELECT query_id,
                       CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_rel,
                       CAST(list_aggregate(
                           list_transform(
                               (list_sort(list(rel), 'DESC'))[1:10],
                               (x, i) -> CAST(round((pow(2.0, x) - 1)
                                         / log2(i + 1.0) * 1e9)
                                         AS BIGINT)),
                           'sum') AS BIGINT) AS idcg_nanos
                FROM qr2 GROUP BY query_id
            )
            SELECT s.query_id, s.n_rel,
                   COALESCE(r.n_ret_rel, 0) AS n_ret_rel,
                   CASE WHEN r.first_rel IS NOT NULL
                        THEN round(1 / r.first_rel, 6)
                        ELSE 0.0 END AS mrr,
                   CASE WHEN s.n_rel > 0
                        THEN round(COALESCE(r.n_ret_rel, 0) / s.n_rel, 6)
                        ELSE 0.0 END AS recall_k,
                   CASE WHEN s.idcg_nanos > 0
                        THEN round(COALESCE(r.dcg_nanos, 0)
                                   / s.idcg_nanos, 6)
                        ELSE 0.0 END AS ndcg_k
            FROM spine s LEFT JOIN ret r USING (query_id)
        """,
        # Outline twin: expected heading edges constructed directly
        # from the fixture page shape (h1 > h2 > h3 / h2), so the
        # HTML→heading-span→edge path through the real engine is
        # checked against an independent derivation.
        "outline_edges": """
            SELECT doc_id, u.o AS ord, u.l AS level,
                   u.t AS title, u.p AS parent_ord
            FROM (
                SELECT doc_id,
                       unnest([
                           {'o': 0, 'l': 1,
                            't': 'Doc ' || CAST(doc_id AS VARCHAR),
                            'p': CAST(NULL AS INTEGER)},
                           {'o': 2, 'l': 2,
                            't': 'Part A ' || CAST(doc_id AS VARCHAR),
                            'p': 0},
                           {'o': 4, 'l': 3,
                            't': 'Sub ' || CAST(doc_id AS VARCHAR),
                            'p': 2},
                           {'o': 6, 'l': 2,
                            't': 'Part B ' || CAST(doc_id AS VARCHAR),
                            'p': 0}
                       ]) AS u
                FROM documents
            )
        """,
        # Section-chunk twin: expected labels constructed directly from
        # the nested-heading fixture shape; ord-1 text is the document
        # text itself, the rest are the fixed paragraph literals.
        "section_chunks": """
            SELECT doc_id, u.o AS ord,
                   u.so AS section_ord, u.sl AS section_level,
                   u.st AS section_title, u.m AS text_md5
            FROM (
                SELECT doc_id,
                       unnest([
                           {'o': 1, 'so': 0, 'sl': 1,
                            'st': 'Doc ' || CAST(doc_id AS VARCHAR),
                            'm': md5(text)},
                           {'o': 3, 'so': 2, 'sl': 2,
                            'st': 'Part A ' || CAST(doc_id AS VARCHAR),
                            'm': md5('alpha body')},
                           {'o': 5, 'so': 4, 'sl': 3,
                            'st': 'Sub ' || CAST(doc_id AS VARCHAR),
                            'm': md5('beta body')},
                           {'o': 7, 'so': 6, 'sl': 2,
                            'st': 'Part B ' || CAST(doc_id AS VARCHAR),
                            'm': md5('gamma body')}
                       ]) AS u
                FROM documents
            )
        """,
        # Multilingual jusText twin: per-language stopword list picked
        # inside the list_filter lambda by the row's lang (lambdas
        # capture outer columns in both engines). No © inject.
        "justext_multilang": """
            WITH l0 AS (
                SELECT doc_id, lang,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,24}'),
                           (x, i) -> {'pn': CAST(i - 1 AS BIGINT),
                                      'txt': x})) AS u
                FROM documents
            ),
            feat AS (
                SELECT doc_id, u.pn AS par_no, u.txt AS text,
                       CAST(length(u.txt) AS BIGINT) AS length,
                       CAST(len(string_split(u.txt, ' ')) AS BIGINT)
                           AS n_words,
                       CAST(CASE (doc_id + 3 * u.pn) % 7
                            WHEN 0 THEN length(u.txt) // 2
                            WHEN 1 THEN length(u.txt) // 10
                            ELSE 0 END AS BIGINT) AS link_chars,
                       len(list_filter(string_split(u.txt, ' '),
                           w -> CASE lang
                                WHEN 'en' THEN list_contains(
                                    ['a', 'the', 'table', 'value'],
                                    lower(w))
                                WHEN 'es' THEN list_contains(
                                    ['data', 'value', 'a'], lower(w))
                                WHEN 'fr' THEN list_contains(
                                    ['table', 'key', 'the'], lower(w))
                                WHEN 'de' THEN list_contains(
                                    ['row', 'scan', 'a'], lower(w))
                                WHEN 'zh' THEN list_contains(
                                    ['fast', 'slow'], lower(w))
                                ELSE list_contains(['a', 'the'], lower(w))
                           END)) AS n_stop
                FROM l0
            ),
            cf AS (
                SELECT doc_id, par_no, length,
                       CASE WHEN n_words > 0
                            THEN n_stop / n_words ELSE 0.0 END AS sd,
                       CASE WHEN link_chars / greatest(length, 1) > 0.2
                                THEN 'bad'
                            WHEN contains(text, '©') THEN 'bad'
                            WHEN length < 70 THEN
                                CASE WHEN link_chars / greatest(length, 1)
                                          > 0 THEN 'bad' ELSE 'short' END
                            WHEN (CASE WHEN n_words > 0
                                       THEN n_stop / n_words
                                       ELSE 0.0 END) >= 0.18 THEN
                                CASE WHEN length > 120
                                     THEN 'good' ELSE 'neargood' END
                            WHEN (CASE WHEN n_words > 0
                                       THEN n_stop / n_words
                                       ELSE 0.0 END) >= 0.12
                                THEN 'neargood'
                            ELSE 'bad' END AS cf_class
                FROM feat
            ),
            p1 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb,
                       COALESCE(first_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb,
                       COALESCE(last_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_any,
                       COALESCE(first_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_any
                FROM cf
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            r1 AS (
                SELECT doc_id, par_no, length, sd, cf_class,
                       CASE WHEN cf_class <> 'short' THEN cf_class
                            WHEN prev_gb = 'good' AND next_gb = 'good'
                                 THEN 'good'
                            WHEN prev_gb = 'bad' AND next_gb = 'bad'
                                 THEN 'bad'
                            WHEN (prev_gb = 'bad' AND prev_any = 'neargood')
                              OR (next_gb = 'bad' AND next_any = 'neargood')
                                 THEN 'good'
                            ELSE 'bad' END AS c1
                FROM p1
            ),
            p2 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb2,
                       COALESCE(first_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb2
                FROM r1
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            )
            SELECT doc_id, par_no, length,
                   round(sd, 6) AS stopword_density,
                   cf_class,
                   CASE WHEN c1 <> 'neargood' THEN c1
                        WHEN prev_gb2 = 'bad' AND next_gb2 = 'bad'
                             THEN 'bad'
                        ELSE 'good' END AS final_class
            FROM p2
        """,
        # Ligature-fold twin: same decoration, same replace chain (the
        # seven sources are single code points and the replacements are
        # pure ASCII, so chain order cannot interact — mirrored anyway).
        "ligature_fold": """
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN 'ﬁrst ' || text || ' ﬂow ﬃx'
                            ELSE text END AS t
                FROM documents
            ),
            f AS (
                SELECT doc_id, t,
                       replace(replace(replace(replace(replace(replace(
                           replace(t, 'ﬀ', 'ff'), 'ﬁ', 'fi'), 'ﬂ', 'fl'),
                           'ﬃ', 'ffi'), 'ﬄ', 'ffl'), 'ﬅ', 'st'),
                           'ﬆ', 'st') AS folded
                FROM d
            )
            SELECT doc_id,
                   CAST(length(t) AS BIGINT) AS len_raw,
                   CAST(length(folded) AS BIGINT) AS len_folded,
                   md5(folded) AS folded_md5
            FROM f
        """,
        # Typography-fold twin: decoration and replace chain written
        # with chr() code points so no invisible character can drift
        # between the two engines' source files.
        "typography_fold": """
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 2 = 0
                            THEN chr(8220) || 'start' || chr(8221) || ' ' ||
                                 chr(8216) || 'q' || chr(8217) || ' a' ||
                                 chr(8211) || 'b c' || chr(8212) || 'd e' ||
                                 chr(8230) || ' f' || chr(160) || 'g ' ||
                                 text
                            ELSE text END AS t
                FROM documents
            ),
            f AS (
                SELECT doc_id, t,
                       replace(replace(replace(replace(replace(replace(
                           replace(replace(t,
                           chr(8216), ''''), chr(8217), ''''),
                           chr(8220), '"'), chr(8221), '"'),
                           chr(8211), '-'), chr(8212), '-'),
                           chr(8230), '...'), chr(160), ' ') AS folded
                FROM d
            )
            SELECT doc_id,
                   CAST(length(t) AS BIGINT) AS len_raw,
                   CAST(length(folded) AS BIGINT) AS len_folded,
                   md5(folded) AS folded_md5
            FROM f
        """,
        # URL-cluster twin: the canonical key and the election outcome
        # are both closed-form over the deterministic variant set —
        # B present iff doc%5 != 0 or doc%7 = 0; canonical is B when
        # present (shortest), else the short+slash form C.
        "url_variant_clusters": """
            SELECT 'https://' || source || '.example.com/docs/' ||
                       CAST(doc_id AS VARCHAR) AS url_key,
                   CAST(2 + CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END
                          + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS n_hits,
                   CAST(CASE WHEN doc_id % 5 <> 0 OR doc_id % 7 = 0
                             THEN 3 ELSE 2 END AS BIGINT) AS n_variants,
                   CASE WHEN doc_id % 5 <> 0 OR doc_id % 7 = 0
                        THEN 'https://' || source || '.example.com/docs/'
                             || CAST(doc_id AS VARCHAR)
                        ELSE 'https://' || source || '.example.com/docs/'
                             || CAST(doc_id AS VARCHAR) || '/'
                   END AS canonical_url
            FROM documents
        """,
        # Mirror-alias twin: closed-form over the synthetic (d, d+250)
        # content pairs; HAVING keeps only multi-URL digests.
        "content_aliases": """
            WITH d AS (
                SELECT 'content-' || CAST(doc_id % 250 AS VARCHAR) AS body,
                       'https://m' || CAST(doc_id % 3 AS VARCHAR) ||
                           '.mirror.test/p' || CAST(doc_id AS VARCHAR)
                           AS url,
                       'm' || CAST(doc_id % 3 AS VARCHAR) AS host
                FROM documents
            )
            SELECT md5(body) AS content_md5,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   min(url) AS first_url
            FROM d GROUP BY md5(body)
            HAVING count(DISTINCT url) > 1
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
        "blocklist_filter": """
            WITH bad(tok) AS (VALUES ('dup'), ('zzzqqqblocked')),
            toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split(trim(regexp_replace(
                               lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                           t -> t <> '')) AS tok
                FROM documents
            ),
            hits AS (
                SELECT t.doc_id,
                       count(*)::BIGINT AS n_hits,
                       count(DISTINCT t.tok)::BIGINT AS n_distinct_bad
                FROM toks t JOIN bad b ON t.tok = b.tok
                GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
                   COALESCE(h.n_distinct_bad, 0)::BIGINT AS n_distinct_bad,
                   CASE WHEN h.n_hits IS NULL THEN 1 ELSE 0 END AS keep
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        """,
        "source_diversity": (
            "            WITH grams AS (\n"
            + "\n                UNION ALL\n".join(
                f"""
                SELECT source, {n} AS n,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - {n - 1}, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+{n - 1}], ' ')
                       ))) AS g
                FROM documents"""
                for n in (1, 2, 3)
            )
            + """
            ),
            cells AS (
                SELECT source, n, g, count(*) AS c
                FROM grams WHERE g <> '' GROUP BY 1, 2, 3
            ),
            per AS (
                SELECT source, n,
                       CAST(sum(c) AS BIGINT) AS total_grams,
                       count(*)::BIGINT AS distinct_grams,
                       round(count(*) * 1.0 / sum(c), 6) AS distinct_ratio
                FROM cells GROUP BY 1, 2
            ),
            grid AS (
                SELECT DISTINCT d.source, t.n
                FROM documents d, unnest([1, 2, 3]) AS t(n)
            )
            SELECT g.source, CAST(g.n AS INTEGER) AS n,
                   COALESCE(p.total_grams, 0)::BIGINT AS total_grams,
                   COALESCE(p.distinct_grams, 0)::BIGINT AS distinct_grams,
                   p.distinct_ratio
            FROM grid g LEFT JOIN per p
              ON g.source = p.source AND g.n = p.n
        """
        ),
        "tokenizer_fertility": """
            SELECT lang,
                   count(*)::BIGINT AS n_docs,
                   CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                       AS tokens,
                   round(sum(length(text)) * 1.0
                         / sum(len(string_split_regex(trim(text), '\\s+'))), 6)
                       AS chars_per_token,
                   round(sum(strlen(text)) * 1.0 / sum(length(text)), 6)
                       AS bytes_per_char,
                   round(sum(len(string_split_regex(trim(text), '\\s+'))) * 1.0
                         / count(*), 6) AS tokens_per_doc
            FROM documents GROUP BY 1
        """,
        "curriculum_order": """
            WITH b AS (
                SELECT doc_id,
                       least(7, n_chars // 256)::BIGINT AS bucket,
                       md5('cur0:' || doc_id) AS sk
                FROM documents
            ),
            r AS (
                SELECT doc_id, bucket,
                       CAST(row_number() OVER (
                           PARTITION BY bucket ORDER BY sk, doc_id
                       ) AS BIGINT) AS rn
                FROM b
            ),
            sizes AS (SELECT bucket, count(*) AS c FROM b GROUP BY 1),
            off AS (
                SELECT bucket,
                       COALESCE(sum(c) OVER (
                           ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS o
                FROM sizes
            )
            SELECT r.doc_id, r.bucket, CAST(off.o + r.rn AS BIGINT) AS position
            FROM r JOIN off USING (bucket)
        """,
        "token_entropy": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split(trim(regexp_replace(
                               lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                           t -> t <> '')) AS tok
                FROM documents
            ),
            counts AS (
                SELECT doc_id, tok, count(*) AS c
                FROM toks GROUP BY 1, 2
            ),
            tot AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       count(*)::BIGINT AS n_distinct
                FROM counts GROUP BY 1
            ),
            per_doc AS (
                SELECT c.doc_id, t.n_tokens, t.n_distinct,
                       sum(CAST(round(-(c.c * 1.0 / t.n_tokens)
                                      * log2(c.c * 1.0 / t.n_tokens)
                                      * 1e9) AS BIGINT)) AS s
                FROM counts c JOIN tot t USING (doc_id)
                GROUP BY 1, 2, 3
            )
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0)::BIGINT AS n_tokens,
                   COALESCE(p.n_distinct, 0)::BIGINT AS n_distinct,
                   COALESCE(((p.s + 500) // 1000) / 1e6, 0.0) AS entropy_bits
            FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """,
        "unimax_mix": """
            WITH sizes AS (
                SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS size,
                       4.0 * CAST(sum(n_chars) AS DOUBLE) AS demand
                FROM documents GROUP BY 1
            ),
            tot AS (SELECT 3.2 * sum(size) AS b FROM sizes),
            ranked AS (
                SELECT lang, size, demand,
                       row_number() OVER (ORDER BY demand ASC, lang ASC) AS k,
                       sum(demand) OVER (
                           ORDER BY demand ASC, lang ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS s,
                       count(*) OVER () AS n
                FROM sizes
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
            ),
            alloc AS (
                SELECT f.lang, f.size, f.demand,
                       round(CASE WHEN lvl.t IS NULL THEN f.demand
                                  ELSE least(f.demand, lvl.t) END, 6) AS alloc,
                       CASE WHEN lvl.t IS NOT NULL AND f.demand > lvl.t
                            THEN 1 ELSE 0 END AS budget_limited
                FROM f, lvl
            )
            SELECT lang, size, alloc,
                   round(alloc / size, 6) AS epochs, budget_limited
            FROM alloc
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
                       CAST(sum(flag) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS chunk_id
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
        "vocab_heavy_hitters": r"""
            WITH t0 AS (
                SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                       AS token
                FROM documents
            ),
            t AS (SELECT token FROM t0 WHERE token <> ''),
            n AS (SELECT count(*) AS n FROM t)
            -- integer rational cut: k=200 -> ceil(1e6/201) = 4976
            -- millionths, matching ops.heavy.heavy_hitters exactly
            SELECT token, count(*) AS cnt
            FROM t, n GROUP BY token, n.n
            HAVING count(*) * 1000000 > 4976 * n.n
        """,
        "dedup_cluster_exemplars": r"""
            WITH RECURSIVE
            sh AS (
                SELECT doc_id AS doc,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1) + 1),
                           i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')
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
            ),
            members AS (SELECT v AS doc, min(r) AS component FROM reach GROUP BY v),
            scored AS (
                SELECT m.doc, m.component, d.n_chars AS score
                FROM members m JOIN documents d ON d.doc_id = m.doc
            ),
            ranked AS (
                SELECT *,
                       row_number() OVER (
                           PARTITION BY component ORDER BY score DESC, doc
                       ) AS rn,
                       count(*) OVER (PARTITION BY component) AS n_members
                FROM scored
            )
            SELECT component, doc AS exemplar, score,
                   CAST(n_members AS BIGINT) AS n_members
            FROM ranked WHERE rn = 1
        """,
        "media_dedup": r"""
            WITH m AS (
                SELECT doc_id AS media_id,
                       unhex(list_extract(
                           ['FFD8FF', '89504E470D0A1A0A', '47494638',
                            '52494646', '25504446',
                            '000000186674797069736F6D', ''],
                           (doc_id % 7 + 1)::BIGINT
                       )) || encode(source) AS content
                FROM documents
            ),
            h AS (
                SELECT media_id, md5(hex(content)) AS content_hash,
                       octet_length(content)::BIGINT AS n_bytes,
                       hex(content) AS hx
                FROM m
            ),
            k AS (
                SELECT *,
                       CASE WHEN substring(hx, 9, 8) = '66747970' THEN 'mp4'
                            WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'png'
                            WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
                            WHEN starts_with(hx, '47494638') THEN 'gif'
                            WHEN starts_with(hx, '52494646') THEN 'riff'
                            WHEN starts_with(hx, '25504446') THEN 'pdf'
                            ELSE 'unknown' END AS kind
                FROM h
            )
            SELECT content_hash, min(media_id) AS keeper_id,
                   count(*) AS n_copies, min(n_bytes) AS n_bytes,
                   min(kind) AS kind
            FROM k GROUP BY content_hash
        """,
        "leakage_safe_splits": r"""
            WITH b AS (
                SELECT *,
                       ('0x' || substr(md5(source), 1, 8))::BIGINT % 10000
                       AS bucket
                FROM documents
            ),
            s AS (
                SELECT *,
                       CASE WHEN bucket < 8000 THEN 'train'
                            WHEN bucket < 9000 THEN 'val'
                            WHEN bucket < 10000 THEN 'test'
                            ELSE 'rest' END AS split
                FROM b
            )
            SELECT split, count(DISTINCT source) AS n_sources,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM s GROUP BY split
        """,
        "token_budget_mix": r"""
            WITH d AS (
                SELECT doc_id, lang, n_chars,
                       len(string_split_regex(trim(text), '\s+'))::BIGINT
                       AS n_tokens
                FROM documents
            ),
            -- budgets = floor(20000 * w / sum(w)) for en:.5 fr:.2 de:.2
            -- zh:.1, matching the query's driver-side literals
            b AS (
                SELECT * FROM (VALUES
                    ('en', 10000), ('fr', 4000), ('de', 4000), ('zh', 2000)
                ) AS t(lang, group_budget)
            ),
            j AS (SELECT d.*, b.group_budget FROM d JOIN b USING (lang)),
            c AS (
                SELECT *,
                       coalesce(sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY n_chars DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS before
                FROM j
            )
            SELECT doc_id, lang, n_tokens,
                   (before + n_tokens)::BIGINT AS cum_tokens,
                   group_budget::BIGINT AS group_budget
            FROM c WHERE before < group_budget
        """,
        "script_profile": r"""
            WITH c AS (
                SELECT doc_id,
                       length(text)::BIGINT AS n_chars_total,
                       (length(text) - length(regexp_replace(text, '[A-Za-zÀ-ɏ]', '', 'g')))::BIGINT AS n_latin,
                       (length(text) - length(regexp_replace(text, '[一-鿿぀-ヿ가-힯]', '', 'g')))::BIGINT AS n_cjk,
                       (length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')))::BIGINT AS n_cyrillic,
                       (length(text) - length(regexp_replace(text, '[؀-ۿ]', '', 'g')))::BIGINT AS n_arabic,
                       (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digit
                FROM documents
            )
            SELECT *,
                   CASE
                     WHEN n_latin > 0 AND n_latin >= greatest(n_cjk, n_cyrillic, n_arabic, n_digit) THEN 'latin'
                     WHEN n_cjk > 0 AND n_cjk >= greatest(n_latin, n_cyrillic, n_arabic, n_digit) THEN 'cjk'
                     WHEN n_cyrillic > 0 AND n_cyrillic >= greatest(n_latin, n_cjk, n_arabic, n_digit) THEN 'cyrillic'
                     WHEN n_arabic > 0 AND n_arabic >= greatest(n_latin, n_cjk, n_cyrillic, n_digit) THEN 'arabic'
                     WHEN n_digit > 0 AND n_digit >= greatest(n_latin, n_cjk, n_cyrillic, n_arabic) THEN 'digit'
                     ELSE 'none' END AS main_script
            FROM c
        """,
        "passage_chunks": r"""
            WITH t AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                FROM documents
            ),
            s AS (
                SELECT doc_id, toks, len(toks) AS n,
                       greatest(len(toks) - 32, 0) + 1 AS last
                FROM t
            ),
            st AS (
                SELECT doc_id, toks, n,
                       unnest(CASE WHEN (last - 1) % 24 <> 0
                              THEN list_append(generate_series(1, last, 24), last)
                              ELSE generate_series(1, last, 24) END)
                       AS start_token
                FROM s
            )
            SELECT doc_id,
                   ((start_token + 22) // 24)::BIGINT AS chunk_id,
                   start_token::BIGINT AS start_token,
                   least(32, n - start_token + 1)::BIGINT AS n_tokens,
                   array_to_string(toks[start_token:start_token+31], ' ')
                   AS chunk_text
            FROM st
        """,
        "repetition_profile": r"""
            WITH d AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                FROM documents
            ),
            base AS (
                SELECT doc_id, toks,
                       length(array_to_string(toks, ' '))::BIGINT AS total
                FROM d
            ),
            g AS (
                SELECT doc_id, total, n.n,
                       array_to_string(toks[s.s:s.s+n.n-1], ' ') AS gram
                FROM base, (VALUES (2), (3)) n(n),
                     unnest(generate_series(1, len(toks) - n.n + 1)) s(s)
            ),
            c AS (
                SELECT doc_id, total, n, gram, count(*) AS cnt
                FROM g GROUP BY ALL
            ),
            r AS (
                SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                             ORDER BY cnt DESC, gram) AS rn
                FROM c
            ),
            p AS (
                SELECT doc_id,
                    max(CASE WHEN n=2 AND rn=1 THEN gram END) AS top2_gram,
                    coalesce(max(CASE WHEN n=2 AND rn=1
                                 THEN round(cnt*length(gram)/total, 6) END),
                             0.0) AS top2_char_frac,
                    max(CASE WHEN n=3 AND rn=1 THEN gram END) AS top3_gram,
                    coalesce(max(CASE WHEN n=3 AND rn=1
                                 THEN round(cnt*length(gram)/total, 6) END),
                             0.0) AS top3_char_frac,
                    coalesce(round(sum(CASE WHEN n=3 AND cnt>=2
                                       THEN cnt*length(gram) END)
                                   / max(total), 6),
                             0.0) AS dup3_char_frac
                FROM r GROUP BY doc_id
            )
            SELECT b.doc_id, p.top2_gram,
                   coalesce(p.top2_char_frac, 0.0) AS top2_char_frac,
                   p.top3_gram,
                   coalesce(p.top3_char_frac, 0.0) AS top3_char_frac,
                   coalesce(p.dup3_char_frac, 0.0) AS dup3_char_frac,
                   (coalesce(p.top2_char_frac, 0.0) <= 0.20
                    AND coalesce(p.top3_char_frac, 0.0) <= 0.18
                    AND coalesce(p.dup3_char_frac, 0.0) <= 1.0) AS rep_pass
            FROM (SELECT doc_id FROM base) b LEFT JOIN p USING (doc_id)
        """,
        "caption_pairs": f"""
            WITH spans AS ({_INTERLEAVED_SPANS_SQL}),
            w AS (
                SELECT doc_id, ord, kind, media_ref,
                       last_value(CASE WHEN kind IN ('text', 'heading')
                                       THEN text END IGNORE NULLS)
                         OVER (PARTITION BY doc_id ORDER BY ord
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS text_before,
                       first_value(CASE WHEN kind IN ('text', 'heading')
                                        THEN text END IGNORE NULLS)
                         OVER (PARTITION BY doc_id ORDER BY ord
                               ROWS BETWEEN 1 FOLLOWING
                               AND UNBOUNDED FOLLOWING) AS text_after
                FROM spans
            )
            SELECT doc_id, ord, media_ref, text_before, text_after,
                   coalesce(text_after, text_before) AS caption
            FROM w WHERE kind = 'image'
        """,
        "caption_alignment": f"""
            WITH spans AS ({_INTERLEAVED_SPANS_SQL}),
            w AS (
                SELECT doc_id, ord, kind, media_ref,
                       last_value(CASE WHEN kind IN ('text', 'heading')
                                       THEN text END IGNORE NULLS)
                         OVER (PARTITION BY doc_id ORDER BY ord
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS text_before,
                       first_value(CASE WHEN kind IN ('text', 'heading')
                                        THEN text END IGNORE NULLS)
                         OVER (PARTITION BY doc_id ORDER BY ord
                               ROWS BETWEEN 1 FOLLOWING
                               AND UNBOUNDED FOLLOWING) AS text_after
                FROM spans
            ),
            pairs AS (
                SELECT doc_id, ord, media_ref,
                       array_to_string(string_split_regex(
                           coalesce(text_after, text_before), '\\s+')[1:77],
                           ' ') AS caption
                FROM w WHERE kind = 'image'
            ),
            toks AS (
                SELECT doc_id, ord,
                       unnest(list_filter(
                           string_split(trim(regexp_replace(
                               lower(caption), '[^a-z0-9]+', ' ', 'g')), ' '),
                           t -> t <> '')) AS tok
                FROM pairs
            ),
            cells AS (
                SELECT doc_id, ord,
                       CAST(('0x' || substr(md5('fh1:' || tok), 1, 8)) AS BIGINT)
                           % 8 AS i,
                       sum(CASE WHEN CAST(('0x' || substr(md5('fh2:' || tok), 1, 8))
                                          AS BIGINT) % 2 = 0
                                THEN 1 ELSE -1 END) AS c
                FROM toks GROUP BY 1, 2, 3
            ),
            grid AS (
                SELECT p.doc_id, p.ord, p.media_ref, g.i
                FROM pairs p, unnest(generate_series(0, 7)) g(i)
            ),
            vecs AS (
                SELECT g.doc_id, g.ord, g.i,
                       COALESCE(c.c, 0)::DOUBLE AS t,
                       (CAST(('0x' || substr(md5(
                            'im:' || g.media_ref || ':' || g.i), 1, 8))
                         AS BIGINT) % 9 - 4)::DOUBLE AS v
                FROM grid g
                LEFT JOIN cells c ON g.doc_id = c.doc_id AND g.ord = c.ord
                                  AND g.i = c.i
            ),
            agg AS (
                SELECT doc_id, ord,
                       sum(t * v) AS dot, sum(t * t) AS nt, sum(v * v) AS nv
                FROM vecs GROUP BY 1, 2
            )
            SELECT p.doc_id, p.ord, p.media_ref,
                   round(CASE WHEN a.nt > 0 AND a.nv > 0
                              THEN a.dot / sqrt(a.nt * a.nv) END, 6) AS score,
                   CASE WHEN a.nt > 0 AND a.nv > 0
                             AND round(a.dot / sqrt(a.nt * a.nv), 6) >= 0.3
                        THEN 1 ELSE 0 END AS keep
            FROM pairs p JOIN agg a ON p.doc_id = a.doc_id AND p.ord = a.ord
        """,
        "template_clusters": f"""
            WITH spans AS ({_INTERLEAVED_SPANS_SQL}),
            per_doc AS (
                SELECT doc_id,
                       string_agg(kind, '>' ORDER BY ord) AS skeleton
                FROM spans GROUP BY 1
            )
            SELECT md5(skeleton) AS template_id, skeleton,
                   count(*)::BIGINT AS n_docs,
                   min(doc_id) AS example_doc
            FROM per_doc GROUP BY skeleton
        """,
        "span_langid_profile": f"""
            WITH spans AS ({_INTERLEAVED_SPANS_SQL}),
            pats(lang_c, pat) AS (VALUES {_trigram_pats_sql()}),
            txt AS (
                SELECT doc_id, ord, text FROM spans
                WHERE kind IN ('text', 'heading')
            ),
            scores AS (
                SELECT t.doc_id, t.ord, p.lang_c,
                       len(regexp_extract_all(lower(t.text), p.pat)) AS score
                FROM txt t CROSS JOIN pats p
            ),
            ranked AS (
                SELECT doc_id, ord, lang_c, score,
                       row_number() OVER (
                           PARTITION BY doc_id, ord
                           ORDER BY score DESC, lang_c DESC
                       ) AS rn
                FROM scores
            ),
            langs AS (
                SELECT doc_id, ord,
                       CASE WHEN score > 0 THEN lang_c ELSE 'und' END AS lang
                FROM ranked WHERE rn = 1
            ),
            sw AS (
                SELECT doc_id,
                       CASE WHEN lag(lang) OVER
                                 (PARTITION BY doc_id ORDER BY ord) IS NULL
                            THEN 0
                            WHEN lang <> lag(lang) OVER
                                 (PARTITION BY doc_id ORDER BY ord)
                            THEN 1 ELSE 0 END AS s
                FROM langs
            ),
            agg1 AS (
                SELECT doc_id, count(*)::BIGINT AS n_text_spans,
                       CAST(sum(s) AS BIGINT) AS code_switches
                FROM sw GROUP BY 1
            ),
            counts AS (
                SELECT doc_id, lang, count(*) AS c
                FROM langs GROUP BY 1, 2
            ),
            cranked AS (
                SELECT doc_id, lang, c,
                       row_number() OVER (
                           PARTITION BY doc_id ORDER BY c DESC, lang DESC
                       ) AS rn,
                       count(*) OVER (PARTITION BY doc_id) AS n_langs
                FROM counts
            ),
            dom AS (
                SELECT doc_id, CAST(n_langs AS BIGINT) AS n_langs,
                       lang AS dominant_lang
                FROM cranked WHERE rn = 1
            )
            SELECT a.doc_id, a.n_text_spans, d.n_langs, d.dominant_lang,
                   a.code_switches
            FROM agg1 a JOIN dom d ON a.doc_id = d.doc_id
        """,
        "interleave_profile": f"""
            WITH spans AS ({_INTERLEAVED_SPANS_SQL}),
            t AS (
                SELECT doc_id, ord,
                       CASE WHEN kind IN ('image', 'video', 'audio')
                            THEN 1 ELSE 0 END AS m,
                       lag(CASE WHEN kind IN ('image', 'video', 'audio')
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY ord) AS pm
                FROM spans
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_spans,
                   CAST(sum(m) AS BIGINT) AS n_media,
                   CAST(count(*) - sum(m) AS BIGINT) AS n_text,
                   CAST(sum(CASE WHEN pm IS NULL THEN 0
                                 WHEN m <> pm THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_switches,
                   CAST(min(CASE WHEN m = 1 THEN ord END) AS BIGINT)
                       AS first_media_ord,
                   round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS media_ratio
            FROM t GROUP BY doc_id
        """,
        "bigram_lm": r"""
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                   x -> x <> '') AS l
                FROM documents
            ),
            bg AS (
                SELECT doc_id,
                       unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
                FROM d
            ),
            b AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
            c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
            v AS (SELECT count(DISTINCT tok) AS v
                  FROM (SELECT unnest(l) AS tok FROM d)),
            s AS (
                SELECT b.doc_id,
                       CAST(round(-log2((c12.c12 + 1.0) / (c1.c1 + v.v)) * 1e9)
                            AS BIGINT) AS u
                FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
            ),
            p AS (
                SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(u) AS s
                FROM s GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CASE WHEN p.n_bigrams > 0
                        THEN ((p.s + (p.n_bigrams * 1000) // 2)
                              // (p.n_bigrams * 1000)) / 1000000.0
                   END AS avg_nll_bits
            FROM d LEFT JOIN p USING (doc_id)
        """,
        "multimodal_packing": f"""
            WITH spans AS ({_INTERLEAVED_SPANS_SQL}),
            costs AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN kind = 'image' THEN 64
                                ELSE len(string_split_regex(trim(text), '\\s+'))
                                END) AS BIGINT) AS n
                FROM spans GROUP BY doc_id
            ),
            cum AS (
                SELECT doc_id, n,
                       CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s,
                       CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS e
                FROM costs
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
        "ccnet_buckets": """
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
            ),
            per_doc AS (
                SELECT doc_id, count(*) AS n_tok,
                       round(sum(nll) / count(*), 6) AS avg_nll_bits
                FROM scored GROUP BY doc_id
            ),
            j AS (
                SELECT d.doc_id, d.lang,
                       CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_tokens,
                       p.avg_nll_bits
                FROM documents d LEFT JOIN per_doc p USING (doc_id)
            )
            SELECT doc_id, lang, n_tokens, avg_nll_bits,
                   CAST(ntile(3) OVER (PARTITION BY lang
                                       ORDER BY avg_nll_bits ASC NULLS LAST,
                                                doc_id) AS INTEGER) AS bucket_id,
                   CASE ntile(3) OVER (PARTITION BY lang
                                       ORDER BY avg_nll_bits ASC NULLS LAST,
                                                doc_id)
                        WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
                        ELSE 'middle' END AS bucket
            FROM j
        """,
        "span_corruption": r"""
            WITH d AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
                FROM documents
            ),
            b AS (
                SELECT doc_id, l, len(l) AS n, len(l) // 20 AS nb FROM d
            ),
            m AS (
                SELECT doc_id, l, n, nb,
                    CASE WHEN nb > 0 THEN
                        list_transform(generate_series(0, nb - 1), b ->
                            CAST(('0x' || substr(md5('span:' ||
                                 CAST(doc_id AS VARCHAR) || ':' ||
                                 CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 18)
                    ELSE [] END AS hs
                FROM b
            )
            SELECT doc_id,
                CAST(n AS BIGINT) AS n_tokens,
                CAST(nb * 3 AS BIGINT) AS n_masked,
                CASE WHEN nb > 0 THEN
                    array_to_string(
                        flatten(list_transform(generate_series(0, nb - 1), b ->
                            l[b*20+1 : b*20+hs[b+1]]
                            || ['<extra_id_' || CAST(b AS VARCHAR) || '>']
                            || l[b*20+hs[b+1]+4 : b*20+20]))
                        || l[nb*20+1 : n], ' ')
                ELSE array_to_string(l, ' ') END AS input_text,
                CASE WHEN nb > 0 THEN
                    array_to_string(list_transform(generate_series(0, nb - 1), b ->
                        '<extra_id_' || CAST(b AS VARCHAR) || '> ' ||
                        array_to_string(l[b*20+hs[b+1]+1 : b*20+hs[b+1]+3], ' ')),
                        ' ')
                ELSE '' END AS target_text
            FROM m
        """,
        "centroid_pr_curve": """
            WITH vals AS (
                SELECT vec_id, label,
                       generate_subscripts(embedding, 1) - 1 AS p,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ),
            cent AS (
                SELECT p, round(avg(v), 9) AS c
                FROM vals WHERE label = 0 GROUP BY p
            ),
            scored AS (
                SELECT vals.vec_id,
                       CASE WHEN vals.label = 0 THEN 1 ELSE 0 END AS y,
                       round(sum(vals.v * cent.c)
                             / (sqrt(sum(vals.v * vals.v))
                                * sqrt(sum(cent.c * cent.c))), 9) AS cos
                FROM vals JOIN cent USING (p)
                GROUP BY vals.vec_id, vals.label
            ),
            agg AS (
                SELECT round(cos, 2) AS threshold,
                       count(*) AS n, CAST(sum(y) AS BIGINT) AS p
                FROM scored WHERE cos IS NOT NULL GROUP BY 1
            ),
            cum AS (
                SELECT threshold,
                       CAST(sum(p) OVER (ORDER BY threshold DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS tp,
                       CAST(sum(n) OVER (ORDER BY threshold DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cn
                FROM agg
            ),
            t AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all FROM agg)
            SELECT threshold, tp, cn - tp AS fp,
                   t.tp_all - tp AS fn,
                   round(tp * 1.0 / cn, 6) AS "precision",
                   round(tp * 1.0 / t.tp_all, 6) AS recall,
                   round(2.0 * tp / (2 * tp + (cn - tp) + (t.tp_all - tp)), 6)
                       AS f1
            FROM cum CROSS JOIN t
        """,
        "remove_duplicate_spans": """
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
            r AS (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY gram
                                          ORDER BY doc_id, pos) AS rn
                FROM g
            ),
            m AS (SELECT doc_id, pos FROM r WHERE rn > 1),
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
            ),
            ext AS (
                SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
                FROM sp GROUP BY doc_id, span_id
            ),
            per_doc AS (
                SELECT doc_id, list({'s': s, 'e': e}) AS spans
                FROM ext GROUP BY doc_id
            ),
            cut AS (
                SELECT t.doc_id, t.w,
                       list_filter(t.w, (x, i) ->
                           len(list_filter(coalesce(p.spans, []),
                               sp -> sp['s'] <= i AND i <= sp['e'])) = 0
                       ) AS kept
                FROM toks t LEFT JOIN per_doc p USING (doc_id)
            )
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(len(w) - len(kept) AS BIGINT) AS n_removed,
                   -- array_to_string([]) is NULL in DuckDB, '' in Spark
                   coalesce(array_to_string(kept, ' '), '') AS clean_text
            FROM cut
        """,
        "quality_funnel": """
            WITH base AS (
                SELECT doc_id, text, lang,
                       string_split_regex(trim(text), '\\s+') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents
            ),
            gm AS (
                SELECT doc_id, lang,
                       (len(toks) >= 50 AND len(toks) <= 100000
                        AND round(length(regexp_replace(text, '\\s', '', 'g'))
                                  / greatest(len(toks), 1), 6) BETWEEN 3 AND 10
                        AND round(len(list_filter(toks,
                                  t -> regexp_matches(t, '[A-Za-z]')))
                                  / greatest(len(toks), 1), 6) >= 0.8
                        AND round(len(list_filter(lines,
                                  l -> regexp_matches(trim(l), '^[-*•]')))
                                  / greatest(len(lines), 1), 6) <= 0.9
                        AND round(len(list_filter(lines,
                                  l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                                  / greatest(len(lines), 1), 6) <= 0.3
                        AND round(1.0 - len(list_distinct(lines))
                                  / greatest(len(lines), 1), 6) <= 0.3
                        AND round(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                                  / greatest(len(toks), 1), 6) <= 0.1
                       ) AS gopher_pass
                FROM base
            ),
            g AS (
                SELECT doc_id, base.toks AS w,
                       length(array_to_string(base.toks, ' '))::BIGINT AS total,
                       n.n,
                       array_to_string(base.toks[s.s:s.s+n.n-1], ' ') AS gram
                FROM base, (VALUES (2), (3)) n(n),
                     unnest(generate_series(1, len(base.toks) - n.n + 1)) s(s)
            ),
            c AS (
                SELECT doc_id, total, n, gram, count(*) AS cnt
                FROM g GROUP BY ALL
            ),
            rr AS (
                SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                             ORDER BY cnt DESC, gram) AS rn
                FROM c
            ),
            rep AS (
                SELECT doc_id,
                    (coalesce(max(CASE WHEN n=2 AND rn=1
                                  THEN round(cnt*length(gram)/total, 6) END),
                              0.0) <= 0.20
                     AND coalesce(max(CASE WHEN n=3 AND rn=1
                                  THEN round(cnt*length(gram)/total, 6) END),
                              0.0) <= 0.18
                     AND coalesce(round(sum(CASE WHEN n=3 AND cnt>=2
                                        THEN cnt*length(gram) END)
                                        / max(total), 6), 0.0) <= 1.0
                    ) AS rep_pass
                FROM rr GROUP BY doc_id
            ),
            j AS (
                SELECT gm.gopher_pass,
                       coalesce(rep.rep_pass, TRUE) AS rep_pass,
                       gm.lang = 'en' AS lang_ok
                FROM gm LEFT JOIN rep USING (doc_id)
            ),
            agg AS (
                SELECT count(*)::BIGINT AS n0,
                       CAST(sum(CASE WHEN rep_pass THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN rep_pass AND gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                       CAST(sum(CASE WHEN gopher_pass AND rep_pass AND lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n3
                FROM j
            )
            SELECT 0 AS stage_id, 'all_docs' AS stage, n0 AS n_surviving FROM agg
            UNION ALL
            SELECT 1, 'ngram_repetition', n1 FROM agg
            UNION ALL
            SELECT 2, 'gopher_rules', n2 FROM agg
            UNION ALL
            SELECT 3, 'target_lang_en', n3 FROM agg
        """,
        "matryoshka_eval": """
            WITH emb AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            pairs AS (
                SELECT a.v AS va, b.v AS vb
                FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
            ),
            ks AS (SELECT unnest([8, 16, 32]) AS k),
            c AS (
                SELECT ks.k AS prefix_dim,
                    round(list_dot_product(va, vb)
                          / (sqrt(list_dot_product(va, va))
                             * sqrt(list_dot_product(vb, vb))), 9) AS cf,
                    round(list_dot_product(va[1:ks.k], vb[1:ks.k])
                          / (sqrt(list_dot_product(va[1:ks.k], va[1:ks.k]))
                             * sqrt(list_dot_product(vb[1:ks.k], vb[1:ks.k]))),
                          9) AS cp
                FROM pairs, ks
            ),
            u AS (
                SELECT prefix_dim,
                       CAST(round((cf + 1.0) * 1e9) AS BIGINT) AS uf,
                       CAST(round((cp + 1.0) * 1e9) AS BIGINT) AS up,
                       CAST(round(abs(cp - cf) * 1e9) AS BIGINT) AS ud
                FROM c
            ),
            g AS (
                SELECT prefix_dim, count(*)::BIGINT AS n_pairs,
                       CAST(sum(uf) AS BIGINT) AS sf,
                       CAST(sum(up) AS BIGINT) AS sp,
                       CAST(sum(ud) AS BIGINT) AS sd
                FROM u GROUP BY 1
            )
            SELECT prefix_dim, n_pairs,
                ((sf + (n_pairs*1000)//2) // (n_pairs*1000)) / 1000000.0 - 1.0
                    AS mean_cos_full,
                ((sp + (n_pairs*1000)//2) // (n_pairs*1000)) / 1000000.0 - 1.0
                    AS mean_cos_prefix,
                ((sd + (n_pairs*1000)//2) // (n_pairs*1000)) / 1000000.0
                    AS mean_abs_diff
            FROM g
        """,
        "media_phash_neardup": """
            WITH src AS (
                SELECT vec_id AS media_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS l
                FROM embeddings
                UNION ALL
                SELECT vec_id + 100000,
                       list_transform(
                           list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           (x, i) -> CASE WHEN i = 1 THEN x * 1.5 ELSE x END)
                FROM embeddings WHERE vec_id % 20 = 0
            ),
            m AS (
                SELECT media_id, l,
                       list_reduce(l, (a, b) -> a + b) / len(l) AS mu
                FROM src
            ),
            bits AS (
                SELECT m.media_id,
                    bit_or(CASE WHEN s.s < 32 AND m.l[s.s+1] > m.mu
                           THEN (1::BIGINT << (31 - s.s)) ELSE 0 END) AS hi,
                    bit_or(CASE WHEN s.s >= 32 AND m.l[s.s+1] > m.mu
                           THEN (1::BIGINT << (63 - s.s)) ELSE 0 END) AS lo
                FROM m, unnest(generate_series(0, 63)) s(s)
                GROUP BY m.media_id
            )
            SELECT a.media_id AS id_a, b.media_id AS id_b,
                   CAST(bit_count(xor(a.hi, b.hi))
                        + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
            FROM bits a JOIN bits b ON a.media_id < b.media_id
            WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        """,
        # brute-force all-pairs twin of the banded Spark path: Haitsma-
        # Kalker bits are signs of double add/sub chains, IEEE-identical
        # across engines; equality of the oracle with the banded join is
        # the losslessness proof
        "audio_hk_neardup": """
            WITH src AS (
                SELECT vec_id AS media_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id + 100000,
                       list_transform(
                           list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           (x, i) -> CASE WHEN i = 1 THEN x + 7.5 ELSE x END)
                FROM embeddings WHERE vec_id % 25 = 0
            ),
            cells AS (
                SELECT media_id, f.f, b.b,
                       CASE WHEN e[f.f*8 + b.b + 1] - e[f.f*8 + b.b]
                                 - e[(f.f-1)*8 + b.b + 1] + e[(f.f-1)*8 + b.b]
                                 > 0
                            THEN 1 ELSE 0 END AS bit
                FROM src,
                     unnest(generate_series(1, 7)) f(f),
                     unnest(generate_series(1, 7)) b(b)
            ),
            fh AS (
                SELECT media_id, f,
                       CAST(SUM(bit * (1::BIGINT << (7 - b))) AS BIGINT) AS h
                FROM cells GROUP BY media_id, f
            ),
            fp AS (
                SELECT media_id, list(h ORDER BY f) AS fp
                FROM fh GROUP BY media_id
            ),
            scored AS (
                SELECT a.media_id AS id_a, b.media_id AS id_b,
                       (CASE WHEN a.fp[1] <> b.fp[1] THEN 1 ELSE 0 END
                      + CASE WHEN a.fp[2] <> b.fp[2] THEN 1 ELSE 0 END
                      + CASE WHEN a.fp[3] <> b.fp[3] THEN 1 ELSE 0 END
                      + CASE WHEN a.fp[4] <> b.fp[4] THEN 1 ELSE 0 END
                      + CASE WHEN a.fp[5] <> b.fp[5] THEN 1 ELSE 0 END
                      + CASE WHEN a.fp[6] <> b.fp[6] THEN 1 ELSE 0 END
                      + CASE WHEN a.fp[7] <> b.fp[7] THEN 1 ELSE 0 END
                       ) AS n_mismatch
                FROM fp a JOIN fp b ON a.media_id < b.media_id
            )
            SELECT id_a, id_b, CAST(n_mismatch AS INTEGER) AS n_mismatch
            FROM scored WHERE n_mismatch <= 1
        """,
        "interleaved_pii_redact": """
            WITH base AS (
                SELECT doc_id,
                       text || ' Contact user' || doc_id
                            || '@example.com from 10.0.'
                            || (doc_id % 256) || '.9 now' AS planted
                FROM documents
            ),
            spans AS (
                SELECT doc_id, 0 AS ord, 'heading' AS kind,
                       'Doc ' || doc_id AS text,
                       CAST(NULL AS VARCHAR) AS media_ref
                FROM base
                UNION ALL
                SELECT doc_id, 1, 'image', CAST(NULL AS VARCHAR),
                       'https://img.test/' || doc_id || '/hero.png'
                FROM base WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END, 'text',
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(planted,
                                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                                   '<EMAIL>', 'g'),
                               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                               '<IP>', 'g'),
                           '\\+[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g'),
                       CAST(NULL AS VARCHAR)
                FROM base
            )
            SELECT doc_id, CAST(ord AS INTEGER) AS ord, kind, text, media_ref
            FROM spans
        """,
        # the planted per-source subscription span is in 100% of each
        # source's docs (>= min_frac 0.5) -> deleted; headings and body
        # texts are unique within a source -> survive; order re-densified
        "span_boilerplate_strip": """
            SELECT doc_id, 0 AS ord, 'heading' AS kind,
                   'Doc ' || doc_id AS text,
                   CAST(NULL AS VARCHAR) AS media_ref
            FROM documents
            UNION ALL
            SELECT doc_id, 1, 'image', CAST(NULL AS VARCHAR),
                   'https://img.test/' || doc_id || '/x.png'
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END,
                   'text', text, CAST(NULL AS VARCHAR)
            FROM documents
        """,
        # the oracle is the PLAIN join — salt must never change the result
        "salted_domain_join": """
            WITH dim AS (
                SELECT source,
                       round(avg(n_chars), 6) AS src_avg_chars,
                       count(*) AS src_docs
                FROM documents GROUP BY source
            )
            SELECT d.doc_id, d.source, dim.src_avg_chars, dim.src_docs,
                   d.n_chars > dim.src_avg_chars AS above_avg
            FROM documents d JOIN dim ON d.source = dim.source
        """,
        # heading (2 tokens) always fits; the image (576) usually evicts
        # the body; docs without an image keep everything. Fixture has at
        # most one media span per doc, so the placeholder is <image_0>.
        "interleaved_sample_render": """
            WITH spans AS (
                SELECT doc_id, 1 AS pos, 'heading' AS kind,
                       'Doc ' || doc_id AS text,
                       CAST(NULL AS VARCHAR) AS ref
                FROM documents
                UNION ALL
                SELECT doc_id, 2, 'image', CAST(NULL AS VARCHAR),
                       'https://img.test/' || doc_id || '/x.png'
                FROM documents WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id, 3, 'text', text, CAST(NULL AS VARCHAR)
                FROM documents
            ),
            costed AS (
                SELECT doc_id, pos, kind, text, ref,
                       CAST(CASE WHEN kind = 'image' THEN 576
                            WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                       END AS BIGINT) AS cost
                FROM spans
            ),
            cum AS (
                SELECT *, SUM(cost) OVER (
                    PARTITION BY doc_id ORDER BY pos
                ) AS c
                FROM costed
            ),
            tot AS (SELECT doc_id, COUNT(*) AS n FROM costed GROUP BY doc_id),
            kept AS (SELECT * FROM cum WHERE c <= 600),
            agg AS (
                SELECT doc_id,
                       CAST(COUNT(*) AS INTEGER) AS n_spans_kept,
                       CAST(MAX(c) AS BIGINT) AS cost_kept,
                       string_agg(
                           CASE WHEN kind = 'image' THEN '<image_0>'
                                ELSE text END, chr(10) || chr(10)
                           ORDER BY pos) AS sample,
                       COALESCE(string_agg(
                           CASE WHEN kind = 'image' THEN ref END, '|'
                           ORDER BY pos), '') AS refs,
                       CAST(COUNT(CASE WHEN kind = 'image' THEN 1 END)
                            AS INTEGER) AS n_media
                FROM kept GROUP BY doc_id
            )
            SELECT a.doc_id, a.n_spans_kept,
                   CAST(t.n - a.n_spans_kept AS INTEGER) AS n_spans_dropped,
                   a.cost_kept, a.sample, a.refs, a.n_media
            FROM agg a JOIN tot t ON a.doc_id = t.doc_id
        """,
        "cetr_classify": """
            WITH l0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,7}'),
                           (x, i) -> {'ln': CAST(i - 1 AS BIGINT),
                                      'txt': x})) AS u
                FROM documents
            ),
            lines AS (
                SELECT doc_id, u.ln AS line_no,
                       CASE (doc_id + 5 * u.ln) % 4
                       WHEN 0 THEN '<div class="nav"><a href="/x">'
                                   || u.txt
                                   || '</a> <a href="/y">more</a></div>'
                       WHEN 1 THEN '<p>' || u.txt || '</p>'
                       WHEN 3 THEN '<li><a href="#">' || u.txt
                                   || '</a></li>'
                       ELSE u.txt END AS html
                FROM l0
            ),
            feat AS (
                SELECT doc_id, line_no,
                       CAST(length(html) - length(replace(html, '<', ''))
                            AS BIGINT) AS tag_count,
                       CAST(length(regexp_replace(html, '<[^>]*>', '', 'g'))
                            AS BIGINT) AS text_chars
                FROM lines
            ),
            tr AS (
                SELECT *, text_chars * 1000000 // greatest(tag_count, 1)
                          AS tr_micro
                FROM feat
            ),
            taps AS (
                SELECT doc_id, line_no, tag_count, text_chars, tr_micro,
                       lag(tr_micro, 2) OVER w AS p2,
                       lag(tr_micro, 1) OVER w AS p1,
                       lead(tr_micro, 1) OVER w AS n1,
                       lead(tr_micro, 2) OVER w AS n2
                FROM tr
                WINDOW w AS (PARTITION BY doc_id ORDER BY line_no)
            ),
            sm AS (
                SELECT doc_id, line_no, tag_count, text_chars, tr_micro,
                       (coalesce(p2, 0) * 1 + coalesce(p1, 0) * 4
                        + tr_micro * 6
                        + coalesce(n1, 0) * 4 + coalesce(n2, 0) * 1)
                       // (CASE WHEN p2 IS NULL THEN 0 ELSE 1 END
                           + CASE WHEN p1 IS NULL THEN 0 ELSE 4 END
                           + 6
                           + CASE WHEN n1 IS NULL THEN 0 ELSE 4 END
                           + CASE WHEN n2 IS NULL THEN 0 ELSE 1 END)
                       AS smoothed_micro
                FROM taps
            ),
            dv AS (
                SELECT *,
                       CAST(abs(coalesce(lead(smoothed_micro, 1) OVER w,
                                         smoothed_micro)
                                - smoothed_micro) AS BIGINT) AS deriv_micro,
                       CAST(sum(smoothed_micro) OVER
                            (PARTITION BY doc_id) AS BIGINT) AS s,
                       count(*) OVER (PARTITION BY doc_id) AS c
                FROM sm
                WINDOW w AS (PARTITION BY doc_id ORDER BY line_no)
            )
            SELECT doc_id, line_no, tag_count, text_chars,
                   CAST(tr_micro AS BIGINT) AS tr_micro,
                   CAST(smoothed_micro AS BIGINT) AS smoothed_micro,
                   deriv_micro,
                   CAST(CASE WHEN smoothed_micro * c > s THEN 1 ELSE 0 END
                        AS INTEGER) AS is_content
            FROM dv
        """,
        "sitemap_ingest": """
            WITH e AS (
                SELECT doc_id, doc_id % 7 AS dom,
                       chr(10) || '  <url>' || chr(10)
                       || '    <loc> https://d' || (doc_id % 7)
                       || '.test/p' || doc_id || ' </loc>'
                       || CASE WHEN doc_id % 5 <> 0
                          THEN chr(10) || '    <lastmod>2026-0'
                               || (1 + doc_id % 9) || '-15</lastmod>'
                          ELSE '' END
                       || CASE WHEN doc_id % 11 <> 0
                          THEN chr(10) || '    <changefreq>'
                               || (CASE WHEN doc_id % 13 = 0 THEN 'never'
                                   ELSE (CASE doc_id % 6
                                         WHEN 0 THEN 'always'
                                         WHEN 1 THEN 'hourly'
                                         WHEN 2 THEN 'daily'
                                         WHEN 3 THEN 'weekly'
                                         WHEN 4 THEN 'monthly'
                                         ELSE 'yearly' END) END)
                               || '</changefreq>'
                          ELSE '' END
                       || CASE WHEN doc_id % 10 <> 3
                          THEN chr(10) || '    <priority>0.'
                               || (doc_id % 10) || '</priority>'
                          ELSE '' END
                       || chr(10) || '  </url>' AS entry
                FROM documents
            ),
            leaf AS (
                SELECT 'https://d' || dom || '.test/sitemap.xml'
                           AS sitemap_url,
                       '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
                       || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                       || string_agg(entry, '' ORDER BY doc_id)
                       || chr(10) || '</urlset>' AS xml
                FROM e GROUP BY dom
            ),
            idx AS (
                SELECT 'https://hub.test/sitemap_index.xml' AS sitemap_url,
                       '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
                       || '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                       || string_agg(
                              chr(10) || '  <sitemap>' || chr(10)
                              || '    <loc>https://d' || k
                              || '.test/sitemap.xml</loc>' || chr(10)
                              || '    <lastmod>2026-01-0' || (k + 1)
                              || '</lastmod>' || chr(10) || '  </sitemap>',
                              '' ORDER BY k)
                       || chr(10) || '</sitemapindex>' AS xml
                FROM (SELECT DISTINCT doc_id % 7 AS k FROM documents)
            ),
            files AS (
                SELECT * FROM leaf UNION ALL SELECT * FROM idx
            ),
            parsed AS (
                SELECT sitemap_url, 'url' AS kind,
                       unnest(regexp_extract_all(
                           xml, '(?s)<url\\b[^>]*>(.*?)</url>', 1)) AS body
                FROM files
                UNION ALL
                SELECT sitemap_url, 'sitemap',
                       unnest(regexp_extract_all(
                           xml, '(?s)<sitemap\\b[^>]*>(.*?)</sitemap>', 1))
                FROM files
            ),
            fields AS (
                SELECT sitemap_url, kind,
                       nullif(trim(regexp_extract(
                           body, '(?s)<loc>(.*?)</loc>', 1)), '') AS loc,
                       nullif(trim(regexp_extract(
                           body, '(?s)<lastmod>(.*?)</lastmod>', 1)), '')
                           AS lastmod,
                       nullif(trim(regexp_extract(
                           body, '(?s)<changefreq>(.*?)</changefreq>', 1)),
                           '') AS changefreq,
                       nullif(trim(regexp_extract(
                           body, '(?s)<priority>(.*?)</priority>', 1)), '')
                           AS pr
                FROM parsed
            )
            SELECT sitemap_url, kind, loc, lastmod, changefreq,
                   CAST(CASE changefreq
                        WHEN 'always' THEN 0
                        WHEN 'hourly' THEN 1
                        WHEN 'daily' THEN 24
                        WHEN 'weekly' THEN 168
                        WHEN 'monthly' THEN 730
                        WHEN 'yearly' THEN 8766 END AS BIGINT)
                       AS freq_hours,
                   CAST(coalesce(round(CAST(pr AS DOUBLE) * 1000), 500)
                        AS BIGINT) AS priority_milli
            FROM fields
        """,
        "recrawl_schedule": """
            WITH entries AS (
                SELECT 'https://d' || (doc_id % 7) || '.test/p' || doc_id
                           AS loc,
                       CASE WHEN doc_id % 5 <> 0
                            THEN '2026-0' || (1 + doc_id % 9) || '-15'
                            END AS lastmod,
                       CASE WHEN doc_id % 11 <> 0 THEN
                            CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
                                 ELSE (CASE doc_id % 6
                                       WHEN 0 THEN 0 WHEN 1 THEN 1
                                       WHEN 2 THEN 24 WHEN 3 THEN 168
                                       WHEN 4 THEN 730 ELSE 8766 END)
                                 END AS BIGINT)
                            END AS freq_hours,
                       CAST(CASE WHEN doc_id % 10 <> 3
                            THEN doc_id % 10 * 100 ELSE 500 END AS BIGINT)
                           AS priority_milli,
                       doc_id
                FROM documents
            ),
            h AS (
                SELECT doc_id, unnest(range(0, 8)) AS r FROM documents
            ),
            s AS (
                SELECT doc_id, r,
                       CASE WHEN doc_id % 3 = 0 AND r = doc_id % 8
                                THEN 'added'
                            WHEN (doc_id * (r + 1) + r * r) % 5 = 0
                                THEN 'changed'
                            ELSE 'unchanged' END AS status
                FROM h
            ),
            a AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_visits,
                       CAST(sum(CASE WHEN status = 'changed'
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
                FROM s WHERE status IN ('changed', 'unchanged')
                GROUP BY doc_id
            ),
            rates AS (
                SELECT 'https://d' || (doc_id % 7) || '.test/p' || doc_id
                           AS loc,
                       round(-ln((n_visits - n_changes + 0.5) /
                                 (n_visits + 0.5)), 6) AS rate_cho
                FROM a
            ),
            j AS (
                SELECT e.loc, e.lastmod,
                       CAST(date_diff('day', CAST(e.lastmod AS DATE),
                                      DATE '2026-06-15') AS BIGINT)
                           AS days_since,
                       e.freq_hours,
                       CASE WHEN r.rate_cho > 0
                            THEN CAST(floor(24.0 / r.rate_cho) AS BIGINT)
                            END AS hours_obs,
                       e.priority_milli
                FROM entries e LEFT JOIN rates r ON e.loc = r.loc
            )
            SELECT loc, lastmod, days_since, freq_hours, hours_obs,
                   CAST(coalesce(hours_obs, freq_hours, 168) AS BIGINT)
                       AS interval_hours,
                   priority_milli,
                   CAST(CASE WHEN lastmod IS NULL THEN 1
                        WHEN days_since * 24 >=
                             coalesce(hours_obs, freq_hours, 168)
                        THEN 1 ELSE 0 END AS INTEGER) AS is_due
            FROM j
        """,
        "cdx_index": """
            WITH caps AS (
                SELECT CASE doc_id % 6
                       WHEN 0 THEN 'https://WWW.' || source
                            || '.Example.COM:443/Docs/' || doc_id
                            || '?b=2&a=1#frag'
                       WHEN 1 THEN 'http://' || source
                            || '.example.com:8080/Page/' || doc_id
                       WHEN 2 THEN 'https://www2.' || source
                            || '.example.com/x/y'
                       WHEN 3 THEN 'http://' || source
                            || '.example.com:80/p?z=1'
                       WHEN 4 THEN 'ftp://files.' || source
                            || '.example.com'
                       ELSE 'not a url ' || doc_id END AS url,
                       '20260615' || lpad(CAST(doc_id % 86400 AS VARCHAR),
                                          6, '0') AS ts,
                       CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                            ELSE 'application/pdf' END AS mime,
                       CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 404
                            ELSE 301 END AS status,
                       text AS payload
                FROM documents
            ),
            parts AS (
                SELECT *, lower(trim(url)) AS u FROM caps
            ),
            ext AS (
                SELECT *,
                       regexp_extract(u, '^([a-z][a-z0-9+.\\-]*)://', 1)
                           AS scheme,
                       regexp_extract(u,
                           '^[a-z][a-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#]+)',
                           1) AS hostport,
                       regexp_extract(u,
                           '^[a-z][a-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1)
                           AS rawpath,
                       regexp_extract(u, '\\?([^#]*)', 1) AS rawq
                FROM parts
            ),
            hp AS (
                SELECT *,
                       regexp_replace(regexp_extract(hostport, '^([^:]+)', 1),
                                      '^www[0-9]*\\.', '') AS host,
                       regexp_extract(hostport, ':([0-9]+)$', 1) AS port
                FROM ext
            ),
            k AS (
                SELECT *,
                       CASE WHEN host = '' THEN NULL
                            ELSE array_to_string(
                                     list_reverse(string_split(host, '.')),
                                     ',')
                                 || (CASE WHEN port = ''
                                          OR (scheme = 'http'
                                              AND port = '80')
                                          OR (scheme = 'https'
                                              AND port = '443')
                                     THEN '' ELSE ':' || port END)
                                 || ')'
                                 || (CASE WHEN rawpath = '' THEN '/'
                                     ELSE rawpath END)
                                 || (CASE WHEN rawq = '' THEN ''
                                     ELSE '?' || array_to_string(
                                              list_sort(
                                                  string_split(rawq, '&')),
                                              '&') END)
                            END AS urlkey
                FROM hp
            )
            SELECT urlkey, ts AS timestamp, url AS original, mime,
                   CAST(status AS INTEGER) AS status,
                   sha256(payload) AS digest,
                   CAST(length(payload) AS BIGINT) AS length
            FROM k
        """,
        "unigram_encode": _unigram_encode_oracle(),
        "unigram_em_counts": _unigram_em_oracle(),
        "unigram_doc_tokens": _unigram_doc_tokens_oracle(),
        "wordpiece_encode": _wordpiece_encode_oracle(),
        "wordpiece_doc_tokens": _wordpiece_doc_tokens_oracle(),
        "tokenizer_fertility_trio": _tokenizer_trio_oracle(),
        "hilbert_events": _hilbert_oracle(),
        "ensemble_extract": """
            WITH l0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '\\S+( \\S+){0,24}'),
                           (x, i) -> {'pn': CAST(i - 1 AS BIGINT),
                                      'txt': x})) AS u
                FROM documents
            ),
            pars AS (
                SELECT doc_id, u.pn AS par_no, u.txt AS text FROM l0
            ),
            feat AS (
                SELECT doc_id, par_no, text,
                       CAST(length(text) AS BIGINT) AS length,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       CAST(CASE (doc_id + 3 * par_no) % 7
                            WHEN 0 THEN length(text) // 2
                            WHEN 1 THEN length(text) // 10
                            ELSE 0 END AS BIGINT) AS link_chars,
                       len(list_filter(string_split(text, ' '),
                           w -> list_contains(
                               ['a', 'the', 'table', 'value'],
                               lower(w)))) AS n_stop
                FROM pars
            ),
            flags AS (
                SELECT doc_id, par_no, text, length, n_words, link_chars,
                       link_chars / greatest(length, 1) AS ld,
                       CASE WHEN n_words > 0
                            THEN n_stop / n_words ELSE 0.0 END AS sd
                FROM feat
            ),
            cf AS (
                SELECT doc_id, par_no, length, n_words, ld, sd,
                       CASE WHEN ld > 0.2 THEN 'bad'
                            WHEN length < 70 THEN
                                 CASE WHEN ld > 0 THEN 'bad' ELSE 'short' END
                            WHEN sd >= 0.18 THEN
                                 CASE WHEN length > 120
                                      THEN 'good' ELSE 'neargood' END
                            WHEN sd >= 0.12 THEN 'neargood'
                            ELSE 'bad' END AS cf_class
                FROM flags
            ),
            p1 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb,
                       COALESCE(first_value(CASE WHEN cf_class IN
                               ('good', 'bad') THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb,
                       COALESCE(last_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_any,
                       COALESCE(first_value(CASE WHEN cf_class <> 'short'
                               THEN cf_class END
                               IGNORE NULLS) OVER wn, 'bad') AS next_any
                FROM cf
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            r1 AS (
                SELECT doc_id, par_no, cf_class,
                       CASE WHEN cf_class <> 'short' THEN cf_class
                            WHEN prev_gb = 'good' AND next_gb = 'good'
                                 THEN 'good'
                            WHEN prev_gb = 'bad' AND next_gb = 'bad'
                                 THEN 'bad'
                            WHEN (prev_gb = 'bad' AND prev_any = 'neargood')
                              OR (next_gb = 'bad' AND next_any = 'neargood')
                                 THEN 'good'
                            ELSE 'bad' END AS c1
                FROM p1
            ),
            p2 AS (
                SELECT *,
                       COALESCE(last_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wp, 'bad') AS prev_gb2,
                       COALESCE(first_value(CASE WHEN c1 IN ('good', 'bad')
                               THEN c1 END
                               IGNORE NULLS) OVER wn, 'bad') AS next_gb2
                FROM r1
                WINDOW wp AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING),
                       wn AS (PARTITION BY doc_id ORDER BY par_no
                              ROWS BETWEEN 1 FOLLOWING
                                       AND UNBOUNDED FOLLOWING)
            ),
            jt AS (
                SELECT doc_id, par_no,
                       CAST(CASE WHEN (CASE WHEN c1 <> 'neargood' THEN c1
                                       WHEN prev_gb2 = 'bad'
                                            AND next_gb2 = 'bad' THEN 'bad'
                                       ELSE 'good' END)
                                 IN ('good', 'neargood')
                            THEN 1 ELSE 0 END AS INTEGER) AS v_justext
                FROM p2
            ),
            bp AS (
                SELECT doc_id, par_no,
                       CAST(CASE WHEN ld > 0.333333 THEN 0 ELSE
                            CASE WHEN coalesce(lag(ld) OVER w, 0.0)
                                      <= 0.555556 THEN
                                 CASE WHEN n_words <= 16 THEN
                                      CASE WHEN coalesce(
                                               lead(n_words) OVER w, 0)
                                               <= 15 THEN
                                           CASE WHEN coalesce(
                                                    lag(n_words) OVER w, 0)
                                                    <= 4
                                                THEN 0 ELSE 1 END
                                      ELSE 1 END
                                 ELSE 1 END
                            ELSE CASE WHEN n_words <= 40 THEN
                                      CASE WHEN coalesce(
                                               lead(n_words) OVER w, 0)
                                               <= 17
                                           THEN 0 ELSE 1 END
                                 ELSE 1 END END
                       END AS INTEGER) AS v_boilerpipe
                FROM flags
                WINDOW w AS (PARTITION BY doc_id ORDER BY par_no)
            ),
            ch AS (
                SELECT doc_id, par_no,
                       CASE (doc_id + 3 * par_no) % 7
                       WHEN 0 THEN '<div class="nav"><a href="/x">'
                                   || text || '</a></div>'
                       WHEN 1 THEN '<p><a href="/y">ln</a> ' || text
                                   || '</p>'
                       WHEN 2 THEN text
                       WHEN 3 THEN text
                       ELSE '<p>' || text || '</p>' END AS html
                FROM pars
            ),
            cfeat AS (
                SELECT doc_id, par_no,
                       CAST(length(html) - length(replace(html, '<', ''))
                            AS BIGINT) AS tag_count,
                       CAST(length(regexp_replace(html, '<[^>]*>', '', 'g'))
                            AS BIGINT) AS text_chars
                FROM ch
            ),
            ctr AS (
                SELECT *, text_chars * 1000000 // greatest(tag_count, 1)
                          AS tr_micro
                FROM cfeat
            ),
            ctaps AS (
                SELECT doc_id, par_no, tr_micro,
                       lag(tr_micro, 2) OVER w AS p2,
                       lag(tr_micro, 1) OVER w AS p1,
                       lead(tr_micro, 1) OVER w AS n1,
                       lead(tr_micro, 2) OVER w AS n2
                FROM ctr
                WINDOW w AS (PARTITION BY doc_id ORDER BY par_no)
            ),
            csm AS (
                SELECT doc_id, par_no,
                       (coalesce(p2, 0) * 1 + coalesce(p1, 0) * 4
                        + tr_micro * 6
                        + coalesce(n1, 0) * 4 + coalesce(n2, 0) * 1)
                       // (CASE WHEN p2 IS NULL THEN 0 ELSE 1 END
                           + CASE WHEN p1 IS NULL THEN 0 ELSE 4 END
                           + 6
                           + CASE WHEN n1 IS NULL THEN 0 ELSE 4 END
                           + CASE WHEN n2 IS NULL THEN 0 ELSE 1 END)
                       AS smoothed_micro
                FROM ctaps
            ),
            ce AS (
                SELECT doc_id, par_no,
                       CAST(CASE WHEN smoothed_micro
                                      * (count(*) OVER
                                         (PARTITION BY doc_id))
                                 > (sum(smoothed_micro) OVER
                                    (PARTITION BY doc_id))
                            THEN 1 ELSE 0 END AS INTEGER) AS v_cetr
                FROM csm
            )
            SELECT j.doc_id, j.par_no, j.v_justext, b.v_boilerpipe,
                   c.v_cetr,
                   CAST(j.v_justext + b.v_boilerpipe + c.v_cetr
                        AS INTEGER) AS votes,
                   CAST(CASE WHEN j.v_justext + b.v_boilerpipe + c.v_cetr
                                  >= 2 THEN 1 ELSE 0 END AS INTEGER)
                       AS is_content
            FROM jt j
            JOIN bp b ON j.doc_id = b.doc_id AND j.par_no = b.par_no
            JOIN ce c ON j.doc_id = c.doc_id AND j.par_no = c.par_no
        """,
        "politeness_slots": """
            WITH frontier AS (
                SELECT 'https://d' || (doc_id % 13) || '.test/p' || doc_id
                           AS loc,
                       'd' || (doc_id % 13) AS host,
                       CAST((doc_id % 10) * 100 AS BIGINT)
                           AS priority_milli
                FROM documents
            ),
            hosts AS (
                SELECT 'd' || k AS host,
                       CAST(500 * (1 + k % 4) AS BIGINT) AS crawl_delay_ms
                FROM (SELECT DISTINCT doc_id % 13 AS k FROM documents)
                WHERE k <> 0
            ),
            j AS (
                SELECT f.loc, f.host, f.priority_milli,
                       coalesce(h.crawl_delay_ms, 1000) AS crawl_delay_ms
                FROM frontier f LEFT JOIN hosts h ON f.host = h.host
            ),
            r AS (
                SELECT *,
                       CAST(row_number() OVER
                            (PARTITION BY host
                             ORDER BY priority_milli DESC, loc ASC)
                            AS BIGINT) AS slot,
                       CAST(count(*) OVER (PARTITION BY host) AS BIGINT)
                           AS n_host
                FROM j
            )
            SELECT loc, host, slot, crawl_delay_ms,
                   CAST((slot - 1) * crawl_delay_ms AS BIGINT)
                       AS fetch_offset_ms,
                   CAST(n_host * crawl_delay_ms AS BIGINT)
                       AS host_makespan_ms
            FROM r
        """,
        "robots_parse": """
            WITH hosts AS (
                SELECT DISTINCT doc_id % 13 AS k FROM documents
            ),
            files AS (
                SELECT 'd' || k AS host,
                       '# robots for d' || k || chr(10)
                       || 'Disallow: /ignored-before-group' || chr(10)
                       || 'User-agent: *' || chr(10)
                       || 'Disallow: /private' || chr(10)
                       || CASE WHEN k % 3 <> 0
                          THEN 'Crawl-delay: ' || (1 + k % 5) || chr(10)
                          ELSE '' END
                       || 'Allow: /public' || chr(10) || chr(10)
                       || CASE WHEN k % 2 = 0
                          THEN 'User-agent: badbot' || chr(10)
                               || 'User-agent: otherbot' || chr(10)
                               || 'Disallow: /' || chr(10)
                          ELSE '' END
                       || 'Sitemap: https://d' || k
                       || '.test/sitemap.xml' || chr(10)
                       || CASE WHEN k % 4 = 0
                          THEN 'Sitemap: https://d' || k
                               || '.test/sitemap2.xml'
                          ELSE '' END AS content
                FROM hosts
            ),
            l0 AS (
                SELECT host,
                       unnest(list_transform(
                           string_split(content, chr(10)),
                           (x, i) -> {'ln': CAST(i - 1 AS BIGINT),
                                      'raw': x})) AS u
                FROM files
            ),
            kv AS (
                SELECT host, u.ln AS line_no,
                       lower(regexp_extract(
                           trim(regexp_replace(u.raw, '#.*$', '')),
                           '^([A-Za-z\\-]+)\\s*:', 1)) AS key,
                       trim(regexp_extract(
                           trim(regexp_replace(u.raw, '#.*$', '')),
                           '^[A-Za-z\\-]+\\s*:(.*)$', 1)) AS value
                FROM l0
            ),
            p AS (
                SELECT * FROM kv WHERE key <> ''
            ),
            g AS (
                SELECT *,
                       CASE WHEN key = 'user-agent'
                                 AND coalesce(lag(CASE WHEN key =
                                     'user-agent' THEN 1 ELSE 0 END)
                                     OVER w, 0) = 0
                            THEN 1 ELSE 0 END AS opens
                FROM p
                WINDOW w AS (PARTITION BY host ORDER BY line_no)
            ),
            gi AS (
                SELECT *,
                       CAST(sum(opens) OVER
                            (PARTITION BY host ORDER BY line_no
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
                           AS group_id
                FROM g
            ),
            agents AS (
                SELECT host, group_id, lower(value) AS agent
                FROM gi WHERE key = 'user-agent'
            ),
            scoped AS (
                SELECT d.host, a.agent, d.key AS directive, d.value,
                       d.line_no
                FROM gi d JOIN agents a
                  ON d.host = a.host AND d.group_id = a.group_id
                WHERE d.key IN ('allow', 'disallow', 'crawl-delay')
            )
            SELECT host, agent, directive, value, line_no FROM scoped
            UNION ALL
            SELECT host, CAST(NULL AS VARCHAR) AS agent,
                   'sitemap' AS directive, value, line_no
            FROM gi WHERE key = 'sitemap'
        """,
        "cdx_merge": """
            WITH base AS (
                SELECT 'test,a' || (doc_id % 11) || ')/p' || doc_id
                           AS urlkey,
                       sha256(text) AS digest,
                       '20260101000000' AS first_ts,
                       CAST(1 AS BIGINT) AS n_captures,
                       CAST(length(text) AS BIGINT) AS length
                FROM documents
            ),
            today AS (
                SELECT 'test,a' || (doc_id % 11) || ')/p' || doc_id
                           AS urlkey,
                       sha256(CASE WHEN doc_id % 7 = 0
                              THEN text || ' v2' ELSE text END) AS digest,
                       '20260615000000' AS first_ts,
                       CAST(1 AS BIGINT) AS n_captures,
                       CAST(length(CASE WHEN doc_id % 7 = 0
                            THEN text || ' v2' ELSE text END) AS BIGINT)
                           AS length
                FROM documents WHERE doc_id % 3 = 0 OR doc_id % 7 = 0
            ),
            u AS (
                SELECT * FROM base UNION ALL SELECT * FROM today
            )
            SELECT urlkey, digest, min(first_ts) AS first_ts,
                   CAST(sum(n_captures) AS BIGINT) AS n_captures,
                   CAST(max(length) AS BIGINT) AS length
            FROM u GROUP BY urlkey, digest
        """,
        "semantic_delta": """
            WITH base AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
            ),
            newt AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                            WHEN doc_id % 11 = 0 THEN '  '
                                 || upper(replace(text, ' ',
                                                  chr(160) || ' '))
                                 || ' '
                            ELSE text END AS text
                FROM base
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id % 19 = 0
            ),
            od AS (
                SELECT doc_id, md5(text) AS o_raw,
                       md5(lower(trim(regexp_replace(
                           replace(replace(replace(replace(replace(replace(
                           replace(replace(text,
                           chr(8216), chr(39)), chr(8217), chr(39)),
                           chr(8220), '"'), chr(8221), '"'),
                           chr(8211), '-'), chr(8212), '-'),
                           chr(8230), '...'), chr(160), ' '),
                           '\\s+', ' ', 'g')))) AS o_norm
                FROM documents
            ),
            nd AS (
                SELECT doc_id, md5(text) AS n_raw,
                       md5(lower(trim(regexp_replace(
                           replace(replace(replace(replace(replace(replace(
                           replace(replace(text,
                           chr(8216), chr(39)), chr(8217), chr(39)),
                           chr(8220), '"'), chr(8221), '"'),
                           chr(8211), '-'), chr(8212), '-'),
                           chr(8230), '...'), chr(160), ' '),
                           '\\s+', ' ', 'g')))) AS n_norm
                FROM newt
            ),
            j AS (
                SELECT coalesce(od.doc_id, nd.doc_id) AS doc_id,
                       o_raw, o_norm, n_raw, n_norm
                FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id
            )
            SELECT doc_id,
                   CASE WHEN o_raw IS NULL THEN 'added'
                        WHEN n_raw IS NULL THEN 'removed'
                        WHEN o_raw = n_raw THEN 'unchanged'
                        WHEN o_norm = n_norm THEN 'cosmetic'
                        ELSE 'changed' END AS status
            FROM j
        """,
    }


def _unigram_dp_ctes() -> str:
    """Shared recursive-CTE Viterbi DP over the distinct-word dim,
    mirroring ops/unigram.py bit-for-bit (integer milli-log scores,
    struct (s, l) max with longer-piece tie-break)."""
    from reader_spark.ops.unigram import DEFAULT_PIECES, MAX_PIECE

    keys = ", ".join("'%s'" % p for p in DEFAULT_PIECES)
    vals = ", ".join(str(s) for s in DEFAULT_PIECES.values())
    dead = "{'s': CAST(-1000000000000000 AS BIGINT), 'l': 0}"
    cands = []
    for l in range(1, MAX_PIECE + 1):
        sub = f"substr(w, i - {l} + 1, {l})"
        sc = f"map_extract(mm, {sub})[1]"
        prev = f"b[i - {l} + 1]"
        cands.append(
            f"CASE WHEN i >= {l} AND len(map_extract(mm, {sub})) > 0 "
            f"AND {prev}.s > -500000000000000 "
            f"THEN {{'s': {prev}.s + {sc}, 'l': {l}}} ELSE {dead} END"
        )
    return f"""
            words AS (
                SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                FROM documents
            ),
            wf AS (SELECT w FROM words WHERE w <> ''),
            m AS (SELECT map([{keys}], [{vals}]) AS mm),
            dp AS (
                SELECT w, mm, 1 AS i,
                       [{{'s': CAST(0 AS BIGINT), 'l': 0}}] AS b
                FROM wf, m
                UNION ALL
                SELECT w, mm, i + 1,
                       list_append(b,
                           list_sort([{", ".join(cands)}])[{MAX_PIECE}])
                FROM dp WHERE i <= length(w)
            ),
            fin AS (
                SELECT w, b, b[length(w) + 1].s AS score, length(w) AS n
                FROM dp WHERE i = length(w) + 1
            ),
            bt AS (
                SELECT w, b, score, n AS pos,
                       CAST([] AS VARCHAR[]) AS toks
                FROM fin WHERE score > -500000000000000
                UNION ALL
                SELECT w, b, score, pos - b[pos + 1].l,
                       list_prepend(substr(w, pos - b[pos + 1].l + 1,
                                           b[pos + 1].l), toks)
                FROM bt WHERE pos > 0
            ),
            seg_ok AS (
                SELECT w AS word, CAST(len(toks) AS INTEGER) AS n_tokens,
                       CAST(score AS BIGINT) AS score_milli, toks
                FROM bt WHERE pos = 0
            ),
            seg_bad AS (
                SELECT w AS word, CAST(NULL AS INTEGER) AS n_tokens,
                       CAST(NULL AS BIGINT) AS score_milli,
                       CAST(NULL AS VARCHAR[]) AS toks
                FROM fin WHERE score <= -500000000000000
            )"""


def _unigram_encode_oracle() -> str:
    return f"""
        WITH RECURSIVE {_unigram_dp_ctes()}
        SELECT word, n_tokens, score_milli,
               array_to_string(toks, ' ') AS pieces
        FROM seg_ok
        UNION ALL
        SELECT word, n_tokens, score_milli, CAST(NULL AS VARCHAR) AS pieces
        FROM seg_bad
    """


def _unigram_em_oracle() -> str:
    return f"""
        WITH RECURSIVE {_unigram_dp_ctes()},
        freq AS (
            SELECT w, CAST(count(*) AS BIGINT) AS n_word
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE w <> '' GROUP BY w
        ),
        seg AS (
            SELECT f.n_word, unnest(o.toks) AS piece
            FROM seg_ok o JOIN freq f ON o.word = f.w
        ),
        counts AS (
            SELECT piece, CAST(sum(n_word) AS BIGINT) AS n_count
            FROM seg GROUP BY piece
        )
        SELECT piece, n_count,
               CAST(n_count * 1000000 // t AS BIGINT) AS p_micro
        FROM counts,
             (SELECT CAST(sum(n_count) AS BIGINT) AS t FROM counts) tt
    """


def _hilbert_oracle(bits: int = 8) -> str:
    """Hilbert xy->d walk as a recursive CTE, mirroring
    ops/hilbert.py's fold level-for-level in exact integer math."""
    scale = 1 << bits
    return f"""
        WITH RECURSIVE mm AS (
            SELECT min(user_id) AS minx, max(user_id) AS maxx,
                   min(epoch_us(ts)) AS miny, max(epoch_us(ts)) AS maxy
            FROM events
        ),
        b AS (
            SELECT event_id,
                   ((user_id - minx) * {scale}) // (maxx - minx + 1)
                       AS xb,
                   ((epoch_us(ts) - miny) * {scale}) // (maxy - miny + 1)
                       AS yb
            FROM events, mm
        ),
        walk AS (
            SELECT event_id, xb, yb, xb AS x, yb AS y,
                   CAST(0 AS BIGINT) AS d, {bits - 1} AS lvl
            FROM b
            UNION ALL
            SELECT event_id, xb, yb,
                   CASE WHEN ((y >> lvl) & 1) = 0
                        THEN CASE WHEN ((x >> lvl) & 1) = 1
                             THEN (1 << lvl) - 1 - y ELSE y END
                        ELSE x END,
                   CASE WHEN ((y >> lvl) & 1) = 0
                        THEN CASE WHEN ((x >> lvl) & 1) = 1
                             THEN (1 << lvl) - 1 - x ELSE x END
                        ELSE y END,
                   d + CAST((1 << lvl) AS BIGINT) * (1 << lvl)
                       * xor(3 * ((x >> lvl) & 1), (y >> lvl) & 1),
                   lvl - 1
            FROM walk WHERE lvl >= 0
        )
        SELECT event_id, xb AS user_id_bucket, yb AS ts_us_bucket,
               CAST(d AS BIGINT) AS h
        FROM walk WHERE lvl = -1
    """


def _unigram_doc_tokens_oracle() -> str:
    return f"""
        WITH RECURSIVE {_unigram_dp_ctes()},
        occ AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        occf AS (SELECT doc_id, w FROM occ WHERE w <> ''),
        seg AS (
            SELECT word, n_tokens FROM seg_ok
            UNION ALL
            SELECT word, n_tokens FROM seg_bad
        )
        SELECT o.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(coalesce(s.n_tokens, 0)) AS BIGINT)
                   AS unigram_tokens,
               CAST(sum(CASE WHEN s.n_tokens IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM occf o JOIN seg s ON o.w = s.word
        GROUP BY o.doc_id
    """


def _wordpiece_ctes() -> str:
    """Shared recursive-CTE greedy WordPiece walk over the distinct-
    word dim, mirroring ops/wordpiece.py bit-for-bit (longest-match
    first, ## continuation prefix, [UNK] on dead walk / oversize)."""
    from reader_spark.ops.wordpiece import DEFAULT_VOCAB, MAX_PIECE

    keys = ", ".join("'%s'" % p for p in DEFAULT_VOCAB)
    ones = ", ".join("1" for _ in DEFAULT_VOCAB)
    arms = []
    for l in range(MAX_PIECE, 0, -1):
        key = (
            f"CASE WHEN pos = 0 THEN substr(w, pos + 1, {l}) "
            f"ELSE '##' || substr(w, pos + 1, {l}) END"
        )
        arms.append(
            f"WHEN pos + {l} <= length(w) "
            f"AND len(map_extract(mm, {key})) > 0 THEN {l}"
        )
    adv = "CASE " + " ".join(arms) + " ELSE 0 END"
    return f"""
            wp_words AS (
                SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                FROM documents
            ),
            wp_wf AS (SELECT w FROM wp_words WHERE w <> ''),
            wp_m AS (SELECT map([{keys}], [{ones}]) AS mm),
            wp_walk AS (
                SELECT w, mm, 0 AS pos,
                       CAST([] AS VARCHAR[]) AS toks, FALSE AS dead
                FROM wp_wf, wp_m WHERE length(w) <= 24
                UNION ALL
                SELECT w, mm, pos + adv,
                       CASE WHEN adv > 0 THEN list_append(toks,
                            CASE WHEN pos = 0
                                 THEN substr(w, pos + 1, adv)
                                 ELSE '##' || substr(w, pos + 1, adv)
                            END) ELSE toks END,
                       adv = 0
                FROM (SELECT w, mm, pos, toks, {adv} AS adv
                      FROM wp_walk
                      WHERE NOT dead AND pos < length(w)) t
            ),
            wp_fin AS (
                SELECT w, toks FROM wp_walk
                WHERE NOT dead AND pos = length(w)
            ),
            wp_seg AS (
                SELECT w AS word, CAST(len(toks) AS INTEGER) AS n_tokens,
                       array_to_string(toks, ' ') AS pieces,
                       CAST(0 AS INTEGER) AS is_unk
                FROM wp_fin
                UNION ALL
                SELECT w, CAST(1 AS INTEGER), '[UNK]',
                       CAST(1 AS INTEGER)
                FROM wp_wf WHERE w NOT IN (SELECT w FROM wp_fin)
            )"""


def _wordpiece_encode_oracle() -> str:
    return f"""
        WITH RECURSIVE {_wordpiece_ctes()}
        SELECT word, n_tokens, pieces, is_unk FROM wp_seg
    """


def _wordpiece_doc_tokens_oracle() -> str:
    return f"""
        WITH RECURSIVE {_wordpiece_ctes()},
        occ AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        occf AS (SELECT doc_id, w FROM occ WHERE w <> '')
        SELECT o.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(s.n_tokens) AS BIGINT) AS wp_tokens,
               CAST(sum(s.is_unk) AS BIGINT) AS n_unk
        FROM occf o JOIN wp_seg s ON o.w = s.word
        GROUP BY o.doc_id
    """


def _tokenizer_trio_oracle() -> str:
    """Corpus-wide fertility scorecard across the three tokenizer
    families — one aggregate per family over its own certified twin
    (BPE chained-replace encode; unigram Viterbi DP; WordPiece greedy
    walk). BPE stages are MATERIALIZED: under WITH RECURSIVE an
    un-materialized chain re-evaluates per recursion step."""
    return f"""
        WITH RECURSIVE {_unigram_dp_ctes()},
        {_wordpiece_ctes()},
        bw AS MATERIALIZED (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''
                   )) AS word
            FROM documents
        ),
        benc AS MATERIALIZED (
            SELECT doc_id, {_bpe_word_sql('word')} AS s FROM bw
        ),
        bpe_tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum((length(s) - length(replace(s, '|', '')))
                            // 2) AS BIGINT) AS n_tokens
            FROM benc
        ),
        tocc AS (
            SELECT unnest(string_split(text, ' ')) AS ww FROM documents
        ),
        toccf AS (SELECT ww FROM tocc WHERE ww <> ''),
        uni_tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(coalesce(s.n_tokens, 0)) AS BIGINT)
                       AS n_tokens,
                   CAST(sum(CASE WHEN s.n_tokens IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
            FROM toccf o
            JOIN (SELECT word, n_tokens FROM seg_ok
                  UNION ALL
                  SELECT word, n_tokens FROM seg_bad) s
              ON o.ww = s.word
        ),
        wp_tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
                   CAST(sum(s.is_unk) AS BIGINT) AS n_oov
            FROM toccf o JOIN wp_seg s ON o.ww = s.word
        )
        SELECT 'bpe' AS tokenizer, n_words, n_tokens,
               CAST(0 AS BIGINT) AS n_oov,
               CASE WHEN n_words > 0
                    THEN CAST(n_tokens * 1000 // n_words AS BIGINT)
               END AS fertility_milli
        FROM bpe_tot
        UNION ALL
        SELECT 'unigram', n_words, n_tokens, n_oov,
               CASE WHEN n_words > 0
                    THEN CAST(n_tokens * 1000 // n_words AS BIGINT)
               END
        FROM uni_tot
        UNION ALL
        SELECT 'wordpiece', n_words, n_tokens, n_oov,
               CASE WHEN n_words > 0
                    THEN CAST(n_tokens * 1000 // n_words AS BIGINT)
               END
        FROM wp_tot
    """


# ---------------------------------------------------------------------------
# arena / rating layer + BTE extraction arm (queries/arena.py)
# ---------------------------------------------------------------------------

_BATTLES_CTE = """
        idx AS (
            SELECT doc_id,
                   doc_id % 6 AS ai,
                   CASE WHEN (doc_id // 6) % 6 = doc_id % 6
                        THEN ((doc_id // 6) % 6 + 1) % 6
                        ELSE (doc_id // 6) % 6 END AS bi
            FROM documents
        ),
        battles AS (
            SELECT doc_id,
                   'm' || CAST(ai AS VARCHAR) AS model_a,
                   'm' || CAST(bi AS VARCHAR) AS model_b,
                   'j' || CAST(doc_id % 4 AS VARCHAR) AS judge,
                   CASE WHEN (doc_id * 37 + 11 * ai)
                             % (200 + 120 * ai + 120 * bi)
                             < 100 + 120 * ai
                        THEN 1 ELSE 0 END AS win_a
            FROM idx
        ),
        stats AS (
            SELECT least(model_a, model_b) AS lo,
                   greatest(model_a, model_b) AS hi,
                   CAST(count(*) AS BIGINT) AS n_games,
                   CAST(sum(CASE WHEN model_a < model_b
                                 THEN win_a ELSE 1 - win_a END)
                        AS BIGINT) AS wins_lo
            FROM battles GROUP BY 1, 2
        ),
        directed AS (
            SELECT lo AS model, hi AS opponent, n_games, wins_lo AS wins
            FROM stats
            UNION ALL
            SELECT hi, lo, n_games, n_games - wins_lo FROM stats
        )"""

# One unrolled integer MM update: r{k} -> r{k+1}.
_BT_STEP = """
        d{k} AS (
            SELECT d.model,
                   CAST(sum(d.n_games * 1000000000
                            // (pi.p + pj.p)) AS BIGINT) AS denom
            FROM directed d
            JOIN r{k} pi ON d.model = pi.model
            JOIN r{k} pj ON d.opponent = pj.model
            GROUP BY d.model
        ),
        r{k1} AS (
            SELECT t.model,
                   greatest(CAST(1 AS BIGINT),
                            CAST(t.wins * 1000000000 // d{k}.denom
                                 AS BIGINT)) AS p
            FROM totals t JOIN d{k} ON t.model = d{k}.model
        )"""


def _arena_oracles() -> dict[str, str]:
    """Twins for the arena layer (ops/arena.py) and the BTE arm
    (ops/bte.py). The BT MM fixed point unrolls as CTE rounds over the
    bounded model dim — every division a trunc-div of non-negative
    BIGINTs, so ratings match Spark bit-for-bit. The BTE twin runs the
    identical packed-long Kadane over the same decorated token stream
    (2^24 base; both engines elect end = smallest argmax index and
    start = earliest minimizing prefix)."""
    bt_rounds = "".join(
        "," + _BT_STEP.format(k=k, k1=k + 1) for k in range(3)
    )
    bt = f"""
        WITH {_BATTLES_CTE},
        totals AS (
            SELECT model,
                   CAST(sum(n_games) AS BIGINT) AS n_games,
                   CAST(sum(wins) AS BIGINT) AS wins
            FROM directed GROUP BY model
        ),
        r0 AS (
            SELECT model, CAST(1000000 AS BIGINT) AS p FROM totals
        ){bt_rounds},
        anchor AS (
            SELECT p AS p_anchor FROM r3 ORDER BY model LIMIT 1
        )
        SELECT t.model, t.n_games, t.wins,
               r3.p AS p_micro,
               CAST(r3.p * 1000 // a.p_anchor AS BIGINT) AS rating_milli
        FROM totals t
        JOIN r3 ON t.model = r3.model
        CROSS JOIN anchor a
    """
    wm = f"""
        WITH {_BATTLES_CTE}
        SELECT model, opponent, n_games, wins,
               CAST(wins * 1000 // n_games AS BIGINT) AS win_rate_milli
        FROM directed
    """
    pb = f"""
        WITH {_BATTLES_CTE}
        SELECT judge,
               CAST(count(*) AS BIGINT) AS n_games,
               CAST(sum(win_a) AS BIGINT) AS first_wins,
               CAST(CAST(sum(win_a) AS BIGINT) * 1000 // count(*)
                    AS BIGINT) AS first_win_milli
        FROM battles GROUP BY judge
    """
    fleiss = """
        WITH lab AS (
            SELECT doc_id AS item_id, r,
                   'c' || CAST((doc_id % 4 + CASE WHEN (doc_id + r) % 5 = 0
                                                  THEN 1 ELSE 0 END) % 4
                               AS VARCHAR) AS category
            FROM documents,
                 unnest(generate_series(0, CASE WHEN doc_id % 41 = 0
                                                THEN 3 ELSE 2 END)) AS t(r)
        ),
        per_item AS (
            SELECT item_id, CAST(count(*) AS BIGINT) AS n_i
            FROM lab GROUP BY item_id
        ),
        dropped AS (
            SELECT CAST(count(*) AS BIGINT) AS n_items_dropped
            FROM per_item WHERE n_i <> 3
        ),
        cell AS (
            SELECT l.item_id, l.category, CAST(count(*) AS BIGINT) AS n_ik
            FROM lab l JOIN per_item p ON l.item_id = p.item_id
            WHERE p.n_i = 3
            GROUP BY l.item_id, l.category
        ),
        moments AS (
            SELECT CAST(count(DISTINCT item_id) AS BIGINT) AS n_items,
                   CAST(count(DISTINCT category) AS BIGINT) AS n_categories,
                   CAST(sum(n_ik * n_ik) AS BIGINT) AS sum_sq
            FROM cell
        ),
        cat_tot AS (
            SELECT category, CAST(sum(n_ik) AS BIGINT) AS c_k
            FROM cell GROUP BY category
        ),
        cat_moment AS (
            SELECT CAST(sum(c_k * c_k) AS BIGINT) AS pe_num FROM cat_tot
        ),
        base AS (
            SELECT m.n_items, CAST(3 AS BIGINT) AS n_raters,
                   m.n_categories, d.n_items_dropped,
                   m.sum_sq - m.n_items * 3 AS po_num,
                   m.n_items * 3 * 2 AS po_den,
                   c.pe_num,
                   m.n_items * 3 * m.n_items * 3 AS pe_den
            FROM moments m CROSS JOIN cat_moment c CROSS JOIN dropped d
        )
        SELECT n_items, n_raters, n_categories, n_items_dropped,
               CAST(po_num AS BIGINT) AS po_num,
               CAST(po_den AS BIGINT) AS po_den,
               pe_num,
               CAST(pe_den AS BIGINT) AS pe_den,
               CAST(po_num AS DOUBLE) / CAST(po_den AS DOUBLE) AS po,
               CAST(pe_num AS DOUBLE) / CAST(pe_den AS DOUBLE) AS pe,
               CASE WHEN pe_den > pe_num
                    THEN (CAST(po_num AS DOUBLE) / CAST(po_den AS DOUBLE)
                          - CAST(pe_num AS DOUBLE) / CAST(pe_den AS DOUBLE))
                         / (1.0 - CAST(pe_num AS DOUBLE)
                                  / CAST(pe_den AS DOUBLE))
               END AS kappa
        FROM base
    """
    bte_ctes = """
        toks AS (
            SELECT doc_id,
                   CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                        AS BIGINT) AS tok_no,
                   unnest(string_split(text, ' ')) AS token,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
            FROM documents
        ),
        tok2 AS (
            SELECT doc_id, tok_no, token,
                   CASE WHEN tok_no < doc_id % 6
                             OR tok_no >= n_toks - doc_id % 4
                             OR (doc_id + tok_no) % 7 = 0
                        THEN 1 ELSE 0 END AS is_tag
            FROM toks
        ),
        s1 AS (
            SELECT doc_id, tok_no, token, is_tag,
                   CAST(sum(1 - 2 * is_tag) OVER w AS BIGINT) AS pre,
                   CAST(sum(1 - is_tag) OVER w AS BIGINT) AS pw,
                   CAST(sum(is_tag) OVER w AS BIGINT) AS pt
            FROM tok2
            WINDOW w AS (PARTITION BY doc_id ORDER BY tok_no
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        s2 AS (
            SELECT *,
                   lag(pre, 1, CAST(0 AS BIGINT)) OVER w2 AS lag_pre,
                   lag(pw, 1, CAST(0 AS BIGINT)) OVER w2 AS lag_pw,
                   lag(pt, 1, CAST(0 AS BIGINT)) OVER w2 AS lag_pt
            FROM s1
            WINDOW w2 AS (PARTITION BY doc_id ORDER BY tok_no)
        ),
        s3 AS (
            SELECT *,
                   (lag_pre + 16777216) * 16777216 + tok_no AS packed_lag
            FROM s2
        ),
        s4 AS (
            SELECT *, min(packed_lag) OVER w3 AS run_min
            FROM s3
            WINDOW w3 AS (PARTITION BY doc_id ORDER BY tok_no
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        s5 AS (
            SELECT *,
                   run_min % 16777216 AS start_cand,
                   pre - (run_min // 16777216 - 16777216) AS best
            FROM s4
        ),
        elect AS (
            SELECT doc_id,
                   max((best + 16777216) * 16777216
                       + (16777215 - tok_no)) AS packed,
                   CAST(max(pt) AS BIGINT) AS total_tags
            FROM s5 GROUP BY doc_id
        ),
        e2 AS (
            SELECT doc_id, total_tags,
                   16777215 - packed % 16777216 AS end_tok
            FROM elect
        ),
        at_end AS (
            SELECT e2.doc_id, e2.total_tags, e2.end_tok,
                   s5.start_cand, s5.pw AS pw_end, s5.pt AS pt_end
            FROM e2 JOIN s5
              ON e2.doc_id = s5.doc_id AND e2.end_tok = s5.tok_no
        ),
        fin AS (
            SELECT a.doc_id,
                   CAST(a.start_cand AS BIGINT) AS start_tok,
                   CAST(a.end_tok AS BIGINT) AS end_tok,
                   CAST(a.pw_end - s5.lag_pw AS BIGINT) AS words_inside,
                   CAST(a.pt_end - s5.lag_pt AS BIGINT) AS tags_inside,
                   CAST(a.total_tags - (a.pt_end - s5.lag_pt)
                        + (a.pw_end - s5.lag_pw) AS BIGINT) AS bte_score
            FROM at_end a JOIN s5
              ON a.doc_id = s5.doc_id AND a.start_cand = s5.tok_no
        )"""
    bte_window = f"""
        WITH {bte_ctes}
        SELECT doc_id, start_tok, end_tok, words_inside, tags_inside,
               bte_score
        FROM fin
    """
    bte_extract = f"""
        WITH {bte_ctes}
        SELECT f.doc_id,
               coalesce(string_agg(t.token, ' ' ORDER BY t.tok_no), '')
                   AS content,
               CAST(count(t.token) AS BIGINT) AS n_words
        FROM fin f LEFT JOIN tok2 t
          ON t.doc_id = f.doc_id
         AND t.tok_no BETWEEN f.start_tok AND f.end_tok
         AND t.is_tag = 0
        GROUP BY f.doc_id
    """
    alpha = """
        WITH lab0 AS (
            SELECT doc_id AS item_id,
                   'r' || CAST(r AS VARCHAR) AS rater_id,
                   'c' || CAST((doc_id % 4 + CASE WHEN (doc_id + r) % 5 = 0
                                                  THEN 1 ELSE 0 END) % 4
                               AS VARCHAR) AS category
            FROM documents,
                 unnest(generate_series(0, CASE WHEN doc_id % 41 = 0
                                                THEN 3 ELSE 2 END)) AS t(r)
        ),
        lab AS (
            SELECT * FROM lab0
            WHERE NOT (item_id % 53 = 0 AND rater_id <> 'r0')
              AND NOT (item_id % 37 = 0 AND rater_id = 'r2')
        ),
        per_item AS (
            SELECT item_id, CAST(count(*) AS BIGINT) AS m_i
            FROM lab GROUP BY item_id
        ),
        dropped AS (
            SELECT CAST(sum(CASE WHEN m_i < 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_items_single,
                   CAST(sum(CASE WHEN m_i > 12 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_items_over_cap
            FROM per_item
        ),
        cell AS (
            SELECT l.item_id, p.m_i, l.category,
                   CAST(count(*) AS BIGINT) AS n_ic
            FROM lab l JOIN per_item p ON l.item_id = p.item_id
            WHERE p.m_i BETWEEN 2 AND 12
            GROUP BY l.item_id, p.m_i, l.category
        ),
        per_item_u AS (
            SELECT item_id, m_i,
                   CAST(sum(n_ic * (m_i - n_ic)) AS BIGINT) AS u_i
            FROM cell GROUP BY item_id, m_i
        ),
        do_dim AS (
            SELECT CAST(sum(u_i * (27720 // (m_i - 1))) AS BIGINT) AS do_num,
                   CAST(sum(m_i) AS BIGINT) AS n_pairable,
                   CAST(count(*) AS BIGINT) AS n_items_used
            FROM per_item_u
        ),
        cat_dim AS (
            SELECT CAST(sum(n_c * n_c) AS BIGINT) AS sum_nc_sq
            FROM (SELECT CAST(sum(n_ic) AS BIGINT) AS n_c
                  FROM cell GROUP BY category)
        ),
        base AS (
            SELECT d.n_items_used, x.n_items_single, x.n_items_over_cap,
                   d.n_pairable, d.do_num,
                   d.n_pairable * d.n_pairable - c.sum_nc_sq AS de_num,
                   CAST(27720 AS BIGINT) AS scale_l
            FROM do_dim d CROSS JOIN cat_dim c CROSS JOIN dropped x
        )
        SELECT n_items_used, n_items_single, n_items_over_cap, n_pairable,
               do_num, CAST(de_num AS BIGINT) AS de_num, scale_l,
               CAST(do_num AS DOUBLE)
                   / CAST(27720 * n_pairable AS DOUBLE) AS d_o,
               CAST(de_num AS DOUBLE)
                   / CAST(n_pairable * (n_pairable - 1) AS DOUBLE) AS d_e,
               CASE WHEN de_num > 0
                    THEN 1.0 - (CAST(do_num AS DOUBLE)
                                / CAST(27720 * n_pairable AS DOUBLE))
                               / (CAST(de_num AS DOUBLE)
                                  / CAST(n_pairable * (n_pairable - 1)
                                         AS DOUBLE))
               END AS alpha
        FROM base
    """
    return {
        "arena_bt_ratings": bt,
        "arena_win_matrix": wm,
        "arena_position_bias": pb,
        "fleiss_kappa": fleiss,
        "krippendorff_alpha": alpha,
        "bte_window": bte_window,
        "bte_extract": bte_extract,
    }


def _lsh_s_curve_oracle(bands: int = 16, rows_per_band: int = 4,
                        grid_milli: int = 25) -> str:
    """Same unrolled fixed-point folds as ops/evals.lsh_s_curve —
    non-negative milli integers, so DuckDB // == Spark div."""
    p_and = "s_milli"
    for _ in range(rows_per_band - 1):
        p_and = f"(({p_and}) * s_milli) // 1000"
    acc = "(1000 - p_and_milli)"
    for _ in range(bands - 1):
        acc = f"(({acc}) * (1000 - p_and_milli)) // 1000"
    return f"""
        WITH grid AS (
            SELECT CAST(id * {grid_milli} AS BIGINT) AS s_milli
            FROM range(0, {1000 // grid_milli + 1}) t(id)
        ),
        a AS (
            SELECT s_milli, CAST({p_and} AS BIGINT) AS p_and_milli
            FROM grid
        )
        SELECT s_milli, p_and_milli,
               CAST(1000 - ({acc}) AS BIGINT) AS p_candidate_milli,
               CAST(1000 - ({acc}) AS BIGINT) >= 500 AS is_above_half
        FROM a
    """


def _feed_field_sql(body: str, tag: str) -> str:
    """DuckDB twin of ops/feeds._text_field: element text, one optional
    CDATA unwrap, empty -> NULL. Same RE2 patterns as the Spark side."""
    raw = (
        f"regexp_extract({body}, '(?s)<{tag}[^>]*>(.*?)</{tag}>', 1)"
    )
    unwrapped = (
        f"regexp_replace({raw}, "
        r"'(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$', '\1')"
    )
    return f"nullif(trim({unwrapped}), '')"


def _feed_ingest_oracle() -> str:
    """Re-synthesize the deterministic RSS/Atom corpus of
    queries/discovery._synth_feed_files in SQL and re-parse it with the
    same block/field regexes as ops/feeds.parse_feeds — one spec, two
    engines, exactly like the sitemap_ingest oracle."""
    title = _feed_field_sql("body", "title")
    rss_link = _feed_field_sql("body", "link")
    guid = _feed_field_sql("body", "guid")
    pubdate = _feed_field_sql("body", "pubDate")
    descr = _feed_field_sql("body", "description")
    atom_id = _feed_field_sql("body", "id")
    updated = _feed_field_sql("body", "updated")
    summary = _feed_field_sql("body", "summary")
    atom_link = (
        "nullif(trim(regexp_extract(body, "
        r"'(?s)<link\b[^>]*href=\"([^\"]*)\"', 1)), '')"
    )
    return f"""
        WITH docs AS (
            SELECT doc_id AS d, source, lang,
                   regexp_replace(substr(text, 1, 40), '[<>&]', ' ', 'g')
                       AS btxt
            FROM documents
        ),
        rss_e AS (
            SELECT d, source,
                   chr(10) || '  <item>' || chr(10) || '    <title>'
                   || CASE WHEN d % 7 = 0
                      THEN '<![CDATA[Post ' || d || ']]>'
                      ELSE 'Post ' || d END
                   || '</title>' || chr(10) || '    <link>https://'
                   || source || '.test/p' || d || '</link>'
                   || CASE WHEN d % 5 <> 0
                      THEN chr(10) || '    <guid>urn:g:' || d || '</guid>'
                      ELSE '' END
                   || CASE WHEN d % 9 <> 0
                      THEN chr(10) || '    <pubDate>2026-0' || (1 + d % 8)
                           || '-15</pubDate>'
                      ELSE '' END
                   || CASE WHEN d % 11 <> 0
                      THEN chr(10) || '    <description>' || btxt
                           || '</description>'
                      ELSE '' END
                   || chr(10) || '  </item>' AS e
            FROM docs WHERE d % 2 = 0
        ),
        atom_e AS (
            SELECT d, lang,
                   chr(10) || '  <entry>' || chr(10) || '    <title>Doc '
                   || d || '</title>'
                   || chr(10) || '    <id>urn:doc:' || d || '</id>'
                   || chr(10) || '    '
                   || CASE WHEN d % 3 = 0
                      THEN '<link href="https://a.test/' || lang || '/p'
                           || d || '" rel="alternate"/>'
                      ELSE '<link rel="alternate" href="https://a.test/'
                           || lang || '/p' || d || '"/>' END
                   || chr(10) || '    <updated>2026-0' || (1 + d % 8)
                   || '-15T00:00:00Z</updated>'
                   || CASE WHEN d % 13 <> 0
                      THEN chr(10) || '    <summary>' || btxt
                           || '</summary>'
                      ELSE '' END
                   || chr(10) || '  </entry>' AS e
            FROM docs WHERE d % 2 = 1
        ),
        files AS (
            SELECT 'https://' || source || '.test/feed.rss' AS feed_url,
                   '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
                   || '<rss version="2.0">' || chr(10) || '<channel>'
                   || chr(10) || '  <title>feed</title>' || chr(10)
                   || '  <link>https://x.test/</link>'
                   || string_agg(e, '' ORDER BY d)
                   || chr(10) || '</channel>' || chr(10) || '</rss>' AS xml
            FROM rss_e GROUP BY source
            UNION ALL
            SELECT 'https://a.test/' || lang || '/feed.atom',
                   '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
                   || '<feed xmlns="http://www.w3.org/2005/Atom">'
                   || chr(10) || '  <title>feed</title>' || chr(10)
                   || '  <link rel="self" href="https://a.test/feed"/>'
                   || string_agg(e, '' ORDER BY d)
                   || chr(10) || '</feed>'
            FROM atom_e GROUP BY lang
        ),
        parsed AS (
            SELECT feed_url, 'rss' AS fmt,
                   unnest(regexp_extract_all(
                       xml, '(?s)<item\\b[^>]*>(.*?)</item>', 1)) AS body
            FROM files
            UNION ALL
            SELECT feed_url, 'atom',
                   unnest(regexp_extract_all(
                       xml, '(?s)<entry\\b[^>]*>(.*?)</entry>', 1))
            FROM files
        )
        SELECT feed_url, fmt,
               CASE WHEN fmt = 'rss' THEN coalesce({guid}, {rss_link})
                    ELSE {atom_id} END AS entry_id,
               CASE WHEN fmt = 'rss' THEN {rss_link}
                    ELSE {atom_link} END AS link,
               {title} AS title,
               CASE WHEN fmt = 'rss' THEN {pubdate}
                    ELSE {updated} END AS published,
               CASE WHEN fmt = 'rss' THEN {descr}
                    ELSE {summary} END AS summary
        FROM parsed
    """


def _feed_oracles() -> dict[str, str]:
    ingest = _feed_ingest_oracle()
    frontier = f"""
        WITH ingest AS ({ingest}),
        seen AS (
            SELECT CASE WHEN doc_id % 2 = 0 THEN
                       CASE WHEN doc_id % 5 = 0
                            THEN 'https://' || source || '.test/p' || doc_id
                            ELSE 'urn:g:' || doc_id END
                   ELSE 'urn:doc:' || doc_id END AS entry_id
            FROM documents WHERE doc_id % 3 = 0
        )
        SELECT i.* FROM ingest i
        WHERE i.entry_id IS NOT NULL
          AND NOT EXISTS (
              SELECT 1 FROM seen s WHERE s.entry_id = i.entry_id)
    """
    return {"feed_ingest": ingest, "feed_frontier": frontier}


def _texttiling_oracle(w: int = 8, k: int = 2, min_sep: int = 3) -> str:
    """DuckDB twin of ops/tiling.texttiling_gaps: same tokenizer, same
    squared-cosine micro-units, same run-group climb-to-peak depth, same
    integer LC-cutoff inequality, same packed-long minimum-separation
    election. Every integer sum is BIGINT-cast (the HUGEINT driver-hash
    trap)."""
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(lower(text),
                             '[^a-z0-9]+'), x -> x <> '') AS l
                  FROM documents)
        ),
        counts AS (
            SELECT doc_id, pos // {w} AS bid, tok,
                   CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2, 3
        ),
        nb AS (
            SELECT doc_id, max(bid) + 1 AS n_blocks FROM counts GROUP BY 1
        ),
        sides AS (
            SELECT doc_id, tok, c, bid + o AS gap, 'L' AS side
            FROM counts, (SELECT unnest(range(1, {k + 1})) AS o) od
            UNION ALL
            SELECT doc_id, tok, c, bid - o AS gap, 'R' AS side
            FROM counts, (SELECT unnest(range(0, {k})) AS o) od
        ),
        sv AS (
            SELECT s.doc_id, s.gap, s.side, s.tok,
                   CAST(sum(s.c) AS BIGINT) AS c
            FROM sides s JOIN nb ON s.doc_id = nb.doc_id
            WHERE s.gap >= 1 AND s.gap <= nb.n_blocks - 1
            GROUP BY 1, 2, 3, 4
        ),
        norms AS (
            SELECT doc_id, gap,
                   CAST(sum(CASE WHEN side = 'L' THEN c * c ELSE 0 END)
                        AS BIGINT) AS nl,
                   CAST(sum(CASE WHEN side = 'R' THEN c * c ELSE 0 END)
                        AS BIGINT) AS nr
            FROM sv GROUP BY 1, 2
        ),
        dots AS (
            SELECT l.doc_id, l.gap, CAST(sum(l.c * r.c) AS BIGINT) AS dot
            FROM sv l JOIN sv r
              ON l.doc_id = r.doc_id AND l.gap = r.gap AND l.tok = r.tok
            WHERE l.side = 'L' AND r.side = 'R'
            GROUP BY 1, 2
        ),
        sims AS (
            SELECT n.doc_id, n.gap,
                   CAST(CASE WHEN n.nl > 0 AND n.nr > 0
                        THEN (coalesce(d.dot, 0) * coalesce(d.dot, 0)
                              * 1000000) // (n.nl * n.nr)
                        ELSE 0 END AS BIGINT) AS s
            FROM norms n LEFT JOIN dots d
              ON n.doc_id = d.doc_id AND n.gap = d.gap
        ),
        l1 AS (
            SELECT doc_id, gap, s,
                   CASE WHEN s > lag(s) OVER wf THEN 1 ELSE 0 END AS linc,
                   CASE WHEN s > lag(s) OVER wb THEN 1 ELSE 0 END AS rinc
            FROM sims
            WINDOW wf AS (PARTITION BY doc_id ORDER BY gap),
                   wb AS (PARTITION BY doc_id ORDER BY gap DESC)
        ),
        l2 AS (
            SELECT doc_id, gap, s,
                   CAST(sum(linc) OVER (PARTITION BY doc_id ORDER BY gap)
                        AS BIGINT) AS lgrp,
                   CAST(sum(rinc) OVER (PARTITION BY doc_id
                                        ORDER BY gap DESC)
                        AS BIGINT) AS rgrp
            FROM l1
        ),
        dep AS (
            SELECT doc_id, gap, s AS sim2_micro,
                   max(s) OVER (PARTITION BY doc_id, lgrp ORDER BY gap) - s
                   + max(s) OVER (PARTITION BY doc_id, rgrp
                                  ORDER BY gap DESC) - s AS depth_micro
            FROM l2
        ),
        st AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(depth_micro // 1000) AS BIGINT) AS sm,
                   CAST(sum((depth_micro // 1000) * (depth_micro // 1000))
                        AS BIGINT) AS qm
            FROM dep GROUP BY 1
        ),
        flagged AS (
            SELECT dep.doc_id, gap, sim2_micro,
                   CAST(depth_micro AS BIGINT) AS depth_micro,
                   (st.n * (depth_micro // 1000) > st.sm
                    OR st.n * st.qm - st.sm * st.sm
                       > 4 * (st.sm - st.n * (depth_micro // 1000))
                         * (st.sm - st.n * (depth_micro // 1000)))
                       AS is_candidate
            FROM dep JOIN st ON dep.doc_id = st.doc_id
        ),
        packed AS (
            SELECT *,
                   CASE WHEN is_candidate
                        THEN depth_micro * 2000000000
                             + (2000000000 - gap) END AS pk
            FROM flagged
        )
        SELECT doc_id, gap, sim2_micro, depth_micro, is_candidate,
               (is_candidate AND pk = max(pk) OVER (
                    PARTITION BY doc_id ORDER BY gap
                    RANGE BETWEEN {min_sep - 1} PRECEDING
                          AND {min_sep - 1} FOLLOWING)) AS is_boundary
        FROM packed
    """


def _tiling_oracles() -> dict[str, str]:
    gaps = _texttiling_oracle()
    segments = f"""
        WITH g AS ({gaps}),
        s1 AS (
            SELECT doc_id, gap, depth_micro,
                   CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0
                            END) OVER (PARTITION BY doc_id
                            ORDER BY gap ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS seg_id
            FROM g
        )
        SELECT doc_id, seg_id, min(gap) AS start_gap, max(gap) AS end_gap,
               CAST(count(*) AS BIGINT) AS n_gaps,
               max(depth_micro) AS max_depth_micro
        FROM s1 GROUP BY 1, 2
    """
    return {"texttiling_gaps": gaps, "texttiling_segments": segments}


def _keyword_ocr_oracles() -> dict[str, str]:
    """DuckDB twins of ops/keywords.rake_keywords and
    ops/ocr.ocr_garbage_profile — the oracle embeds the SAME stopword
    lexicon, run-regex alternation, and planted-damage literal the
    Spark ops use (one definition, two engines). Integer milli-unit
    scores; every integer sum BIGINT-cast (the HUGEINT driver-hash
    trap)."""
    from reader_spark.ops.keywords import RAKE_STOPWORDS
    from reader_spark.ops.ocr import PLANT_SUFFIX, RUN_PATTERN, VOWELS

    stops = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    rake = f"""
        WITH toks AS (
            SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(lower(text),
                             '[^a-z0-9]+'), x -> x <> '') AS l
                  FROM documents)
        ),
        b AS (
            SELECT doc_id, pos, tok, tok IN ({stops}) AS is_stop,
                   CAST(sum(CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS bucket
            FROM toks
        ),
        member AS (
            SELECT doc_id, pos, tok, bucket,
                   CAST(count(*) OVER (PARTITION BY doc_id, bucket)
                        AS BIGINT) AS plen
            FROM b WHERE NOT is_stop
        ),
        words AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(plen) AS BIGINT) AS deg
            FROM member GROUP BY 1, 2
        ),
        scored AS (
            SELECT doc_id, tok,
                   CAST(deg * 1000 // freq AS BIGINT) AS word_milli
            FROM words
        ),
        inst AS (
            SELECT m.doc_id, m.bucket,
                   string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
                   CAST(sum(s.word_milli) AS BIGINT) AS score_milli,
                   CAST(count(*) AS BIGINT) AS n_words
            FROM member m
            JOIN scored s ON m.doc_id = s.doc_id AND m.tok = s.tok
            GROUP BY 1, 2
        ),
        ph AS (
            SELECT doc_id, phrase, max(score_milli) AS score_milli,
                   max(n_words) AS n_words
            FROM inst GROUP BY 1, 2
        )
        SELECT doc_id, rank, phrase, score_milli, n_words
        FROM (SELECT doc_id, phrase, score_milli, n_words,
                     CAST(row_number() OVER (
                         PARTITION BY doc_id
                         ORDER BY score_milli DESC, phrase ASC)
                       AS INTEGER) AS rank
              FROM ph)
        WHERE rank <= 10
    """
    ocr = f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 0
                        THEN text || '{PLANT_SUFFIX}' ELSE text END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id, unnest(l) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS l
                  FROM planted)
        ),
        feat AS (
            SELECT doc_id, tok, len(tok) AS n,
                   len(tok) - len(regexp_replace(tok, '[a-zA-Z0-9]',
                                                 '', 'g')) AS alnum,
                   regexp_matches(tok, '^[a-zA-Z]+$') AS is_alpha,
                   len(tok) - len(regexp_replace(tok, '[{VOWELS}]',
                                                 '', 'g')) AS vowels,
                   regexp_replace(substr(tok, 2,
                                         greatest(len(tok) - 2, 0)),
                                  '[a-zA-Z0-9]', '', 'g') AS ip,
                   regexp_matches(tok, '{RUN_PATTERN}') AS rule_r,
                   regexp_matches(tok, '[a-z][A-Z]') AS rule_c
            FROM toks
        ),
        flags AS (
            SELECT doc_id,
                   n > 40 AS rule_l,
                   n >= 2 AND alnum * 2 < n AS rule_a,
                   rule_r,
                   is_alpha AND n >= 3
                       AND (vowels = 0 OR vowels = n) AS rule_v,
                   len(ip) >= 2
                       AND ip <> repeat(substr(ip, 1, 1), len(ip))
                       AS rule_p,
                   rule_c
            FROM feat
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN rule_l THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rule_l,
               CAST(sum(CASE WHEN rule_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rule_a,
               CAST(sum(CASE WHEN rule_r THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rule_r,
               CAST(sum(CASE WHEN rule_v THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rule_v,
               CAST(sum(CASE WHEN rule_p THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rule_p,
               CAST(sum(CASE WHEN rule_c THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rule_c,
               CAST(sum(CASE WHEN rule_l OR rule_a OR rule_r OR rule_v
                             OR rule_p OR rule_c THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_garbage,
               CAST(sum(CASE WHEN rule_l OR rule_a OR rule_r OR rule_v
                             OR rule_p OR rule_c THEN 1 ELSE 0 END)
                    * 1000 // count(*) AS BIGINT) AS garbage_milli
        FROM flags GROUP BY 1
    """
    return {"rake_keywords": rake, "ocr_garbage_profile": ocr}


def _trustrank_oracles(
    iterations: int = 5, damping: float = 0.85
) -> dict[str, str]:
    """Unrolled TrustRank + spam-mass twins (ops/graph.trustrank,
    spam_mass — Gyongyi et al. 2004/2006), mirroring the Spark ops'
    9 dp in-iteration rounding term for term over the SAME deterministic
    domain link graph the certified pagerank_domains row uses. Seeds =
    the 4 lexicographically-smallest domains; dangling mass
    redistributes along the seed teleport vector."""
    prefix = """
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
        seeds AS (
            SELECT DISTINCT source AS node FROM documents
            ORDER BY node LIMIT 4
        ),
        sc AS (SELECT count(*) AS s FROM seeds JOIN nodes USING (node)),
        nd AS (
            SELECT n.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN round(1.0 / (SELECT s FROM sc), 9)
                        ELSE 0.0 END AS d
            FROM nodes n LEFT JOIN seeds s ON n.node = s.node
        ),
        t0 AS (SELECT node, d, d AS tr FROM nd)
        """
    t_iters = []
    for k in range(1, iterations + 1):
        t_iters.append(
            f""",
        t{k} AS (
            SELECT n.node, n.d,
                   round((1 - {damping}) * n.d
                         + {damping} * (
                               COALESCE(c.in_sum, 0)
                               + (SELECT COALESCE(sum(tr), 0) FROM t{k - 1} p
                                  LEFT JOIN outw o ON p.node = o.src
                                  WHERE o.src IS NULL) * n.d
                           ), 9) AS tr
            FROM nd n LEFT JOIN (
                SELECT f.dst AS node, sum(round(p.tr * f.frac, 9)) AS in_sum
                FROM frac f JOIN t{k - 1} p ON f.src = p.node
                GROUP BY f.dst
            ) c ON n.node = c.node
        )"""
        )
    p_iters = [
        """,
        p0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 9) AS pr FROM nodes)
        """
    ]
    for k in range(1, iterations + 1):
        p_iters.append(
            f""",
        p{k} AS (
            SELECT n.node,
                   round((1 - {damping}) / (SELECT n FROM nn)
                         + {damping} * (
                               COALESCE(c.in_sum, 0)
                               + (SELECT COALESCE(sum(pr), 0) FROM p{k - 1} p
                                  LEFT JOIN outw o ON p.node = o.src
                                  WHERE o.src IS NULL) / (SELECT n FROM nn)
                           ), 9) AS pr
            FROM nodes n LEFT JOIN (
                SELECT f.dst AS node, sum(round(p.pr * f.frac, 9)) AS in_sum
                FROM frac f JOIN p{k - 1} p ON f.src = p.node
                GROUP BY f.dst
            ) c ON n.node = c.node
        )"""
        )
    trust = (
        prefix
        + "".join(t_iters)
        + f"""
        SELECT node AS domain, round(tr, 6) AS tr FROM t{iterations}
        """
    )
    mass = (
        prefix
        + "".join(t_iters)
        + "".join(p_iters)
        + f"""
        SELECT p.node AS domain,
               round(p.pr, 6) AS pr,
               round(t.tr, 6) AS tr,
               round((round(p.pr, 6) - round(t.tr, 6))
                     / round(p.pr, 6), 6) AS rel_mass,
               round((round(p.pr, 6) - round(t.tr, 6))
                     / round(p.pr, 6), 6) > 0.5 AS spam_candidate
        FROM p{iterations} p JOIN t{iterations} t ON p.node = t.node
        """
    )
    return {"trustrank_domains": trust, "spam_mass_domains": mass}


def _confusable_oracles() -> dict[str, str]:
    """DuckDB twins of ops/confusables (UTS #39 skeleton): the oracle
    embeds the SAME confusable table, script classes, and planted spoof
    literal the Spark ops use. Counts BIGINT-cast."""
    from reader_spark.ops.confusables import (
        CONFUSABLE_CLASS,
        DST_CHARS,
        FOREIGN_CLASS,
        HOMOGLYPH_PLANT,
        SRC_CHARS,
    )

    profile = f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN text || '{HOMOGLYPH_PLANT}' ELSE text
                   END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id, text, unnest(l) AS tok
            FROM (SELECT doc_id, text,
                         list_filter(string_split_regex(lower(text),
                                     '\\s+'), x -> x <> '') AS l
                  FROM planted)
        ),
        f AS (
            SELECT doc_id, text, tok,
                   regexp_matches(tok, '[a-z]')
                       AND regexp_matches(tok, '{FOREIGN_CLASS}') AS mixed,
                   regexp_matches(tok, '{CONFUSABLE_CLASS}') AS has_conf
            FROM toks
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_mixed_script,
               CAST(sum(CASE WHEN mixed AND has_conf THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_spoof_suspects,
               CAST(max(len(lower(text))
                        - len(regexp_replace(lower(text),
                              '{CONFUSABLE_CLASS}', '', 'g')))
                    AS BIGINT) AS n_confusable_chars,
               max(md5(translate(lower(text), '{SRC_CHARS}',
                                 '{DST_CHARS}'))) AS skeleton_md5
        FROM f GROUP BY 1
    """
    pairs = f"""
        WITH legit AS (SELECT DISTINCT source AS name FROM documents),
        names AS (
            SELECT name FROM legit
            UNION
            SELECT translate(name, 's', 'ѕ') FROM legit
        ),
        sk AS (
            SELECT DISTINCT name,
                   translate(lower(name), '{SRC_CHARS}', '{DST_CHARS}')
                       AS skeleton
            FROM names
        )
        SELECT a.skeleton, a.name AS name_a, b.name AS name_b
        FROM sk a JOIN sk b
          ON a.skeleton = b.skeleton AND a.name < b.name
    """
    return {"homoglyph_profile": profile, "domain_spoof_pairs": pairs}


def _refresh_oracle(budget: int = 600, max_slots: int = 8) -> str:
    """DuckDB twin of ops/refresh.refresh_allocation over the
    change_rate delta history: same lam_milli derivation, same
    gain quantization (lam*1e15 div slot denominators), same
    (gain DESC, doc_id ASC, k ASC) greedy selection and exact-integer
    freshness. All integers BIGINT-cast."""
    return f"""
        WITH hist AS (
            SELECT doc_id, unnest(range(8)) AS r
            FROM (SELECT doc_id FROM documents)
        ),
        st AS (
            SELECT doc_id, r,
                   CASE WHEN doc_id % 3 = 0 AND r = doc_id % 8
                            THEN 'added'
                        WHEN (doc_id * (r + 1) + r * r) % 5 = 0
                            THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM hist
        ),
        agg AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0
                            END) AS BIGINT) AS x
            FROM st WHERE status IN ('changed', 'unchanged')
            GROUP BY 1
        ),
        pages AS (
            SELECT doc_id, CAST(x * 1000 // n AS BIGINT) AS lam_milli
            FROM agg WHERE CAST(x * 1000 // n AS BIGINT) > 0
        ),
        slots AS (
            SELECT doc_id, lam_milli,
                   unnest(range(1, {max_slots + 1})) AS k
            FROM pages
        ),
        gains AS (
            SELECT doc_id, lam_milli, k,
                   CAST(lam_milli * 1000000000000000
                        // ((1000 * k + lam_milli)
                            * (1000 * (k - 1) + lam_milli))
                        AS BIGINT) AS gain_q
            FROM slots
        ),
        sel AS (
            SELECT doc_id FROM gains
            ORDER BY gain_q DESC, doc_id ASC, k ASC LIMIT {budget}
        ),
        alloc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS f_slots
            FROM sel GROUP BY 1
        )
        SELECT p.doc_id, p.lam_milli,
               CAST(COALESCE(a.f_slots, 0) AS BIGINT) AS f_slots,
               CAST(CASE WHEN COALESCE(a.f_slots, 0) = 0 THEN 0
                    ELSE 1000000000 * a.f_slots
                         // (1000 * a.f_slots + p.lam_milli) END
                    AS BIGINT) AS freshness_micro
        FROM pages p LEFT JOIN alloc a USING (doc_id)
    """


def _quote_oracles() -> dict[str, str]:
    """DuckDB twins of ops/quotes (quote_profile / quote_spans) over
    the deterministically planted corpus — the oracle embeds the SAME
    regex literals (RE2-compatible subset) and plant construction."""
    from reader_spark.ops.quotes import ATTRIBUTED_RE, QUOTE_RE

    planted = """
        WITH p1 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN text || ' He said "'
                             || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             || ' quoted span" done.'
                        ELSE text END AS text
            FROM documents
        ),
        planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 9 = 0
                        THEN text || ' "plain extra"' ELSE text
                   END AS text
            FROM p1
        )
    """
    profile = f"""{planted},
        q AS (
            SELECT doc_id, text,
                   regexp_extract_all(text, '{QUOTE_RE}', 1) AS l
            FROM planted
        )
        SELECT doc_id,
               CAST(len(l) AS BIGINT) AS n_quotes,
               CAST(len(regexp_extract_all(text, '{ATTRIBUTED_RE}', 0))
                    AS BIGINT) AS n_attributed,
               CAST(COALESCE(list_sum(list_transform(l, x -> len(x))), 0)
                    AS BIGINT) AS quote_chars,
               CAST(CAST(COALESCE(list_sum(list_transform(l,
                         x -> len(x))), 0) AS BIGINT) * 1000
                    // greatest(len(text), 1) AS BIGINT) AS quote_milli
        FROM q
    """
    spans = f"""{planted},
        q AS (
            SELECT doc_id, unnest(l) AS quote,
                   unnest(range(len(l))) AS pos
            FROM (SELECT doc_id,
                         regexp_extract_all(text, '{QUOTE_RE}', 1) AS l
                  FROM planted)
        )
        SELECT doc_id, CAST(pos AS INTEGER) AS quote_no, quote,
               CAST(len(list_filter(string_split_regex(quote, '\\s+'),
                                    x -> x <> '')) AS INTEGER) AS n_words
        FROM q
    """
    return {"quote_profile": profile, "quote_spans": spans}


def _trap_oracle() -> str:
    """DuckDB twin of ops/traps.trap_signals over the synthesized
    trap/clean crawl ledger (same URL construction, same digest rule,
    same milli signals and weighted score)."""
    deep = "d/" * 9
    return f"""
        WITH e AS (
            SELECT doc_id, source, unnest(range(3)) AS i FROM documents
        ),
        b AS (
            SELECT doc_id, source, i,
                   CAST(substr(source, 4) AS BIGINT) % 2 = 0 AS trap,
                   lpad(CAST((doc_id + i) % 12 + 1 AS VARCHAR), 2, '0')
                       AS mm,
                   substr(md5(CAST(doc_id AS VARCHAR) || '-'
                              || CAST(i AS VARCHAR)), 1, 6) AS sid
            FROM e
        ),
        crawl AS (
            SELECT source AS host,
                   CASE WHEN trap THEN
                            'https://' || source || '.test/cal/2020-'
                            || mm
                            || CASE WHEN doc_id % 11 = 0
                                    THEN '{deep}' ELSE '' END
                            || '/?sid=' || sid
                        ELSE 'https://' || source || '.test/p/'
                             || CAST(doc_id AS VARCHAR) || '/'
                             || CAST(i AS VARCHAR) END AS url,
                   CASE WHEN trap THEN md5(source)
                        ELSE md5(CAST(doc_id AS VARCHAR) || ':'
                                 || CAST(i AS VARCHAR)) END AS digest
            FROM b
        ),
        r AS (
            SELECT host, digest,
                   CASE WHEN position('?' IN url) > 0 THEN 1 ELSE 0
                        END AS has_query,
                   CASE WHEN regexp_matches(url,
                        '/[0-9]{{4}}[-/][0-9]{{2}}') THEN 1 ELSE 0
                        END AS has_date,
                   CAST(len(url) - len(replace(url, '/', '')) - 2
                        AS BIGINT) AS depth
            FROM crawl
        ),
        pd AS (
            SELECT host, digest, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(has_query) AS BIGINT) AS q,
                   CAST(sum(has_date) AS BIGINT) AS d,
                   max(depth) AS dep
            FROM r GROUP BY 1, 2
        ),
        agg AS (
            SELECT host, CAST(sum(n) AS BIGINT) AS n_urls,
                   CAST(count(*) AS BIGINT) AS n_digests,
                   CAST(sum(q) AS BIGINT) AS n_query,
                   CAST(sum(d) AS BIGINT) AS n_date,
                   max(dep) AS depth_max
            FROM pd GROUP BY 1
        ),
        sig AS (
            SELECT host, n_urls, n_digests,
                   CAST((n_urls - n_digests) * 1000 // n_urls AS BIGINT)
                       AS dup_milli,
                   CAST(n_query * 1000 // n_urls AS BIGINT)
                       AS query_milli,
                   CAST(n_date * 1000 // n_urls AS BIGINT) AS date_milli,
                   depth_max
            FROM agg
        )
        SELECT host, n_urls, n_digests, dup_milli, query_milli,
               date_milli, depth_max,
               CAST((500 * dup_milli + 200 * query_milli
                     + 150 * date_milli) // 1000
                    + CASE WHEN depth_max >= 8 THEN 150 ELSE 0 END
                    AS BIGINT) AS trap_milli,
               ((500 * dup_milli + 200 * query_milli + 150 * date_milli)
                 // 1000
                + CASE WHEN depth_max >= 8 THEN 150 ELSE 0 END) >= 400
                   AS trap_suspect
        FROM sig
    """


def _url_template_oracle() -> str:
    """DuckDB twin of ops/urltemplates.url_templates over the DUST
    ledger (full-md5 session ids fold to {H}; digit runs to {N})."""
    from reader_spark.ops.urltemplates import HEX_RE, NUM_RE, UUID_RE

    return f"""
        WITH e AS (
            SELECT doc_id, source, unnest(range(3)) AS i FROM documents
        ),
        b AS (
            SELECT doc_id, source, i,
                   CAST(substr(source, 4) AS BIGINT) % 2 = 0 AS trap,
                   lpad(CAST((doc_id + i) % 12 + 1 AS VARCHAR), 2, '0')
                       AS mm,
                   md5(CAST(doc_id AS VARCHAR) || '-'
                       || CAST(i AS VARCHAR)) AS sid
            FROM e
        ),
        crawl AS (
            SELECT source AS host,
                   CASE WHEN trap THEN
                            'https://' || source || '.test/cal/2020-'
                            || mm || '/?sid=' || sid
                        ELSE 'https://' || source || '.test/p/'
                             || CAST(doc_id AS VARCHAR) || '/'
                             || CAST(i AS VARCHAR) END AS url,
                   CASE WHEN trap THEN md5(source)
                        ELSE md5(CAST(doc_id AS VARCHAR) || ':'
                                 || CAST(i AS VARCHAR)) END AS digest
            FROM b
        ),
        t AS (
            SELECT host, url, digest,
                   regexp_replace(regexp_replace(regexp_replace(
                       lower(url), '{UUID_RE}', '{{U}}', 'g'),
                       '{HEX_RE}', '{{H}}', 'g'),
                       '{NUM_RE}', '{{N}}', 'g') AS template
            FROM crawl
        ),
        pd AS (
            SELECT host, template, digest,
                   CAST(count(*) AS BIGINT) AS n, min(url) AS u
            FROM t GROUP BY 1, 2, 3
        )
        SELECT host, template, CAST(sum(n) AS BIGINT) AS n_urls,
               CAST(count(*) AS BIGINT) AS n_digests,
               CAST((sum(n) - count(*)) * 1000 // sum(n) AS BIGINT)
                   AS dup_milli,
               min(u) AS sample_url
        FROM pd GROUP BY 1, 2
    """


def _kneser_oracles(discount_milli: int = 750) -> dict[str, str]:
    """Twins of ops/kneser (interpolated Kneser-Ney bigram, Chen &
    Goodman 1999 eq. 4.27): the SAME tokenizer and bigram CTEs as the
    certified bigram_lm row, probabilities as the SAME two exact
    integers num/den, one double division + log2, round-9 nano-unit
    sums, integer 6 dp reduction."""
    from reader_spark.queries.lm import KN_DISCOUNT_MILLI

    d = int(KN_DISCOUNT_MILLI) if discount_milli == 750 else int(discount_milli)
    per_doc = f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS l
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
            FROM d
        ),
        b AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
        c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                FROM b GROUP BY 1, 2),
        lft AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1,
                       CAST(count(DISTINCT w2) AS BIGINT) AS t1
                FROM b GROUP BY 1),
        rgt AS (SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS n2
                FROM b GROUP BY 1),
        tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM c12),
        s AS (
            SELECT b.doc_id,
                   CAST(round(-log2(
                       CAST((1000 * c12.c12 - {d}) * tt.tt
                            + {d} * lft.t1 * rgt.n2 AS DOUBLE)
                       / CAST(1000 * lft.c1 * tt.tt AS DOUBLE)) * 1e9)
                       AS BIGINT) AS u
            FROM b JOIN c12 USING (w1, w2) JOIN lft USING (w1)
                   JOIN rgt USING (w2) CROSS JOIN tt
        ),
        p AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   sum(u) AS s
            FROM s GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CASE WHEN p.n_bigrams > 0
                    THEN ((p.s + (p.n_bigrams * 1000) // 2)
                          // (p.n_bigrams * 1000)) / 1000000.0
               END AS kn_nll_bits
        FROM d LEFT JOIN p USING (doc_id)
    """
    by_source = f"""
        WITH kn AS ({per_doc}),
        j AS (
            SELECT doc.source, kn.n_bigrams,
                   CAST(round(kn.kn_nll_bits * 1e6) AS BIGINT) AS u,
                   CASE WHEN kn.kn_nll_bits IS NOT NULL
                        THEN 1 ELSE 0 END AS ok
            FROM documents doc JOIN kn USING (doc_id)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ok) AS BIGINT) AS n_scored,
               CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
               CASE WHEN sum(ok) > 0
                    THEN ((sum(u) + sum(ok) // 2) // sum(ok)) / 1000000.0
               END AS mean_nll_bits
        FROM j GROUP BY source
    """
    return {"kneser_ney_bigram": per_doc, "kneser_ney_by_source": by_source}


def _lpa_oracles() -> dict[str, str]:
    """Unrolled twins of ops/graph.label_propagation (Raghavan et al.
    2007, synchronous deterministic variant) over the planted-partition
    doc graph the webgraph queries build: same symmetrize/self-vote/
    (count desc, label asc) election, one CTE block per round."""
    from reader_spark.queries.webgraph import (
        LPA_BRIDGE_EVERY,
        LPA_GROUPS,
        LPA_ITERATIONS,
    )

    parts = [
        f"""
        WITH e0 AS (
            SELECT 'd' || CAST(doc_id AS VARCHAR) AS src,
                   'd' || CAST(doc_id % {LPA_GROUPS} AS VARCHAR) AS dst
            FROM documents
            UNION ALL
            SELECT 'd' || CAST(doc_id AS VARCHAR),
                   'd' || CAST((doc_id + 1) % {LPA_GROUPS} AS VARCHAR)
            FROM documents WHERE doc_id % {LPA_BRIDGE_EVERY} = 0
        ),
        e AS (
            SELECT DISTINCT a, b FROM (
                SELECT src AS a, dst AS b FROM e0
                UNION ALL
                SELECT dst AS a, src AS b FROM e0
            ) WHERE a <> b
        ),
        l0 AS (SELECT DISTINCT a AS node, a AS label FROM e)"""
    ]
    for k in range(1, LPA_ITERATIONS + 1):
        parts.append(
            f""",
        v{k} AS (
            SELECT e.a AS node, l.label
            FROM e JOIN l{k - 1} l ON e.b = l.node
            UNION ALL
            SELECT node, label FROM l{k - 1}
        ),
        c{k} AS (
            SELECT node, label, count(*) AS c FROM v{k} GROUP BY 1, 2
        ),
        m{k} AS (SELECT node, max(c) AS mc FROM c{k} GROUP BY 1),
        l{k} AS (
            SELECT c.node, min(c.label) AS label
            FROM c{k} c JOIN m{k} m
                 ON c.node = m.node AND c.c = m.mc
            GROUP BY 1
        )"""
        )
    prefix = "".join(parts)
    final = LPA_ITERATIONS
    per_node = (
        prefix
        + f"\n        SELECT node, label AS community FROM l{final}"
    )
    sizes = (
        prefix
        + f"""
        SELECT label AS community,
               CAST(count(*) AS BIGINT) AS n_nodes,
               min(node) AS min_node
        FROM l{final} GROUP BY label"""
    )
    return {"lpa_communities": per_node, "lpa_community_sizes": sizes}


def _linkage_oracles() -> dict[str, str]:
    """Twins of ops/linkage (Fellegi-Sunter 1969 + Newcombe blocking)
    over the same drifted-twin construction: identical field
    derivations, the SAME integer milli-bit weights (imported from
    fs_weights — one log2 site, two engines), same thresholds."""
    from reader_spark.ops.linkage import (
        DEFAULT_LOWER_MILLI,
        DEFAULT_PARAMS,
        DEFAULT_UPPER_MILLI,
        fs_weights,
    )
    from reader_spark.queries.linkage import LEN_BUCKET

    w = fs_weights(DEFAULT_PARAMS)
    (wa1, wd1), (wa2, wd2), (wa3, wd3) = (
        w["name"],
        w["host"],
        w["len_bucket"],
    )
    pairs = f"""
        WITH r AS (
            SELECT CAST(doc_id AS BIGINT) AS did,
                   coalesce(list_filter(string_split_regex(lower(text),
                       '[^a-z]+'), x -> x <> '')[1], 'none') AS name,
                   source AS host,
                   CAST(n_chars // {LEN_BUCKET} AS BIGINT) AS len_bucket
            FROM documents
        ),
        fa AS (
            SELECT 'a' || CAST(did AS VARCHAR) AS rid, name, host,
                   len_bucket,
                   substr(name, 1, 1) || '-'
                       || CAST(len_bucket AS VARCHAR) AS block
            FROM r
        ),
        b0 AS (
            SELECT did,
                   CASE WHEN did % 4 = 1 THEN name || 'x'
                        WHEN did % 4 = 3 THEN 'zz' || name
                        ELSE name END AS name,
                   CASE WHEN did % 4 IN (2, 3) THEN 'm-' || host
                        ELSE host END AS host,
                   len_bucket
            FROM r
        ),
        fb AS (
            SELECT 'b' || CAST(did AS VARCHAR) AS rid, name, host,
                   len_bucket,
                   substr(name, 1, 1) || '-'
                       || CAST(len_bucket AS VARCHAR) AS block
            FROM b0
        ),
        p AS (
            SELECT fa.rid AS rid_a, fb.rid AS rid_b,
                   (fa.name IS NOT DISTINCT FROM fb.name) AS g1,
                   (fa.host IS NOT DISTINCT FROM fb.host) AS g2,
                   (fa.len_bucket IS NOT DISTINCT FROM fb.len_bucket)
                       AS g3
            FROM fa JOIN fb ON fa.block = fb.block
        ),
        s AS (
            SELECT rid_a, rid_b,
                   (CASE WHEN g1 THEN '1' ELSE '0' END)
                   || (CASE WHEN g2 THEN '1' ELSE '0' END)
                   || (CASE WHEN g3 THEN '1' ELSE '0' END) AS gamma,
                   CAST((CASE WHEN g1 THEN {wa1} ELSE {wd1} END)
                        + (CASE WHEN g2 THEN {wa2} ELSE {wd2} END)
                        + (CASE WHEN g3 THEN {wa3} ELSE {wd3} END)
                        AS BIGINT) AS score_milli
            FROM p
        )
        SELECT rid_a, rid_b, gamma, score_milli,
               CASE WHEN score_milli >= {DEFAULT_UPPER_MILLI} THEN 'link'
                    WHEN score_milli >= {DEFAULT_LOWER_MILLI}
                        THEN 'possible'
                    ELSE 'non_link' END AS decision
        FROM s
    """
    profile = f"""
        WITH pr AS ({pairs})
        SELECT gamma, decision,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(min(score_milli) AS BIGINT) AS score_milli,
               min(score_milli) = max(score_milli) AS uniform
        FROM pr GROUP BY gamma, decision
    """
    ev = f"""
        WITH pr AS ({pairs})
        SELECT decision,
               substr(rid_a, 2) = substr(rid_b, 2) AS is_true_match,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pr GROUP BY 1, 2
    """
    return {
        "fs_linkage_pairs": pairs,
        "fs_linkage_profile": profile,
        "fs_linkage_eval": ev,
    }


def _psl_oracles() -> dict[str, str]:
    """Twins of ops/psl.registrable_domain (publicsuffix.org
    algorithm) over the same host fixture: identical rule literals
    (imported from MINI_PSL — one table, two engines), same candidate
    explode, same exception-beats-all packed election, same default
    rule."""
    from reader_spark.ops.psl import MAX_LABELS, MINI_PSL

    rules = ", ".join(f"('{r}', {k})" for r, k in MINI_PSL)
    per_host = f"""
        WITH h AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE
                     WHEN doc_id % 6 = 0 THEN
                       CASE WHEN doc_id % 100 = 42 THEN 'co.uk'
                            ELSE 'www.ex' || CAST(doc_id % 40 AS VARCHAR)
                                 || '.co.uk' END
                     WHEN doc_id % 6 = 1 THEN
                       'blog.ex' || CAST(doc_id % 40 AS VARCHAR) || '.com'
                     WHEN doc_id % 6 = 2 THEN
                       'a.b.ex' || CAST(doc_id % 40 AS VARCHAR) || '.ck'
                     WHEN doc_id % 6 = 3 THEN
                       'user' || CAST(doc_id AS VARCHAR) || '.github.io'
                     WHEN doc_id % 6 = 4 THEN
                       CASE WHEN doc_id % 4 = 0 THEN 'www.ck'
                            ELSE 'sub.www.ck' END
                     ELSE 'ex' || CAST(doc_id % 40 AS VARCHAR)
                          || '.unknowntld'
                   END AS host
            FROM documents
        ),
        rules(rule, kind) AS (VALUES {rules}),
        hh AS (SELECT DISTINCT host FROM h
               WHERE host IS NOT NULL AND host <> ''),
        c AS (
            SELECT host, len(string_split(host, '.')) AS n,
                   unnest(range(1, least(len(string_split(host, '.')),
                                         {MAX_LABELS}) + 1)) AS i
            FROM hh
        ),
        cs AS (
            SELECT host, n, i,
                   array_to_string(
                       string_split(host, '.')[n - i + 1:n], '.') AS sfx,
                   CASE WHEN i > 1 THEN array_to_string(
                       string_split(host, '.')[n - i + 2:n], '.') END AS par
            FROM c
        ),
        m AS (
            SELECT cs.host,
                   max(CASE WHEN r.kind = 2 THEN 1000 + (cs.i - 1)
                            ELSE cs.i END) AS pk
            FROM cs JOIN rules r
                 ON (r.kind = 0 AND r.rule = cs.sfx)
                 OR (r.kind = 1 AND r.rule = cs.par)
                 OR (r.kind = 2 AND r.rule = cs.sfx)
            GROUP BY cs.host
        ),
        f AS (
            SELECT hh.host, coalesce(m.pk % 1000, 1) AS ps,
                   len(string_split(hh.host, '.')) AS n
            FROM hh LEFT JOIN m ON hh.host = m.host
        )
        SELECT h.doc_id, h.host,
               CASE WHEN f.ps IS NOT NULL THEN array_to_string(
                   string_split(h.host, '.')[f.n - f.ps + 1:f.n], '.')
               END AS public_suffix,
               CASE WHEN f.ps IS NOT NULL AND f.n >= f.ps + 1
                    THEN array_to_string(
                        string_split(h.host, '.')[f.n - f.ps:f.n], '.')
               END AS registrable_domain
        FROM h LEFT JOIN f ON h.host = f.host
    """
    rollup = f"""
        WITH pd AS ({per_host})
        SELECT registrable_domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        FROM pd GROUP BY registrable_domain
    """
    return {"registrable_domains": per_host, "pld_rollup": rollup}


def _submodular_oracle(k: int = 4, buckets: int = 8) -> str:
    """Unrolled twin of ops/submodular.facility_location_greedi
    (Mirzasoleiman et al. 2013): same md5 buckets, same round-4 cosine
    lifted to integer 1e-4 units, both GreeDi rounds replayed CTE by
    CTE with the (gain desc, id asc) election; the running objective is
    a windowed BIGINT sum (cast — the HUGEINT trap)."""
    sim = (
        "coalesce(CAST(round(round(list_cosine_similarity({a}, {b}), 4)"
        " * 10000) AS BIGINT), 0)"
    )
    parts = [
        f"""
        WITH pts AS (
            SELECT CAST(vec_id AS BIGINT) AS id, embedding::DOUBLE[] AS v,
                   CAST(('0x' || substr(md5('flb:'
                       || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % {buckets} AS bucket
            FROM embeddings
        ),
        cur0 AS (SELECT bucket, id, v, CAST(0 AS BIGINT) AS cur FROM pts),
        sel0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
                        CAST(NULL AS BIGINT) AS id WHERE 1 = 0)"""
    ]
    for r in range(1, k + 1):
        s_cp = sim.format(a="c.v", b="p.v")
        s_wp = sim.format(a="w.v", b="p.v")
        parts.append(
            f""",
        g{r} AS (
            SELECT c.bucket, c.id AS cid,
                   sum(greatest({s_cp} - p.cur, 0)) AS g
            FROM pts c JOIN cur{r - 1} p USING (bucket)
            WHERE NOT EXISTS (SELECT 1 FROM sel{r - 1} s
                              WHERE s.bucket = c.bucket AND s.id = c.id)
            GROUP BY 1, 2
        ),
        w{r} AS (
            SELECT bucket, cid AS id FROM g{r}
            QUALIFY row_number() OVER (PARTITION BY bucket
                                       ORDER BY g DESC, cid ASC) = 1
        ),
        wv{r} AS (
            SELECT w.bucket, p.v FROM w{r} w
            JOIN pts p ON w.bucket = p.bucket AND w.id = p.id
        ),
        cur{r} AS (
            SELECT p.bucket, p.id, p.v,
                   greatest(p.cur, coalesce({s_wp}, 0)) AS cur
            FROM cur{r - 1} p LEFT JOIN wv{r} w USING (bucket)
        ),
        sel{r} AS (
            SELECT bucket, id FROM sel{r - 1}
            UNION ALL SELECT bucket, id FROM w{r}
        )"""
        )
    s_cp2 = sim.format(a="c.v", b="p.v")
    s_wp2 = sim.format(a="w.v", b="p.v")
    parts.append(
        f""",
        cand AS (
            SELECT s.id, p.v FROM sel{k} s JOIN pts p USING (id)
        ),
        cur2_0 AS (SELECT id, v, CAST(0 AS BIGINT) AS cur FROM pts),
        out0 AS (SELECT CAST(NULL AS INTEGER) AS rank,
                        CAST(NULL AS BIGINT) AS id,
                        CAST(NULL AS BIGINT) AS g WHERE 1 = 0)"""
    )
    for r in range(1, k + 1):
        parts.append(
            f""",
        g2_{r} AS (
            SELECT c.id AS cid, sum(greatest({s_cp2} - p.cur, 0)) AS g
            FROM cand c, cur2_{r - 1} p
            WHERE c.id NOT IN (SELECT id FROM out{r - 1})
            GROUP BY 1
        ),
        w2_{r} AS (
            SELECT cid AS id, CAST(g AS BIGINT) AS g FROM g2_{r}
            QUALIFY row_number() OVER (ORDER BY g DESC, cid ASC) = 1
        ),
        wv2_{r} AS (SELECT p.v FROM w2_{r} w JOIN pts p USING (id)),
        cur2_{r} AS (
            SELECT p.id, p.v,
                   greatest(p.cur, coalesce({s_wp2}, 0)) AS cur
            FROM cur2_{r - 1} p LEFT JOIN wv2_{r} w ON 1 = 1
        ),
        out{r} AS (
            SELECT rank, id, g FROM out{r - 1}
            UNION ALL
            SELECT CAST({r} AS INTEGER) AS rank, id, g FROM w2_{r}
        )"""
    )
    parts.append(
        f"""
        SELECT rank, id AS vec_id, g AS gain_dm,
               CAST(sum(g) OVER (ORDER BY rank) AS BIGINT) / 10000.0
                   AS objective
        FROM out{k}"""
    )
    return "".join(parts)


def _coverage_oracles() -> dict[str, str]:
    """Twins of ops/estimate (Chao 1984 bias-corrected; Chapman 1951)
    over the same md5-planted capture fixtures — all-integer to the
    final centi-unit division."""
    chao = """
        WITH caps AS (
            SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                   unnest(range(1,
                       1
                       + CASE WHEN CAST(('0x' || substr(md5('cap:'
                             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                             % 3 = 0 THEN 1 ELSE 0 END
                       + CASE WHEN CAST(('0x' || substr(md5('cap:'
                             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                             % 7 = 0 THEN 2 ELSE 0 END
                       + 1)) AS i
            FROM documents
        ),
        pk AS (SELECT url, CAST(count(*) AS BIGINT) AS c
               FROM caps GROUP BY url),
        prof AS (
            SELECT CAST(sum(c) AS BIGINT) AS n_captures,
                   CAST(count(*) AS BIGINT) AS n_observed,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS f1,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS f2
            FROM pk
        )
        SELECT n_captures, n_observed, f1, f2,
               (n_observed * 100
                + (f1 * (f1 - 1) * 100) // (2 * (f2 + 1))) / 100.0
                   AS est_richness,
               CAST((f1 * 1000) // n_captures AS BIGINT)
                   AS gt_unseen_milli
        FROM prof
    """
    chapman = """
        WITH u AS (
            SELECT CAST(doc_id AS BIGINT) AS did,
                   'u' || CAST(doc_id AS VARCHAR) AS url
            FROM documents
        ),
        sa AS (
            SELECT DISTINCT url FROM u
            WHERE CAST(('0x' || substr(md5('capA:'
                || CAST(did AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 6
        ),
        sb AS (
            SELECT DISTINCT url FROM u
            WHERE CAST(('0x' || substr(md5('capB:'
                || CAST(did AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 6
        ),
        c AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM sa) AS n_a,
                   (SELECT CAST(count(*) AS BIGINT) FROM sb) AS n_b,
                   (SELECT CAST(count(*) AS BIGINT)
                    FROM sa JOIN sb USING (url)) AS n_both
        )
        SELECT n_a, n_b, n_both,
               (((n_a + 1) * (n_b + 1) * 100) // (n_both + 1) - 100)
                   / 100.0 AS est_total
        FROM c
    """
    return {
        "crawl_coverage_chao1": chao,
        "crawl_coverage_chapman": chapman,
    }


def _conformal_oracle(base: dict) -> str:
    """Twin of ops/conformal.conformal_quality_threshold composing the
    certified quality_logit + gopher_rules oracle bodies (the
    calibration_bins pattern): same md5-parity split, same
    (score asc, doc_id asc) order statistic, same integer milli
    audit."""
    return f"""
        WITH q AS ({base["quality_logit"]}),
        g AS ({base["gopher_rules"]}),
        j AS (
            SELECT q.doc_id, q.score,
                   CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS label
            FROM q JOIN g ON q.doc_id = g.doc_id
        ),
        b AS (
            SELECT doc_id, score, label,
                   CAST(('0x' || substr(md5('conf:'
                       || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 2 = 0 AS is_cal
            FROM j
        ),
        cp AS (SELECT doc_id, score FROM b WHERE is_cal AND label = 1),
        nk AS (
            SELECT CAST(count(*) AS BIGINT) AS n_cal_pos,
                   CAST((100 * (count(*) + 1)) // 1000 AS BIGINT) AS k
            FROM cp
        ),
        rk AS (
            SELECT score,
                   row_number() OVER (ORDER BY score ASC, doc_id ASC) AS r
            FROM cp
        ),
        th AS (
            SELECT max(score) AS threshold FROM rk
            WHERE r = (SELECT k FROM nk)
        ),
        ev AS (SELECT label, score FROM b WHERE NOT is_cal),
        a AS (
            SELECT (SELECT n_cal_pos FROM nk) AS n_cal_pos,
                   (SELECT k FROM nk) AS k,
                   coalesce((SELECT threshold FROM th), 0.0) AS threshold,
                   CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_eval_pos,
                   CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_eval_neg,
                   CAST(sum(CASE WHEN label = 1 AND score >=
                       coalesce((SELECT threshold FROM th), 0.0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS cov,
                   CAST(sum(CASE WHEN label = 0 AND score <
                       coalesce((SELECT threshold FROM th), 0.0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS exc
            FROM ev
        )
        SELECT n_cal_pos, k, threshold, n_eval_pos, n_eval_neg,
               CASE WHEN n_eval_pos > 0
                    THEN CAST((cov * 1000) // n_eval_pos AS BIGINT)
               END AS coverage_milli,
               CASE WHEN n_eval_neg > 0
                    THEN CAST((exc * 1000) // n_eval_neg AS BIGINT)
               END AS exclusion_milli
        FROM a
    """


def _salsa_oracle() -> str:
    """Twin of ops/graph.salsa_authorities (Lempel & Moran closed form)
    over the pagerank_domains link graph: same hub-star reduction, the
    recursive-reach component min, and the exact micro-unit
    degree-proportional split."""
    return """
        WITH RECURSIVE
        nsrc AS (SELECT count(DISTINCT source) AS n FROM documents),
        edges0 AS (
            SELECT source AS src,
                   'src' || CAST(CAST(('0x' || substr(md5('link:'
                       || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % (SELECT n FROM nsrc) AS VARCHAR) AS dst
            FROM documents
        ),
        e AS (SELECT DISTINCT src AS h, dst AS a FROM edges0),
        din AS (SELECT a, CAST(count(*) AS BIGINT) AS d_in
                FROM e GROUP BY a),
        anch AS (SELECT h, min(a) AS anchor FROM e GROUP BY h),
        star AS (
            SELECT DISTINCT anchor AS x, a AS y
            FROM e JOIN anch USING (h) WHERE a <> anchor
        ),
        sym AS (
            SELECT x AS src, y AS dst FROM star
            UNION SELECT y, x FROM star
        ),
        reach(v, r) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, reach.r FROM sym s JOIN reach ON s.dst = reach.v
        ),
        comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v),
        lab AS (
            SELECT d.a, d.d_in, coalesce(c.component, d.a) AS component
            FROM din d LEFT JOIN comp c ON d.a = c.v
        ),
        cs AS (
            SELECT component, CAST(count(*) AS BIGINT) AS n_c,
                   CAST(sum(d_in) AS BIGINT) AS d_c
            FROM lab GROUP BY component
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lab)
        SELECT lab.a AS node, lab.d_in, lab.component, cs.n_c,
               CAST((cs.n_c * lab.d_in * 1000000)
                    // (tot.n_total * cs.d_c) AS BIGINT) / 1e6 AS salsa
        FROM lab JOIN cs USING (component), tot
    """


def _burst_oracle(s_milli: int = 2000, gamma_milli: int = 1000) -> str:
    """Twin of ops/burst.kleinberg_bursts (Kleinberg 2002 two-state
    optimal labeling): same round-9 nano-unit binomial costs, the same
    forward/backward min-plus recurrences as recursive CTEs, strict-<
    tie-break to the base state."""
    s = s_milli / 1000.0
    gm = gamma_milli / 1000.0
    p0 = "(rr / (SELECT dd FROM tot))"
    p1 = f"least({s} * (rr / (SELECT dd FROM tot)), 0.99999)"
    return f"""
        WITH RECURSIVE
        ev AS (SELECT event_type AS key, date_trunc('hour', ts) AS win
               FROM events),
        kw AS (SELECT key, win, CAST(count(*) AS BIGINT) AS r
               FROM ev GROUP BY 1, 2),
        wins AS (SELECT win, CAST(count(*) AS BIGINT) AS d
                 FROM ev GROUP BY 1),
        keys AS (SELECT key, CAST(count(*) AS BIGINT) AS rr
                 FROM ev GROUP BY 1),
        tot AS (SELECT CAST(sum(d) AS BIGINT) AS dd,
                       CAST(count(*) AS BIGINT) AS t FROM wins),
        grid AS (
            SELECT k.key, w.win, w.d, k.rr, coalesce(kw.r, 0) AS r
            FROM keys k CROSS JOIN wins w
            LEFT JOIN kw ON kw.key = k.key AND kw.win = w.win
        ),
        c AS (
            SELECT key, win, r, d,
                   CAST(round(-(r * ln({p0})
                       + (d - r) * ln(1.0 - {p0})) * 1e9, 0)
                       AS BIGINT) AS k0,
                   CAST(round(-(r * ln({p1})
                       + (d - r) * ln(1.0 - {p1})) * 1e9, 0)
                       AS BIGINT) AS k1,
                   CAST(round({gm} * ln((SELECT t FROM tot)) * 1e9, 0)
                       AS BIGINT) AS g,
                   row_number() OVER (PARTITION BY key ORDER BY win)
                       AS i,
                   count(*) OVER (PARTITION BY key) AS n
            FROM grid
        ),
        fwd(key, i, c0, c1) AS (
            SELECT key, i, k0, g + k1 FROM c WHERE i = 1
            UNION ALL
            SELECT c.key, c.i,
                   least(f.c0, f.c1) + c.k0,
                   least(f.c0 + c.g, f.c1) + c.k1
            FROM fwd f JOIN c ON c.key = f.key AND c.i = f.i + 1
        ),
        bwd(key, i, c0, c1) AS (
            SELECT key, i, k0, k1 FROM c WHERE i = n
            UNION ALL
            SELECT c.key, c.i,
                   least(b.c0, b.c1 + c.g) + c.k0,
                   least(b.c0, b.c1) + c.k1
            FROM bwd b JOIN c ON c.key = b.key AND c.i = b.i - 1
        )
        SELECT c.key, c.win, c.r, c.d,
               CASE WHEN (f.c1 + b.c1 - c.k1) < (f.c0 + b.c0 - c.k0)
                    THEN 1 ELSE 0 END AS burst
        FROM c JOIN fwd f ON c.key = f.key AND c.i = f.i
               JOIN bwd b ON c.key = b.key AND c.i = b.i
    """


def _robots_meta_oracle() -> str:
    """Twin of ops/robotstxt.robots_meta_gate over the same planted
    REP-vocabulary fixture."""
    return """
        WITH b AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE CAST(doc_id % 7 AS INTEGER)
                        WHEN 0 THEN 'index, follow'
                        WHEN 1 THEN 'noindex'
                        WHEN 2 THEN 'NOINDEX, NOFOLLOW'
                        WHEN 3 THEN 'none'
                        WHEN 4 THEN 'all'
                        WHEN 5 THEN NULL
                        ELSE 'noarchive, nofollow, max-snippet:-1'
                   END AS robots
            FROM documents
        ),
        t AS (
            SELECT doc_id, robots,
                   string_split(regexp_replace(lower(coalesce(robots, '')),
                                               '\\s+', '', 'g'), ',') AS toks
            FROM b
        )
        SELECT doc_id, robots,
               list_contains(toks, 'noindex')
                   OR list_contains(toks, 'none') AS noindex,
               list_contains(toks, 'nofollow')
                   OR list_contains(toks, 'none') AS nofollow,
               list_contains(toks, 'noarchive') AS noarchive,
               NOT (list_contains(toks, 'noindex')
                    OR list_contains(toks, 'none')) AS indexable
        FROM t
    """


def _canonical_oracle() -> str:
    """Twin of ops/canonical.resolve_canonical_chains over the planted
    canonical graph: recursive pointer walk (cap 64 > the Spark side's
    2^4 doubling reach; real chains are depth <= 3), max-depth terminal
    per url, root-membership decides resolved vs cycle."""
    return """
        WITH RECURSIVE
        pg AS (
            SELECT 'u' || CAST(doc_id AS VARCHAR) AS u,
                   CASE WHEN doc_id % 5 = 0 THEN NULL
                        WHEN doc_id % 5 IN (1, 2, 3)
                            THEN 'u' || CAST(doc_id - 1 AS VARCHAR)
                        WHEN doc_id % 10 = 4
                            THEN 'u' || CAST(doc_id + 5 AS VARCHAR)
                        ELSE 'u' || CAST(doc_id - 5 AS VARCHAR)
                   END AS canon
            FROM documents
        ),
        one AS (
            SELECT u, coalesce(canon, u) AS v,
                   CASE WHEN coalesce(canon, u) = u THEN 0 ELSE 1 END AS d
            FROM pg
        ),
        uni AS (
            SELECT u, v, d FROM one
            UNION ALL
            SELECT v, v, 0 FROM (
                SELECT DISTINCT v FROM one
                WHERE v NOT IN (SELECT u FROM one)
            )
        ),
        walk(u, cur, dep) AS (
            SELECT u, v, CAST(d AS BIGINT) FROM uni
            UNION ALL
            SELECT w.u, n.v, w.dep + n.d
            FROM walk w JOIN uni n ON n.u = w.cur
            WHERE n.d > 0 AND w.dep < 64
        ),
        fin AS (
            SELECT u, cur, dep FROM walk
            QUALIFY row_number() OVER (PARTITION BY u
                                       ORDER BY dep DESC) = 1
        ),
        roots AS (SELECT u FROM uni WHERE d = 0)
        SELECT f.u AS url,
               CASE WHEN r.u IS NOT NULL THEN f.cur END AS canonical_url,
               CASE WHEN r.u IS NULL THEN 'cycle'
                    WHEN f.dep = 0 THEN 'root'
                    ELSE 'resolved' END AS status,
               CASE WHEN r.u IS NOT NULL THEN f.dep END AS depth
        FROM fin f LEFT JOIN roots r ON f.cur = r.u
        WHERE f.u IN (SELECT u FROM one)
    """


def _weighted_minhash_oracles(
    num_hashes: int = 16, bands: int = 4, cap: int = 8
) -> dict[str, str]:
    """Twins of ops/dedup.weighted_minhash_md5 / weighted_jaccard_pairs:
    same capped duplication expansion, the established md5 seed|element
    min scheme, band equi-join, exact milli weighted Jaccard."""
    rows = num_hashes // bands
    base = f"""
        WITH toks AS (
            SELECT doc_id AS doc,
                   unnest(list_filter(string_split_regex(trim(text),
                       '\\s+'), x -> x <> '')) AS tok
            FROM documents
        ),
        counts AS (
            SELECT doc, tok,
                   CAST(least(count(*), {cap}) AS BIGINT) AS w
            FROM toks GROUP BY 1, 2
        ),
        el AS (
            SELECT doc,
                   tok || '#' || CAST(unnest(range(0,
                       CAST(w AS INTEGER))) AS VARCHAR) AS el
            FROM counts
        ),
        mins AS (
            SELECT doc, seed,
                   min(md5(seed::VARCHAR || '|' || el)) AS minh
            FROM el CROSS JOIN
                 (SELECT unnest(range(0, {num_hashes})) AS seed) s
            GROUP BY doc, seed
        )"""
    sig = (
        base
        + """
        SELECT doc, md5(string_agg(minh, '|' ORDER BY seed)) AS sig_md5
        FROM mins GROUP BY doc
    """
    )
    pairs = (
        base
        + f""",
        bandh AS (
            SELECT doc, seed // {rows} AS band_id,
                   md5(string_agg(minh, '|' ORDER BY seed)) AS band_hash
            FROM mins GROUP BY doc, seed // {rows}
        ),
        cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM bandh a JOIN bandh b
                 ON a.band_id = b.band_id
                AND a.band_hash = b.band_hash
                AND a.doc < b.doc
        ),
        u AS (
            SELECT c.doc_a, c.doc_b, k.tok, k.w AS wa,
                   CAST(0 AS BIGINT) AS wb
            FROM cand c JOIN counts k ON k.doc = c.doc_a
            UNION ALL
            SELECT c.doc_a, c.doc_b, k.tok, CAST(0 AS BIGINT), k.w
            FROM cand c JOIN counts k ON k.doc = c.doc_b
        ),
        g AS (
            SELECT doc_a, doc_b, tok, max(wa) AS wa, max(wb) AS wb
            FROM u GROUP BY 1, 2, 3
        )
        SELECT doc_a, doc_b,
               CAST((sum(least(wa, wb)) * 1000)
                    // sum(greatest(wa, wb)) AS BIGINT) AS wj_milli
        FROM g GROUP BY 1, 2
    """
    )
    return {
        "weighted_minhash_md5": sig,
        "weighted_jaccard_pairs": pairs,
    }


def _card_audit_oracle() -> str:
    """Twin of ops/textstats.card_count_columns over the planted PAN
    fixture: same candidate regex, separator strip, length gate, and
    the Luhn mod-10 fold as nested list lambdas."""
    luhn_sum = (
        "list_sum(list_transform(range(1, len(s) + 1), i -> "
        "CASE WHEN (i - 1) % 2 = 1 THEN "
        "CASE WHEN CAST(substr(reverse(s), i, 1) AS INTEGER) * 2 > 9 "
        "THEN CAST(substr(reverse(s), i, 1) AS INTEGER) * 2 - 9 "
        "ELSE CAST(substr(reverse(s), i, 1) AS INTEGER) * 2 END "
        "ELSE CAST(substr(reverse(s), i, 1) AS INTEGER) END))"
    )
    return f"""
        WITH b AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE CAST(doc_id % 5 AS INTEGER)
                        WHEN 0 THEN text || ' card 4111 1111 1111 1111 ok'
                        WHEN 1 THEN text || ' card 4111-1111-1111-1112 bad'
                        WHEN 2 THEN text || ' order 123456789012345 ref'
                        ELSE text
                   END AS text
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   list_filter(list_transform(
                       regexp_extract_all(text,
                           '\\b[0-9][0-9 -]{{11,22}}[0-9]\\b'),
                       x -> regexp_replace(x, '[ -]', '', 'g')),
                       s -> len(s) >= 13 AND len(s) <= 19) AS inlen
            FROM b
        )
        SELECT doc_id,
               CAST(len(inlen) AS BIGINT) AS n_card_candidates,
               CAST(len(list_filter(inlen,
                   s -> len(s) > 0 AND {luhn_sum} % 10 = 0))
                   AS BIGINT) AS n_cards_luhn_valid
        FROM c
    """


def _hreflang_oracles() -> dict[str, str]:
    """Twins of ops/hreflang over the planted trio fixture: same
    declaration synthesis, the (src,dst) reciprocity self-join, the
    recursive-reach CC over reciprocal edges, min-inbound language and
    the duplicate-language conflict flag."""
    decl = """
        decl AS (
            SELECT 'p' || CAST(doc_id AS VARCHAR) AS url,
                   CASE WHEN (doc_id // 3) % 7 = 3 AND doc_id % 3 = 0
                             AND k = 2 THEN 'de'
                        ELSE ['en', 'de', 'fr'][CAST(k AS INTEGER) + 1]
                   END AS hreflang,
                   'p' || CAST((doc_id // 3) * 3 + k AS VARCHAR) AS href
            FROM documents, (SELECT unnest(range(3)) AS k)
            WHERE NOT ((doc_id // 3) % 5 = 0 AND doc_id % 3 = 2
                       AND k <> 2)
        ),
        back AS (
            SELECT DISTINCT href AS u2, url AS h2, TRUE AS bk FROM decl
        ),
        aud AS (
            SELECT d.url, d.hreflang, d.href,
                   CASE WHEN d.url = d.href THEN 'self'
                        WHEN b.bk THEN 'reciprocal'
                        ELSE 'missing_return' END AS status
            FROM decl d LEFT JOIN back b
                 ON d.url = b.u2 AND d.href = b.h2
        )"""
    audit = f"WITH {decl}\n        SELECT url, hreflang, href, status FROM aud"
    editions = f"""
        WITH RECURSIVE {decl},
        recip AS (
            SELECT url AS src, href AS dst FROM aud
            WHERE status = 'reciprocal'
        ),
        sym AS (
            SELECT src, dst FROM recip UNION SELECT dst, src FROM recip
        ),
        reach(v, rt) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, reach.rt FROM sym s JOIN reach ON s.dst = reach.v
        ),
        comp AS (SELECT v AS url, min(rt) AS component
                 FROM reach GROUP BY v),
        declared AS (
            SELECT href AS url, min(hreflang) AS lang FROM aud
            WHERE status IN ('reciprocal', 'self') GROUP BY href
        ),
        members AS (
            SELECT c.url, c.component, d.lang
            FROM comp c LEFT JOIN declared d USING (url)
        ),
        pl AS (
            SELECT component, lang,
                   CAST(count(DISTINCT url) AS BIGINT) AS n_urls
            FROM members GROUP BY 1, 2
        )
        SELECT m.component AS cluster, m.lang, m.url,
               coalesce(pl.n_urls, 1) > 1 AS lang_conflict
        FROM members m LEFT JOIN pl
             ON m.component = pl.component AND m.lang = pl.lang
    """
    return {"hreflang_audit": audit, "hreflang_editions": editions}


def _phrase_search_oracle() -> str:
    """Twin of ops/search.phrase_search over the planted-phrase
    fixture: same tokenizer, the (tok -> i) phrase dim, and the
    (doc, start) count-distinct-of-i == k match rule."""
    return """
        WITH b AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN doc_id % 21 = 0 THEN text
                            || ' the quick brown fox jumps'
                            || ' the quick brown fox jumps'
                        WHEN doc_id % 7 = 0 THEN text
                            || ' the quick brown fox jumps'
                        ELSE text
                   END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text),
                       '[^a-z0-9]+'), x -> x <> '')) AS tok,
                   CAST(generate_subscripts(
                       list_filter(string_split_regex(lower(text),
                           '[^a-z0-9]+'), x -> x <> ''), 1) - 1
                       AS BIGINT) AS pos
            FROM b
        ),
        dim(tok, i) AS (VALUES ('quick', 0), ('brown', 1), ('fox', 2)),
        hits AS (
            SELECT DISTINCT toks.doc_id, toks.pos - dim.i AS start,
                   dim.i
            FROM toks JOIN dim ON toks.tok = dim.tok
            WHERE toks.pos - dim.i >= 0
        ),
        m AS (
            SELECT doc_id, start FROM hits
            GROUP BY doc_id, start
            HAVING count(DISTINCT i) = 3
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(start) AS BIGINT) AS first_pos
        FROM m GROUP BY doc_id
    """


def _lpt_oracle(shards: int = 4) -> str:
    """Twin of ops/lpt.lpt_shard_assignment: LPT rank order
    (size desc, group asc), recursive fold carrying the shard-load
    LIST, lightest-shard first-occurrence election."""
    init_loads = "[" + ", ".join(["CAST(0 AS BIGINT)"] * shards) + "]"
    return f"""
        WITH RECURSIVE
        sizes AS (
            SELECT source,
                   CAST(sum(len(list_filter(string_split_regex(
                       trim(text), '\\s+'), x -> x <> ''))) AS BIGINT)
                       AS size
            FROM documents GROUP BY source
        ),
        ranked AS (
            SELECT source, size,
                   row_number() OVER (ORDER BY size DESC, source ASC)
                       AS r
            FROM sizes
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
        rec(r, loads, source, size, shard, load_after) AS (
            SELECT 0, {init_loads}, CAST(NULL AS VARCHAR),
                   CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
                   CAST(NULL AS BIGINT)
            UNION ALL
            SELECT g.r,
                   list_transform(range(1, {shards} + 1),
                       i -> CASE WHEN i = list_position(rec.loads,
                                list_min(rec.loads))
                            THEN rec.loads[i] + g.size
                            ELSE rec.loads[i] END),
                   g.source, g.size,
                   CAST(list_position(rec.loads, list_min(rec.loads))
                        - 1 AS INTEGER),
                   rec.loads[list_position(rec.loads,
                       list_min(rec.loads))] + g.size
            FROM rec JOIN ranked g ON g.r = rec.r + 1
        )
        SELECT source, size, shard, load_after
        FROM rec WHERE r >= 1
    """


def _outlier_oracle(k: int = 4, planes: int = 3) -> str:
    """Twin of ops/outliers.embedding_knn_outliers: same literal md5
    planes, within-bucket round-4 cosines in 1e-4 integer units,
    kth-by-sorted-index, singletons surfaced."""
    return f"""
        WITH corpus AS (
            SELECT vec_id AS doc, embedding::DOUBLE[] AS v
            FROM embeddings
        ),
        buckets AS (
            SELECT doc, v,
                   {_md5_bucket_terms(planes=planes)} AS bucket
            FROM corpus
        ),
        sims AS (
            SELECT a.doc,
                   coalesce(CAST(round(round(
                       list_cosine_similarity(a.v, b.v), 4) * 10000)
                       AS BIGINT), 0) AS s
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.doc <> b.doc
        ),
        per AS (
            SELECT doc, list_reverse_sort(list(s)) AS arr
            FROM sims GROUP BY doc
        ),
        scored AS (
            SELECT doc AS vec_id,
                   CAST(len(arr) AS BIGINT) AS n_candidates,
                   arr[least({k}, len(arr))] AS kth_cos_dm,
                   len(arr) < {k} AS low_support
            FROM per
        )
        SELECT vec_id, n_candidates, kth_cos_dm, low_support FROM scored
        UNION ALL
        SELECT c.doc, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), TRUE
        FROM corpus c
        WHERE c.doc NOT IN (SELECT vec_id FROM scored)
    """


def _date_oracles() -> dict[str, str]:
    """Twins of ops/dates over the planted-date fixture: same three
    regex literals, the month-name CASE, the same range validation."""
    from reader_spark.ops.dates import ISO_RE, MONTHS, SLASH_RE, US_RE

    month_case = "CASE lower(list_extract(string_split_regex(s, '[ ,]+'), 1)) " + " ".join(
        f"WHEN '{m}' THEN {i}" for i, m in enumerate(MONTHS, start=1)
    ) + " ELSE 0 END"
    month_name = (
        "["
        + ", ".join(f"'{m.capitalize()}'" for m in MONTHS)
        + "][CAST(doc_id % 12 AS INTEGER) + 1]"
    )
    planted = f"""
        b AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN ' on ' || {month_name}
                        || ' ' || CAST(1 + doc_id % 28 AS VARCHAR) || ', '
                        || CAST(1990 + doc_id % 40 AS VARCHAR) || '.'
                      ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN ' released '
                        || CAST(1990 + doc_id % 40 AS VARCHAR) || '-'
                        || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
                        || '-'
                        || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                      ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN ' filed '
                        || CAST(1 + doc_id % 12 AS VARCHAR) || '/'
                        || CAST(1 + doc_id % 28 AS VARCHAR) || '/'
                        || CAST(1995 + doc_id % 30 AS VARCHAR)
                      ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                        THEN ' bogus 9999-99-99 and 45/77/2020 end'
                      ELSE '' END AS text
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   list_filter(
                       list_transform(
                           regexp_extract_all(text, '{ISO_RE}'),
                           s -> {{'y': CAST(substr(s, 1, 4) AS INTEGER),
                                  'm': CAST(substr(s, 6, 2) AS INTEGER),
                                  'd': CAST(substr(s, 9, 2) AS INTEGER)}})
                       || list_transform(
                           regexp_extract_all(text, '{US_RE}'),
                           s -> {{'y': CAST(list_extract(
                                      string_split_regex(s, '[ ,]+'), 3)
                                      AS INTEGER),
                                  'm': {month_case},
                                  'd': CAST(list_extract(
                                      string_split_regex(s, '[ ,]+'), 2)
                                      AS INTEGER)}})
                       || list_transform(
                           regexp_extract_all(text, '{SLASH_RE}'),
                           s -> {{'y': CAST(string_split(s, '/')[3]
                                      AS INTEGER),
                                  'm': CAST(string_split(s, '/')[1]
                                      AS INTEGER),
                                  'd': CAST(string_split(s, '/')[2]
                                      AS INTEGER)}}),
                       t -> t.y BETWEEN 1900 AND 2099
                            AND t.m BETWEEN 1 AND 12
                            AND t.d BETWEEN 1 AND 31) AS dates
            FROM b
        )"""
    profile = f"""
        WITH {planted}
        SELECT doc_id,
               CAST(len(dates) AS BIGINT) AS n_dates,
               CASE WHEN len(dates) > 0 THEN
                   list_min(list_transform(dates, t -> t.y)) END
                   AS min_year,
               CASE WHEN len(dates) > 0 THEN
                   list_max(list_transform(dates, t -> t.y)) END
                   AS max_year
        FROM m
    """
    recency = f"""
        WITH {planted},
        e AS (SELECT doc_id, unnest(dates) AS t FROM m)
        SELECT t.y AS year,
               CAST(count(*) AS BIGINT) AS n_mentions,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM e GROUP BY t.y
    """
    return {"text_date_profile": profile, "corpus_recency": recency}


def _bm25f_oracle() -> str:
    """Twin of ops/search.bm25f_rank over the planted-anchor fixture:
    same normalization, per-field tf scans, any-field df, weighted
    pre-saturation fusion, round-9/6 discipline, top-15."""
    terms = ["stream", "window", "query"]
    W = [(0, 1.0, 0.75), (1, 2.5, 0.5)]
    tf_cols = ",\n                   ".join(
        f"CAST(len(list_filter(t{fi}, w -> w = '{t}')) AS DOUBLE)"
        f" AS tf_{fi}_{ti}"
        for fi, _w, _b in W
        for ti, t in enumerate(terms)
    )
    df_cols = ",\n                   ".join(
        f"CAST(sum(CASE WHEN tf_0_{ti} > 0 OR tf_1_{ti} > 0"
        f" THEN 1 ELSE 0 END) AS DOUBLE) AS df_{ti}"
        for ti in range(len(terms))
    )
    contribs = []
    for ti in range(len(terms)):
        tfw = " + ".join(
            f"{w} * tf_{fi}_{ti} / (1.0 + {b} * (dl_{fi}"
            f" / greatest(avgdl_{fi}, 1e-9) - 1.0))"
            for fi, w, b in W
        )
        contribs.append(
            f"round(ln(1 + (n_docs - df_{ti} + 0.5) / (df_{ti} + 0.5))"
            f" * ({tfw}) / (1.2 + ({tfw})), 9)"
        )
    score = "\n                         + ".join(contribs)
    return f"""
        WITH b AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                   CASE WHEN doc_id % 4 = 0 THEN 'stream query guide'
                        WHEN doc_id % 4 = 1 THEN 'site ex'
                            || CAST(doc_id % 40 AS VARCHAR) || ' homepage'
                        ELSE '' END AS anchor
            FROM documents
        ),
        d AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g')), ' ') AS t0,
                   string_split(trim(regexp_replace(lower(anchor),
                       '[^a-z0-9]+', ' ', 'g')), ' ') AS t1
            FROM b
        ),
        pd AS (
            SELECT doc_id,
                   CAST(len(t0) AS DOUBLE) AS dl_0,
                   CAST(len(t1) AS DOUBLE) AS dl_1,
                   {tf_cols}
            FROM d
        ),
        st AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   avg(dl_0) AS avgdl_0, avg(dl_1) AS avgdl_1,
                   {df_cols}
            FROM pd
        ),
        scored AS (
            SELECT doc_id,
                   round({score}, 6) AS score
            FROM pd, st
        )
        SELECT doc_id, score FROM scored
        WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 15
    """


def _lexicon_oracle() -> str:
    """Twin of ops/textstats.lexicon_category_profile — the same
    DEFAULT_LEXICON literals (one table, two engines), tokenizer,
    spine and milli shares."""
    from reader_spark.ops.textstats import DEFAULT_LEXICON

    rows = ", ".join(
        f"('{c}', '{w}')"
        for c, ws in sorted(DEFAULT_LEXICON.items())
        for w in sorted(set(ws))
    )
    cats = ", ".join(f"('{c}')" for c in sorted(DEFAULT_LEXICON))
    return f"""
        WITH dim(category, tok) AS (VALUES {rows}),
        cats(category) AS (VALUES {cats}),
        toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(trim(regexp_replace(
                       lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                       t -> t <> '')) AS tok
            FROM documents
        ),
        totals AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
            FROM toks GROUP BY doc_id
        ),
        hits AS (
            SELECT t.doc_id, d.category,
                   CAST(count(*) AS BIGINT) AS n_hits,
                   CAST(count(DISTINCT t.tok) AS BIGINT) AS n_distinct
            FROM toks t JOIN dim d ON t.tok = d.tok
            GROUP BY 1, 2
        ),
        spine AS (
            SELECT doc_id, category FROM documents CROSS JOIN cats
        )
        SELECT s.doc_id, s.category,
               coalesce(h.n_hits, 0) AS n_hits,
               coalesce(h.n_distinct, 0) AS n_distinct,
               CASE WHEN coalesce(tt.n_tokens, 0) > 0
                    THEN CAST((coalesce(h.n_hits, 0) * 1000)
                              // tt.n_tokens AS BIGINT)
               END AS share_milli
        FROM spine s
        LEFT JOIN hits h ON s.doc_id = h.doc_id
             AND s.category = h.category
        LEFT JOIN totals tt ON s.doc_id = tt.doc_id
    """


def _rouge_oracle(
    n: int = 3,
    max_df: int = 20,
    trunc: int = 40,
    threshold: int = 700,
    min_shared: int = 2,
) -> str:
    """Twin of ops/rouge.rouge_l_pairs at the registry parameters.

    Replays the identical Hunt-Szymanski reduction: match positions
    (i asc, j desc) -> patience LIS via list_reduce (the init rides as
    a prepended empty-list element because DuckDB's fold takes the
    first element as the accumulator), same truncated tokenization,
    same distinct-shingle candidates under the df guard, same exact
    integer milli score."""
    return f"""
        WITH toks AS (
            SELECT doc_id AS id,
                   (list_filter(string_split_regex(lower(text),
                        '[^a-z0-9]+'), w -> w <> ''))[1:{trunc}] AS ws
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT id,
                   array_to_string(ws[i:i+{n - 1}], ' ') AS g
            FROM toks, unnest(generate_series(
                1, greatest(len(ws) - {n - 1}, 0))) s(i)
        ),
        guard AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) <= {max_df}
        ),
        gg AS (SELECT grams.id, grams.g FROM grams JOIN guard USING (g)),
        cands AS (
            SELECT a.id AS doc_a, b.id AS doc_b
            FROM gg a JOIN gg b USING (g)
            WHERE a.id < b.id
            GROUP BY 1, 2
            HAVING count(*) >= {min_shared}
        ),
        scored AS (
            SELECT doc_a, doc_b,
                   CAST(len(ta.ws) AS BIGINT) AS len_a,
                   CAST(len(tb.ws) AS BIGINT) AS len_b,
                   CAST(len(list_reduce(
                       list_prepend([]::BIGINT[], list_transform(
                           flatten(list_transform(ta.ws, w ->
                               list_reverse_sort(
                                   list_filter(list_transform(
                                       generate_series(1, len(tb.ws)),
                                       j -> CASE WHEN tb.ws[j] = w
                                                 THEN j END),
                                       x -> x IS NOT NULL)))),
                           j -> [j])),
                       (acc, x) -> CASE
                           WHEN len(list_filter(acc, t -> t < x[1]))
                                = len(acc)
                               THEN list_append(acc, x[1])
                           ELSE list_concat(
                               list_concat(
                                   acc[1:len(list_filter(acc,
                                       t -> t < x[1]))],
                                   [x[1]]),
                               acc[len(list_filter(acc,
                                   t -> t < x[1]))+2:len(acc)])
                       END)) AS BIGINT) AS lcs_len
            FROM cands
            JOIN toks ta ON ta.id = doc_a
            JOIN toks tb ON tb.id = doc_b
        )
        SELECT doc_a, doc_b, len_a, len_b, lcs_len,
               CAST((2000 * lcs_len) // (len_a + len_b) AS BIGINT)
                   AS rouge_l_milli
        FROM scored
        WHERE (2000 * lcs_len) // (len_a + len_b) >= {threshold}
    """


def _fim_oracle(fim_pct: int = 50, spm_pct: int = 50) -> str:
    """Twin of ops/fim.fim_transform at the registry parameters: same
    md5 sampling buckets, same [0, n] cut draws, same substr algebra
    and sentinel renders."""
    h = (
        "CAST(('0x' || substr(md5('fim:{tag}:' || CAST(doc_id AS VARCHAR)"
        "), 1, 8)) AS BIGINT)"
    )
    return f"""
        WITH base AS (
            SELECT doc_id, text, length(text) AS n,
                   {h.format(tag='rate')} % 100 < {fim_pct} AS is_fim,
                   {h.format(tag='spm')} % 100 < {spm_pct} AS is_spm,
                   {h.format(tag='a')} % (length(text) + 1) AS u,
                   {h.format(tag='b')} % (length(text) + 1) AS v
            FROM documents
        ),
        cuts AS (
            SELECT *, least(u, v) AS lo, greatest(u, v) AS hi FROM base
        ),
        parts AS (
            SELECT *,
                   substr(text, 1, lo) AS pfx,
                   substr(text, lo + 1, hi - lo) AS mid,
                   substr(text, hi + 1, n - hi) AS sfx
            FROM cuts
        )
        SELECT doc_id,
               CASE WHEN NOT is_fim THEN 'ar'
                    WHEN is_spm THEN 'spm'
                    ELSE 'psm' END AS mode,
               CAST(n AS BIGINT) AS n_chars,
               CAST(CASE WHEN is_fim THEN lo ELSE 0 END AS BIGINT)
                   AS cut_lo,
               CAST(CASE WHEN is_fim THEN hi ELSE 0 END AS BIGINT)
                   AS cut_hi,
               CASE WHEN NOT is_fim THEN text
                    WHEN is_spm THEN '<|fim_prefix|><|fim_suffix|>'
                        || sfx || '<|fim_middle|>' || pfx || mid
                    ELSE '<|fim_prefix|>' || pfx || '<|fim_suffix|>'
                        || sfx || '<|fim_middle|>' || mid
               END AS sample
        FROM parts
    """


def _license_oracle(head_chars: int = 2000) -> str:
    """Twin of ops/license.license_detect over the planted-header
    documents fixture (queries/code._q_license_detect). Rule phrases
    and the family map are imported from the op — one source of
    truth, the governance-oracle discipline."""
    from reader_spark.ops.license import FAMILY, HEADER_RULES, SPDX_RE

    hdr_cases = "\n                   ".join(
        "WHEN "
        + " AND ".join(
            f"contains(head, '{p}')" for p in phrases
        )
        + f" THEN '{lic}'"
        for lic, phrases in HEADER_RULES
    )
    fam_cases = "\n                   ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in FAMILY.items()
    )
    return f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE
                       WHEN doc_id % 23 = 0
                           THEN '// SPDX-License-Identifier: MIT' || chr(10)
                       WHEN doc_id % 19 = 0
                           THEN '/* Licensed under the Apache License, '
                                || 'Version 2.0 */' || chr(10)
                       WHEN doc_id % 17 = 0
                           THEN '// Permission is hereby granted, free of '
                                || 'charge, to any person obtaining a copy'
                                || chr(10)
                       WHEN doc_id % 13 = 0
                           THEN '/* This program is free software: you can '
                                || 'redistribute it under the GNU General '
                                || 'Public License, version 3 */' || chr(10)
                       WHEN doc_id % 11 = 0
                           THEN '/* Redistribution and use in source and '
                                || 'binary forms is permitted provided that '
                                || 'neither the name of the copyright holder '
                                || 'nor contributors are used */' || chr(10)
                       WHEN doc_id % 7 = 0
                           THEN '# SPDX-License-Identifier: LGPL-2.1'
                                || chr(10)
                       ELSE ''
                   END || text AS content
            FROM documents
        ),
        det AS (
            SELECT doc_id, content,
                   regexp_extract(content,
                       'SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)',
                       1) AS spdx,
                   lower(substr(content, 1, {head_chars})) AS head
            FROM planted
        ),
        hdr AS (
            SELECT doc_id, spdx,
                   CASE
                   {hdr_cases}
                   ELSE '' END AS header
            FROM det
        ),
        lic AS (
            SELECT doc_id,
                   CASE WHEN spdx <> '' THEN spdx ELSE header END
                       AS license_id,
                   CASE WHEN spdx <> '' THEN 'spdx'
                        WHEN header <> '' THEN 'header'
                        ELSE 'none' END AS via
            FROM hdr
        )
        SELECT doc_id, license_id,
               CASE WHEN license_id = '' THEN 'unknown'
                    ELSE CASE license_id
                   {fam_cases}
                   ELSE 'unknown' END
               END AS family,
               via
        FROM lic
    """


def _math_oracle() -> str:
    """Twin of ops/mathdetect.math_signals over the planted-LaTeX
    documents fixture (queries/curation._q_math_signals). Patterns and
    weights import from the op — one source of truth; DuckDB counts
    with len(regexp_extract_all), same RE2 leftmost-nonoverlapping
    semantics as Java's regexp_count."""
    from reader_spark.ops.mathdetect import (
        IS_MATH_CUT,
        MATH_PATTERNS,
        MATH_WEIGHTS,
        SCORE_CAP,
    )

    count_cols = ",\n                   ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
        f" AS {name}"
        for name, pat in MATH_PATTERNS.items()
    )
    score = " + ".join(
        f"{w} * {name}" for name, w in MATH_WEIGHTS.items()
    )
    return f"""
        WITH planted AS (
            SELECT doc_id,
                   text || CASE
                       WHEN doc_id % 13 = 0 THEN
                           ' The identity $e^{{i\\pi}}+1=0$ holds and'
                           || ' $$\\int_0^1 x^2 dx = \\frac{{1}}{{3}}$$'
                           || ' follows.'
                       WHEN doc_id % 7 = 0 THEN
                           ' Compute x = y + z and check 2 < 3.'
                       ELSE ''
                   END AS text
            FROM documents
        ),
        sig AS (
            SELECT doc_id,
                   {count_cols}
            FROM planted
        )
        SELECT doc_id, {", ".join(MATH_PATTERNS)},
               CAST(least({SCORE_CAP}, {score}) AS BIGINT)
                   AS math_score_milli,
               least({SCORE_CAP}, {score}) >= {IS_MATH_CUT} AS is_math
        FROM sig
    """


def _notebook_oracle() -> str:
    """Twin of ops/notebooks.notebook_to_script over the synthesized
    notebook corpus (queries/code._q_notebook_scripts): same word
    chunking, same alternating cell types, same renders — DuckDB
    builds the typed cells directly (the Spark side round-trips them
    through to_json/from_json; parsed content is identical)."""
    return """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               w -> w <> '') AS ws,
                   doc_id % 97 = 0 AS malformed
            FROM documents
        ),
        shaped AS (
            SELECT doc_id, malformed, ws,
                   least(6, CAST(ceil(len(ws) / 8.0) AS BIGINT))
                       AS n_cells
            FROM toks
        ),
        cells AS (
            SELECT doc_id, malformed, n_cells,
                   list_transform(
                       CASE WHEN n_cells > 0
                            THEN generate_series(0, n_cells - 1)
                            ELSE []::BIGINT[] END,
                       i -> struct_pack(
                           cell_type := CASE WHEN i % 2 = 0
                                             THEN 'markdown'
                                             ELSE 'code' END,
                           source := ws[i * 8 + 1 : (i + 1) * 8])) AS cs
            FROM shaped
        ),
        rendered AS (
            SELECT doc_id, malformed, n_cells, cs,
                   array_to_string(
                       list_transform(cs, c ->
                           CASE WHEN c.cell_type = 'code'
                                THEN array_to_string(c.source, chr(10))
                                ELSE array_to_string(
                                    list_transform(c.source,
                                        l -> '# ' || l), chr(10))
                           END),
                       chr(10) || chr(10)) AS script
            FROM cells
        )
        SELECT doc_id,
               NOT malformed AS valid,
               CAST(CASE WHEN malformed THEN 0 ELSE n_cells END
                    AS BIGINT) AS n_cells,
               CAST(CASE WHEN malformed THEN 0 ELSE
                    len(list_filter(cs, c -> c.cell_type = 'code')) END
                    AS BIGINT) AS n_code_cells,
               CAST(CASE WHEN malformed THEN 0 ELSE
                    len(list_filter(cs, c -> c.cell_type = 'markdown'))
                    END AS BIGINT) AS n_markdown_cells,
               CAST(CASE WHEN malformed THEN 0
                    ELSE length(script) END AS BIGINT) AS n_script_chars,
               CASE WHEN malformed THEN NULL ELSE script END AS script
        FROM rendered
    """


def _repo_context_oracle(budget: int = 2000, max_files: int = 8) -> str:
    """Twin of ops/repocontext.repo_context_render over the
    documents-derived repo corpus (queries/code._q_repo_context):
    same path-sorted cap, same prefix-rule budget fold (list_reduce
    with the init riding as a prepended same-struct element), same
    sentinel render."""
    return f"""
        WITH files AS (
            SELECT 'repo-' || CAST(doc_id % 40 AS VARCHAR) AS repo,
                   'src/f' || CAST(doc_id AS VARCHAR) || '.py' AS path,
                   substr(text, 1, 160) AS content
            FROM documents
        ),
        grouped AS (
            SELECT repo,
                   CAST(count(*) AS BIGINT) AS n_files,
                   (list_sort(list(struct_pack(
                        path := path, content := content))))[1:{max_files}]
                       AS sorted
            FROM files GROUP BY repo
        ),
        folded AS (
            SELECT repo, n_files,
                   list_reduce(
                       list_prepend(
                           struct_pack(stopped := false,
                                       chars := CAST(0 AS BIGINT),
                                       ctx := '',
                                       n := CAST(0 AS BIGINT)),
                           list_transform(sorted, f -> struct_pack(
                               stopped := false,
                               chars := CAST(length('<|file_sep|>'
                                   || f.path || chr(10) || f.content)
                                   AS BIGINT),
                               ctx := '<|file_sep|>' || f.path
                                   || chr(10) || f.content,
                               n := CAST(1 AS BIGINT)))),
                       (acc, x) -> CASE
                           WHEN NOT acc.stopped
                                AND acc.chars + x.chars <= {budget}
                               THEN struct_pack(stopped := false,
                                   chars := acc.chars + x.chars,
                                   ctx := acc.ctx || x.ctx,
                                   n := acc.n + 1)
                           ELSE struct_pack(stopped := true,
                               chars := acc.chars,
                               ctx := acc.ctx,
                               n := acc.n)
                       END) AS acc
            FROM grouped
        )
        SELECT repo, n_files,
               CAST(acc.n AS BIGINT) AS n_files_rendered,
               CAST(length('<|repo_name|>' || repo || acc.ctx) AS BIGINT)
                   AS n_chars,
               '<|repo_name|>' || repo || acc.ctx AS context
        FROM folded
    """


def _diversity_oracle(ns=(1, 2, 3)) -> str:
    """Twin of ops/diversity.distinct_ngram_diversity over documents:
    same tokenization, same WITH-multiplicity shingles, same exact
    milli ratios."""
    legs = "\n            UNION ALL\n".join(
        f"""
            SELECT source AS "group", CAST({n} AS BIGINT) AS n,
                   array_to_string(ws[i:i+{n - 1}], ' ') AS g
            FROM toks, unnest(generate_series(
                1, greatest(len(ws) - {n - 1}, 0))) s(i)"""
        for n in ns
    )
    return f"""
        WITH toks AS (
            SELECT source,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               w -> w <> '') AS ws
            FROM documents
        ),
        exploded AS ({legs})
        SELECT "group", n,
               CAST(count(*) AS BIGINT) AS total_ngrams,
               CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
               CAST((1000 * count(DISTINCT g)) // count(*) AS BIGINT)
                   AS distinct_milli
        FROM exploded
        GROUP BY 1, 2
    """


def _semantic_decontam_oracle(tau: float = 0.35) -> str:
    """Twin of ops/decontam.semantic_decontaminate over the
    every-31st-vector eval split: same 2 literal md5 planes
    (_md5_bucket_terms), same round-4 cosine threshold, same
    per-corpus-doc rollup."""
    return f"""
        WITH corpus AS (
            SELECT vec_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 31 <> 0
        ),
        evals AS (
            SELECT vec_id AS eval_id, embedding::DOUBLE[] AS v
            FROM embeddings WHERE vec_id % 31 = 0
        ),
        cb AS (
            SELECT vec_id, v, {_md5_bucket_terms(planes=2)} AS bucket
            FROM corpus
        ),
        eb AS (
            SELECT eval_id, v, {_md5_bucket_terms(planes=2)} AS bucket
            FROM evals
        ),
        hits AS (
            SELECT cb.vec_id, eb.eval_id,
                   round(list_cosine_similarity(cb.v, eb.v), 4) AS cos
            FROM cb JOIN eb USING (bucket)
            WHERE round(list_cosine_similarity(cb.v, eb.v), 4) >= {tau}
        )
        SELECT vec_id,
               CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_hits,
               max(cos) AS max_cosine
        FROM hits GROUP BY vec_id
    """


def _url_parallel_oracle() -> str:
    """Twin of ops/urlbitext.url_parallel_pairs over the doc_id-derived
    URL corpus (queries/bitext._q_url_parallel_pairs): same synth CASE,
    same marker stripping regexes, same (key, lang) min election and
    cross-language pairing. Markers import from the op."""
    from reader_spark.ops.urlbitext import DEFAULT_LANG_MARKERS

    marker_list = ", ".join(f"'{m}'" for m in DEFAULT_LANG_MARKERS)
    return f"""
        WITH urls AS (
            SELECT doc_id,
                   CASE
                       WHEN doc_id % 3 = 0 THEN 'https://'
                           || (['en','fr','de','xx'])[doc_id % 4 + 1]
                           || '.' || 'site' || CAST(doc_id % 73 AS VARCHAR)
                           || '.com' || '/page/'
                           || CAST(doc_id % 73 AS VARCHAR)
                       WHEN doc_id % 3 = 1 THEN 'https://'
                           || 'site' || CAST(doc_id % 73 AS VARCHAR)
                           || '.com' || '/'
                           || (['en','fr','de','xx'])[doc_id % 4 + 1]
                           || '/page/' || CAST(doc_id % 73 AS VARCHAR)
                       ELSE 'https://www.' || 'site'
                           || CAST(doc_id % 73 AS VARCHAR) || '.com'
                           || '/page/' || CAST(doc_id % 73 AS VARCHAR)
                   END AS url
            FROM documents
        ),
        norm AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(lower(url),
                       '^[a-z]+://', ''), '^www\\.', '') AS u
            FROM urls
        ),
        split_parts AS (
            SELECT doc_id, u,
                   regexp_extract(u, '^([^/]*)', 1) AS host,
                   substr(u, length(regexp_extract(u, '^([^/]*)', 1)) + 1)
                       AS path
            FROM norm
        ),
        marked AS (
            SELECT doc_id, u, host, path,
                   regexp_extract(host, '^([^.]+)\\.', 1) AS first_sub,
                   regexp_extract(path, '^/([^/]+)', 1) AS first_seg
            FROM split_parts
        ),
        tagged AS (
            SELECT doc_id AS doc,
                   CASE
                       WHEN first_sub <> ''
                            AND first_sub IN ({marker_list})
                           THEN first_sub
                       WHEN first_seg <> ''
                            AND first_seg IN ({marker_list})
                           THEN first_seg
                       ELSE '' END AS lang,
                   CASE
                       WHEN first_sub <> ''
                            AND first_sub IN ({marker_list})
                           THEN regexp_replace(host, '^[^.]+\\.', '')
                               || path
                       WHEN first_seg <> ''
                            AND first_seg IN ({marker_list})
                           THEN host
                               || regexp_replace(path, '^/[^/]+', '')
                       ELSE u END AS key
            FROM marked
        ),
        elected AS (
            SELECT key, lang, min(doc) AS doc
            FROM tagged WHERE lang <> ''
            GROUP BY key, lang
        )
        SELECT a.key, a.lang AS lang_a, a.doc AS doc_a,
               b.lang AS lang_b, b.doc AS doc_b
        FROM elected a JOIN elected b USING (key)
        WHERE a.lang < b.lang
    """

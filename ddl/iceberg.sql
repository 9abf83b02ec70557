-- Iceberg DDL for the production deployment (schemas are always DECLARED,
-- never inferred — SURVEY.md §1.1). The sandbox runtime has no Iceberg jars,
-- so tests run the parquet backend of reader_spark.spark.io.Warehouse; the
-- table shapes are identical.
--
-- Catalog assumed configured as:
--   spark.sql.catalog.warehouse = org.apache.iceberg.spark.SparkCatalog
--   spark.sql.catalog.warehouse.type = hadoop     (or hive/rest)
--   spark.sql.catalog.warehouse.warehouse = <warehouse-uri>

-- Input corpus: interleaved text+media documents (BASELINE.json input_hint).
-- bucket(doc_id) gives uniform scan splits AND makes the resume anti-join
-- and any doc_id equi-join storage-partitioned (no shuffle on the docs side).
CREATE TABLE IF NOT EXISTS warehouse.docs (
    doc_id STRING NOT NULL,
    spans  ARRAY<STRUCT<kind: STRING, text: STRING,
                        media_ref: STRING, offset: INT>>
)
USING iceberg
PARTITIONED BY (bucket(1024, doc_id))
TBLPROPERTIES (
    'write.target-file-size-bytes' = '268435456',
    'read.split.target-size'       = '134217728'
);

-- Extraction output. Same bucketing as docs so resume (left-anti join on
-- doc_id) is co-partitioned; snapshot isolation gives the resume read a
-- consistent committed set.
CREATE TABLE IF NOT EXISTS warehouse.extracted (
    doc_id     STRING NOT NULL,
    spans      ARRAY<STRUCT<kind: STRING, text: STRING,
                            media_ref: STRING, order: INT>>,
    markdown   STRING,
    metadata   STRUCT<
        title: STRING, description: STRING, author: STRING,
        language: STRING, charset: STRING, favicon: STRING,
        canonical: STRING, image: STRING, keywords: ARRAY<STRING>,
        robots: STRING, themeColor: STRING,
        openGraph: STRUCT<title: STRING, description: STRING, type: STRING,
                          url: STRING, image: STRING, siteName: STRING,
                          locale: STRING>,
        twitter: STRUCT<card: STRING, site: STRING, creator: STRING,
                        title: STRING, description: STRING, image: STRING>>,
    error_kind STRING,
    error_msg  STRING,
    run_id     STRING,
    partition_id INT,
    bytes_in   BIGINT,
    bytes_out  BIGINT,
    elapsed_ms BIGINT
)
USING iceberg
PARTITIONED BY (bucket(1024, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'none');
-- distribution-mode none: the extraction output is written straight from
-- the UDF stage; forcing a write-side repartition would shuffle every span
-- payload once more for no read-side benefit.

-- Lineage sidecar (BatchMetadata analogue, src/types.ts:352-370): tiny,
-- partitioned by run for cheap per-run pruning.
CREATE TABLE IF NOT EXISTS warehouse.lineage (
    run_id       STRING NOT NULL,
    partition_id INT,
    doc_count    BIGINT,
    ok_count     BIGINT,
    err_count    BIGINT,
    bytes_in     BIGINT,
    bytes_out    BIGINT,
    wall_ms      BIGINT,
    ts           TIMESTAMP
)
USING iceberg
PARTITIONED BY (run_id);

-- Clean training corpus (corpus_prep output). Bucketed like docs so joins
-- back to the raw corpus (audits, re-extraction diffs) stay co-partitioned.
CREATE TABLE IF NOT EXISTS warehouse.clean_corpus (
    doc_id      STRING NOT NULL,
    markdown    STRING,
    spans       ARRAY<STRUCT<kind: STRING, text: STRING,
                             media_ref: STRING, order: INT>>,
    token_count INT,
    punct_ratio DOUBLE
)
USING iceberg
PARTITIONED BY (bucket(1024, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'none');

-- IVF ANN index: corpus vectors tagged with their coarse-quantizer cell.
-- PARTITIONED BY cell -> a probe reads only nprobe/n_cells of the files
-- (partition pruning verified in tests/test_plans.py).
CREATE TABLE IF NOT EXISTS warehouse.ivf_index (
    corpus_id  BIGINT NOT NULL,
    corpus_vec ARRAY<DOUBLE>,
    cell       INT NOT NULL
)
USING iceberg
PARTITIONED BY (cell);

-- Media sidecar: opaque binary + typed metadata (ops/multimodal.py).
-- Binary payloads never join or shuffle; features are extracted in place
-- and land in narrow tables keyed by media_id.
CREATE TABLE IF NOT EXISTS warehouse.media (
    media_id STRING NOT NULL,
    doc_id   STRING,
    kind     STRING,             -- image | audio | video
    content  BINARY,
    meta     STRUCT<mime: STRING, width: INT, height: INT,
                    duration_ms: BIGINT, sample_rate: INT>
)
USING iceberg
PARTITIONED BY (bucket(1024, doc_id));

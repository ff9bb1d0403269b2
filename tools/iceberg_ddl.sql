-- One-time Iceberg DDL for the Common-Crawl-style pages table
-- (see docs/ICEBERG.md; run via spark-sql with the iceberg runtime).
CREATE TABLE IF NOT EXISTS graft.db.pages (
  url     STRING,
  warc_ts TIMESTAMP,
  html    BINARY,
  text    STRING,
  lang    STRING)
USING iceberg
PARTITIONED BY (days(warc_ts), lang)
TBLPROPERTIES (
  'write.distribution-mode' = 'hash',
  'write.target-file-size-bytes' = '536870912'
);

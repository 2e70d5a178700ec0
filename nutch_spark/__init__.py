"""nutch_spark — a from-scratch, PySpark-native re-expression of the
Apache Nutch crawl cycle (reference: Elio-Earth/nutch @ /root/reference).

The engine implements generate -> fetch -> parse -> updatedb over
snapshot-versioned columnar tables, as declarative DataFrame plans:

- ``nutch_spark.schema``     — CrawlDatum status codes and table schemas
  (reference: src/java/org/apache/nutch/crawl/CrawlDatum.java:63-105).
- ``nutch_spark.config``     — engine configuration mirroring the
  semantically load-bearing keys of conf/nutch-default.xml.
- ``nutch_spark.urls``       — URL normalization / filtering / host+domain
  extraction / hashing (vectorized pandas UDFs).
- ``nutch_spark.operators``  — inject, generate, fetch (simulated),
  parse, updatedb, dedup, linkdb, hostdb, stats, merger.
- ``nutch_spark.catalog``    — snapshot-versioned parquet tables with
  atomic commit, time travel and per-commit lineage/metrics (the
  sandbox stand-in for Iceberg; the production deployment swaps this
  for an Iceberg catalog without touching operator code).
- ``nutch_spark.pipeline``   — the bin/crawl macro-loop as a Spark driver.
- ``nutch_spark.ml``         — large-scale training-data pipeline ops
  (dedup: exact/minhash-LSH/simhash, similarity search, text analysis,
  multimodal column plumbing) over the documents/embeddings tables.

Nothing in here ports reference code; file:line citations in docstrings
point at the behavior being re-expressed, Spark-first.
"""

__version__ = "0.1.0"

"""nutch-spark: a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the sihai/nutch reference (Apache Nutch 1.6 e-commerce fork) as idiomatic
Spark dataflow: generate -> fetch -> parse -> updatedb over snapshot-committed
tables of interleaved text+media documents.

Design notes (see SURVEY.md):
- DataFrame/Catalyst everywhere; Python only as pandas/Arrow UDFs.
- Politeness unit = host: byHost repartition puts one host in exactly one
  partition (reference: crawl/URLPartitioner.java:36-93).
- topN generator semantics are per-partition windows, matching the
  reference's `limit = topN / numReduceTasks` (crawl/Generator.java:141).
- The production catalog is Apache Iceberg; in this sandbox (no Iceberg jars)
  `nutch_spark.storage.SnapshotTable` provides the same atomic
  snapshot-commit / time-travel / resume semantics over parquet.
"""

__version__ = "0.1.0"

from nutch_spark.config import CrawlConfig  # noqa: F401

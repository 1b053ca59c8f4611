"""Reader/statistics tools.

- CrawlDbReader stats (crawl/CrawlDbReader.java:148-247): counts by status,
  min/max/avg score and fetch interval, retry histogram. The reference needs
  a hand-written combiner; Spark's partial+final HashAggregate does that
  automatically — pure Catalyst, fully pushed down.
- CrawlDbReader topN (crawl/CrawlDbReader.java:249-284): global top-N by
  score with a min-score pre-filter.
- DomainStatistics (util/domain/DomainStatistics.java:47+): URL counts per
  host / domain / suffix / tld.
- CSV dump (CrawlDbReader.java:95-146): df.write.csv.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nutch_spark.functions.urls import domain_udf, host_col, suffix_udf, tld_udf


def crawldb_stats(frontier: DataFrame) -> DataFrame:
    """Per-status stats (CrawlDbReader.java:148-247)."""
    return (
        frontier.groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("score"), 4).alias("min_score"),
            F.round(F.max("score"), 4).alias("max_score"),
            F.round(F.avg("score"), 4).alias("avg_score"),
            F.min("fetch_interval").alias("min_interval"),
            F.max("fetch_interval").alias("max_interval"),
            F.max("retries").alias("max_retries"),
        )
        .orderBy("status")
    )


def crawldb_topn(frontier: DataFrame, n: int, min_score: float = 0.0) -> DataFrame:
    """Global top-N by score (CrawlDbReader.java:249-284). The min-score
    pre-filter prunes the sort input exactly like the reference's first job."""
    df = frontier
    if min_score > 0:
        df = df.filter(F.col("score") >= min_score)
    return df.orderBy(F.desc("score"), F.asc("url")).limit(n).select("url", "score")


def domain_statistics(frontier: DataFrame, mode: str = "host") -> DataFrame:
    """URL counts per host/domain/suffix/tld (DomainStatistics.java:47+).
    suffix = the matched public suffix (e.g. co.uk); tld = its last label
    (e.g. uk) — distinct modes over the full domain-suffixes table."""
    url = F.col("url")
    if mode == "host":
        key = host_col(url)
    elif mode == "domain":
        key = domain_udf(url)
    elif mode == "suffix":
        key = suffix_udf(url)
    elif mode == "tld":
        key = tld_udf(url)
    else:
        raise ValueError(mode)
    return frontier.select(key.alias(mode)).groupBy(mode).agg(F.count("*").alias("n"))


def dump_csv(frontier: DataFrame, path: str) -> None:
    """CrawlDb CSV dump (CrawlDbReader.java:95-146)."""
    frontier.select(
        "url", "status", "fetch_time", "retries", "fetch_interval", "score",
        "signature", "modified_time",
    ).write.mode("overwrite").option("header", True).csv(path)

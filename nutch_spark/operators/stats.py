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


def segment_dump(
    fetch_status: DataFrame,
    documents: DataFrame | None = None,
    parse_text: DataFrame | None = None,
) -> DataFrame:
    """SegmentReader dump: the merged per-URL view across segment parts
    (segment/SegmentReader.java:204-228 reduce concatenates CrawlDatum /
    ParseData / ParseText per URL; :228-316 dump writes the co-grouped
    records). One wide row per URL via full-outer joins on url — fetch
    datum columns, parse span/outlink counts, parse text. At scale every
    side is bucketed/keyed by url, so the co-group is a storage-partitioned
    join like J1."""
    f = fetch_status.select(
        "url", "fetch_status", "fetch_ts", "signature", "content_length",
    )
    out = f
    if documents is not None:
        d = documents.select(
            F.col("doc_id").alias("url"),
            F.size("spans").cast("long").alias("n_spans"),
            F.size(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("link"))
            ).cast("long").alias("n_outlinks"),
        )
        out = out.join(d, "url", "full_outer")
    else:
        out = out.select(
            "*", F.lit(None).cast("long").alias("n_spans"),
            F.lit(None).cast("long").alias("n_outlinks"))
    if parse_text is not None:
        out = out.join(parse_text.select("url", "text"), "url", "full_outer")
    else:
        out = out.select("*", F.lit(None).cast("string").alias("text"))
    return out


def segment_get(dump: DataFrame, url: str) -> DataFrame:
    """SegmentReader get (SegmentReader.java:319-500): the per-URL record —
    a key-equality filter over the merged view. With the url-bucketed
    storage this prunes to one bucket instead of scanning the segment."""
    return dump.filter(F.col("url") == url)


def crawldb_get(frontier: DataFrame, url: str) -> DataFrame:
    """CrawlDbReader get / readUrl (crawl/CrawlDbReader.java:378-395,
    `readdb -url`): the single datum for one URL. The reference probes the
    MapFile partition by the key's hash; with the url-bucketed frontier the
    equality predicate prunes to one bucket the same way instead of
    scanning the 10^10-row table."""
    return frontier.filter(F.col("url") == url)


def crawldb_scan(
    frontier: DataFrame, regex: str, status: str | None = None
) -> DataFrame:
    """CrawlDBScanner (tools/CrawlDBScanner.java:80-100): dump frontier rows
    whose URL FULLY matches the regex (Java String.matches semantics ->
    anchored rlike), optionally pre-filtered by status NAME
    (case-insensitive, :84-86). Pure Catalyst: both predicates push into
    the frontier scan, so the dump reads only matching row groups instead
    of materializing the 10^10-row table."""
    from nutch_spark import schemas

    out = frontier
    if status is not None:
        wanted = [code for code, name in schemas.STATUS_NAMES.items()
                  if name.lower() == status.lower()]
        if not wanted:
            # a typo'd status name used to map to code -1 and return an
            # EMPTY dump — indistinguishable from "regex matched nothing"
            raise ValueError(
                f"unknown crawldb status name {status!r}; valid: "
                + ", ".join(sorted(schemas.STATUS_NAMES.values())))
        out = out.filter(F.col("status") == wanted[0])
    # String.matches anchors BOTH ends regardless of ^/$ in the pattern, so
    # always wrap: a caller-supplied "^http" must not become a prefix match
    # (the group also protects top-level alternation precedence)
    return out.filter(F.col("url").rlike("^(?:" + regex + ")$"))

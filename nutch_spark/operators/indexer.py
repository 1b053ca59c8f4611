"""Indexing stage: the 5-way co-group + field filters + dedup.

- IndexerMapReduce (indexer/IndexerMapReduce.java:149-161): crawldb ⋈ linkdb
  ⋈ parse_data ⋈ parse_text ⋈ crawl_fetch on url; a document is emitted only
  if dbDatum + fetchDatum + parseData + parseText are ALL present (inner-join
  semantics); skip gone/notmodified.
- BasicIndexingFilter (plugin/index-basic/.../BasicIndexingFilter.java:59-110):
  fields host, domain, url, content, title, tstamp.
- anchor filter (plugin/index-anchor/): inlink anchors from linkdb.
- indexerScore (scoring/opic/OPICScoringFilter.java:155-157):
  boost = score^power.
- SolrDeleteDuplicates (indexer/solr/SolrDeleteDuplicates.java:60+): among
  docs with equal signature keep the highest-scoring (then shortest URL) —
  a window dedupe.

The "index" here is a table (the Solr sink is a writer swap in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.functions.dates import http_date_format_udf
from nutch_spark.functions.urls import domain_udf, host_col


def build_index(
    frontier: DataFrame,
    fetch_out: DataFrame,
    parse_text: DataFrame,
    parse_data: DataFrame,
    linkdb: DataFrame | None,
    cfg: CrawlConfig,
) -> DataFrame:
    """The indexer co-group (J2) + basic/anchor/score filters (I2-I4)."""
    db = frontier.filter(
        ~F.col("status").isin(schemas.STATUS_DB_GONE, schemas.STATUS_DB_NOTMODIFIED)
    ).select("url", "status", "score", "fetch_time", "signature")
    fetched = fetch_out.filter(
        F.col("fetch_status") == schemas.STATUS_FETCH_SUCCESS
    ).select("url", "fetch_ts", "content_length")
    pd_cols = parse_data
    if "noindex" in parse_data.columns:
        # robots-noindex pages never reach the index (X6; IndexerMapReduce
        # honors the meta directive via the parse status)
        pd_cols = parse_data.filter(~F.coalesce(F.col("noindex"), F.lit(False)))
    doc = (
        db.join(fetched, "url", "inner")
        .join(parse_text.select("url", "text"), "url", "inner")
        .join(pd_cols.select("url", "title"), "url", "inner")
    )
    if linkdb is not None:
        anchors = linkdb.select(
            F.col("to_url").alias("url"),
            F.col("inlinks"),
        ).select(
            "url",
            F.transform(F.col("inlinks"), lambda s: s["anchor"]).alias("anchors"),
        )
        doc = doc.join(anchors, "url", "left")
    else:
        doc = doc.withColumn("anchors", F.lit(None).cast("array<string>"))
    return doc.select(
        F.col("url"),
        host_col(F.col("url")).alias("host"),
        domain_udf(F.col("url")).alias("domain"),
        F.col("title"),
        F.col("text").alias("content"),
        F.col("anchors"),
        F.col("signature").alias("digest"),
        F.col("fetch_ts").alias("tstamp"),
        F.pow(F.col("score").cast("double"), F.lit(cfg.indexer_score_power)).alias("boost"),
        # index-more fields (plugin/index-more MoreIndexingFilter: date,
        # contentLength; content-type is constant text/html in this corpus)
        F.col("content_length").alias("content_length"),
        http_date_format_udf(F.col("fetch_ts")).alias("date"),
    )


def dedup_index(index: DataFrame) -> DataFrame:
    """Keep one doc per digest: highest boost, then shortest/lexical URL
    (SolrDeleteDuplicates semantics)."""
    w = Window.partitionBy("digest").orderBy(
        F.desc("boost"), F.asc(F.length("url")), F.asc("url")
    )
    return (
        index.filter(F.col("digest").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )

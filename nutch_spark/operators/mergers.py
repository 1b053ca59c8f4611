"""CrawlDb / segment merge tools.

- CrawlDbMerger (crawl/CrawlDbMerger.java:60+): merge N frontiers; the entry
  with the latest fetch_time wins; metadata maps union (newer overlays).
- SegmentMerger (segment/SegmentMerger.java:66-112): union N segments, keep
  the latest record per URL per part, segment id (timestamp) as recency.

Both are union + window row_number — exact reference semantics (argmax by
recency), no collect, scales linearly in input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_crawldbs(dbs: list[DataFrame]) -> DataFrame:
    """Latest fetch_time wins per url; deterministic tiebreak on status.

    Metadata is ACCUMULATED across all merged versions with newer values
    overriding older ones (CrawlDbMerger.java:51,81-100) — the winning row
    carries the union of every version's metadata, folded in recency order.
    Applies only when the inputs carry a metadata column."""
    un = dbs[0]
    for d in dbs[1:]:
        un = un.unionByName(d)
    w = Window.partitionBy("url").orderBy(
        F.desc("fetch_time"), F.desc("status"), F.desc("score")
    )
    winner = (un.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") == 1).drop("rk"))
    if "metadata" not in un.columns:
        return winner
    empty = F.create_map().cast("map<string,string>")
    # fold metadata maps in ascending recency (same total order as the
    # winner window, reversed) so newer keys override older ones
    cmp_asc = lambda a, b: F.when(a["o"] < b["o"], F.lit(-1)).when(  # noqa: E731
        a["o"] > b["o"], F.lit(1)).otherwise(F.lit(0))
    ordered = F.array_sort(
        F.collect_list(F.struct(
            F.struct("fetch_time", "status", "score").alias("o"),
            F.coalesce(F.col("metadata"), empty).alias("m"),
        )),
        cmp_asc,
    )
    merged = un.groupBy("url").agg(
        F.aggregate(
            ordered, empty,
            lambda acc, x: F.map_concat(
                F.map_filter(acc, lambda k, _:
                             ~F.map_contains_key(x["m"], k)),
                x["m"],
            ),
        ).alias("_merged_meta")
    )
    return (
        winner.join(merged, "url")
        .withColumn(
            "metadata",
            F.when(F.size("_merged_meta") > 0, F.col("_merged_meta")),
        )
        .drop("_merged_meta")
    )


def merge_segments(segments: list[DataFrame], seg_ids: list[int] | None = None) -> DataFrame:
    """Union segment outputs (any per-url part), keep newest per url.
    Each input must carry a `segment` column (yyyyMMddHHmmss-style long) or
    pass seg_ids to stamp them."""
    stamped = []
    for i, s in enumerate(segments):
        if "segment" not in s.columns:
            s = s.withColumn("segment", F.lit(seg_ids[i] if seg_ids else i).cast("long"))
        stamped.append(s)
    un = stamped[0]
    for d in stamped[1:]:
        un = un.unionByName(d, allowMissingColumns=True)
    w = Window.partitionBy("url").orderBy(F.desc("segment"))
    return un.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")

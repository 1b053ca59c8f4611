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
    """Latest fetch_time wins per url; deterministic tiebreak on status."""
    un = dbs[0]
    for d in dbs[1:]:
        un = un.unionByName(d)
    w = Window.partitionBy("url").orderBy(
        F.desc("fetch_time"), F.desc("status"), F.desc("score")
    )
    return un.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")


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

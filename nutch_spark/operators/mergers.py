"""CrawlDb / segment merge tools.

- CrawlDbMerger (crawl/CrawlDbMerger.java:60+): merge N frontiers; the entry
  with the latest fetch_time wins; metadata maps union (newer overlays).
- SegmentMerger (segment/SegmentMerger.java:66-112): union N segments, keep
  the latest record per URL per part, segment id (timestamp) as recency.

Both are union + max_by hash-aggregate (argmax by recency) — exact
reference semantics, no collect, one exchange, map-side partials collapse
per-url versions before the wire (PLANS §6.23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_crawldbs(dbs: list[DataFrame]) -> DataFrame:
    """Latest fetch_time wins per url; deterministic tiebreak on status.

    Metadata is ACCUMULATED across all merged versions with newer values
    overriding older ones (CrawlDbMerger.java:51,81-100) — the winning row
    carries the union of every version's metadata, folded in recency order.
    Applies only when the inputs carry a metadata column."""
    un = dbs[0]
    for d in dbs[1:]:
        un = un.unionByName(d)
    cols = un.columns
    recency = F.struct("fetch_time", "status", "score")
    # argmax via max_by hash-aggregate, not a row_number window (§6.18/6.22
    # shape): map-side partials collapse per-url versions before the wire
    # and the reduce side skips the whole-partition sort
    aggs = [F.max_by(F.struct(*cols), recency).alias("_win")]
    has_meta = "metadata" in cols
    if has_meta:
        empty = F.create_map().cast("map<string,string>")
        # fold metadata maps in ascending recency (same total order as the
        # winner, reversed) so newer keys override older ones — in the SAME
        # aggregate, so the old winner⋈merged join (one more url exchange)
        # is gone
        cmp_asc = lambda a, b: F.when(a["o"] < b["o"], F.lit(-1)).when(  # noqa: E731
            a["o"] > b["o"], F.lit(1)).otherwise(F.lit(0))
        ordered = F.array_sort(
            F.collect_list(F.struct(
                recency.alias("o"),
                F.coalesce(F.col("metadata"), empty).alias("m"),
            )),
            cmp_asc,
        )
        aggs.append(F.aggregate(
            ordered, empty,
            lambda acc, x: F.map_concat(
                F.map_filter(acc, lambda k, _:
                             ~F.map_contains_key(x["m"], k)),
                x["m"],
            ),
        ).alias("_merged_meta"))
    g = un.groupBy("url").agg(*aggs)
    out_cols = [
        F.col("url") if c == "url" else F.col(f"_win.{c}").alias(c)
        for c in cols
    ]
    if not has_meta:
        return g.select(*out_cols)
    out_cols = [
        F.when(F.size("_merged_meta") > 0, F.col("_merged_meta")).alias(c)
        if c == "metadata" else c_
        for c, c_ in zip(cols, out_cols)
    ]
    return g.select(*out_cols)


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
    cols = un.columns
    # argmax-by-segment hash aggregate (url is unique within a segment and
    # segment ids are distinct, so the max is unambiguous — same rows the
    # previous row_number window kept, without its sort)
    # segment key wrapped in a struct: max_by SKIPS rows whose ordering
    # expr is NULL (a url whose segment values are all NULL would emit a
    # fabricated all-null row); a struct is never null, and its null field
    # sorts smallest — so non-null segments win and an all-null group
    # keeps a real row, matching the old desc-nulls-last window
    return (
        un.groupBy("url")
        .agg(F.max_by(F.struct(*cols), F.struct(F.col("segment"))).alias("_win"))
        .select(*[
            F.col("url") if c == "url" else F.col(f"_win.{c}").alias(c)
            for c in cols
        ])
    )

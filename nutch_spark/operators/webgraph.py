"""WebGraph + LinkRank (scoring/webgraph/*).

- WebGraph build (WebGraph.java:533-700): OutlinkDb = per-src document-order
  greedy over outlinks — an outlink is kept only when its target PAGE
  (lowercased url, query stripped) and target DOMAIN are both unseen for
  that src (the sets grow only on accept, WebGraph.java:369-391), gated by
  link.ignore.internal.host/.domain and most-recent-fetch-time; NodeDb =
  degrees over the kept edges. link.delete.gone (:569) drops every outlink
  of a src whose fetch status is redirect/gone.
- LinkRank (LinkRank.java:88-660): every node starts at
  link.analyze.initial.score (1.0, :333); each iteration contributes
  inlinkScore/numOutlinks per kept inlink (Node.java:69), the per-node sum
  seeds at rankOne = 1/numNodes (:551,625-627), and
  score = (1-d) + d * totalInlinkScore. The Analyzer's inlink dedup
  (:509-545, one counted inlink per src-page and per src-domain, sets grow
  on accept) depends only on (order, page, domain) — iteration-invariant
  under the deterministic src-ascending order this port fixes (the MR value
  order the reference iterates is undefined) — so it is computed ONCE
  before the loop and the 10-iteration loop stays pure Catalyst. The
  optional Loops database removes loop-set edges in the inverter (:408-440).
- ScoreUpdater (ScoreUpdater.java:76,119-131): webgraph score overwrites the
  frontier score; urls ABSENT from the node db are reset to
  link.score.updater.clear.score (0.0), not left as-is.

Scale: edges are repartitioned by src once; each iteration is one shuffle
(groupBy dst). The pre-loop inlink greedy collects one in-neighborhood per
dst (same per-key memory class as the reference's Analyzer reducer) after
an exact (dst,page,domain)->min-src pre-dedup; the fold compares xxhash64
lanes, O(k * distinct-domains) per mega-hub dst worst case — disclosed,
mirrors the reference's own per-reducer HashSet scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from nutch_spark.checkpoints import iter_checkpoint
from nutch_spark.functions.urls import (
    extract_host, extract_host_series, host_col, registered_domain,
)


def _page_col(url_col):
    """URLUtil.getPage (URLUtil.java:468-478): lowercased url with the query
    string stripped."""
    return F.substring_index(F.lower(url_col), "?", 1)


def _domain_col(url_col):
    """Registered domain of a url's host, JVM host extraction + suffix-table
    walk (URLUtil.getDomainName) via the cached Python port — used only in
    the once-per-build annotation passes, never inside the iteration loop."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _dom(urls: pd.Series) -> pd.Series:
        return extract_host_series(urls).map(registered_domain,
                                             na_action="ignore")

    return _dom(url_col)


def build_webgraph(parse_data: DataFrame, ts: int = 0,
                   fetch_status: DataFrame | None = None, *,
                   ignore_internal_host: bool = True,
                   ignore_internal_domain: bool = True,
                   limit_pages: bool = True,
                   limit_domains: bool = True,
                   delete_gone: bool = False) -> dict[str, DataFrame]:
    """parse_data -> edges(src,dst,anchor,ts) + nodes(url,in_deg,out_deg).

    OutlinkDb reducer port (WebGraph.java:330-395): per src, outlinks are
    walked in DOCUMENT order (the reference's LinkedHashMap keeps insertion
    order) and kept only when target page AND target domain are unseen —
    both sets grow only on accept — after the ignore-internal gates. The
    walk runs inside each row's outlink array (<= db.max.outlinks.per.page
    elements), so it is a bounded Arrow kernel, not a shuffle.

    delete_gone (WebGraph.java:569,275-280): srcs whose fetch status is
    REDIR_TEMP/REDIR_PERM/GONE contribute no outlinks; pass the cycle's
    fetch_status (url, status) to enable.

    SCALE NOTE: both returned frames are lazy, and `nodes` re-executes the
    greedy kernel once per degree branch. The reference runs this as two
    jobs — OutlinkDb is WRITTEN, then NodeDb derives from the written edges
    (WebGraph.java:540-608). Mirror that at scale: persist/write `edges`
    first and derive `nodes` (and LinkRank input) from the materialized
    table, or the outlink walk runs three times.
    """
    from nutch_spark import schemas

    src_rows = parse_data.select("url", "outlinks")
    if "ts" in parse_data.columns:
        # most-recent wins (WebGraph.java:335-347): only outlinks carrying
        # the newest fetch time for their src survive
        w_ts = Window.partitionBy("url")
        src_rows = (
            parse_data.select("url", "outlinks", "ts")
            .withColumn("_max_ts", F.max("ts").over(w_ts))
            .filter(F.col("ts") == F.col("_max_ts"))
            .select("url", "outlinks")
        )
    if delete_gone and fetch_status is not None:
        gone = fetch_status.filter(
            F.col("status").isin(
                schemas.STATUS_FETCH_REDIR_TEMP,
                schemas.STATUS_FETCH_REDIR_PERM,
                schemas.STATUS_FETCH_GONE,
            )
        ).select("url")
        src_rows = src_rows.join(gone, "url", "left_anti")

    from pyspark.sql.types import (ArrayType, StringType, StructField,
                                   StructType)
    out_schema = ArrayType(StructType([
        StructField("to_url", StringType()),
        StructField("anchor", StringType()),
    ]))

    @F.pandas_udf(out_schema)
    def _greedy(urls: pd.Series, outlinks: pd.Series) -> pd.Series:
        res = []
        for url, links in zip(urls, outlinks):
            if links is None or len(links) == 0:
                res.append([])
                continue
            host = extract_host(url)
            dom = registered_domain(host)
            pages: set = set()
            doms: set = set()
            kept = []
            for ln in links:
                to_url = ln["to_url"]
                if to_url is None:
                    continue
                to_host = extract_host(to_url)
                to_dom = registered_domain(to_host)
                lo = to_url.lower()
                to_page = lo.split("?", 1)[0]
                if ignore_internal_host and to_host is not None \
                        and to_host == host:
                    continue
                if ignore_internal_domain and to_dom is not None \
                        and to_dom == dom:
                    continue
                if limit_pages and to_page in pages:
                    continue
                # an unextractable host yields to_dom=None: never pool
                # those under one shared None key (two unrelated hostless
                # targets must not suppress each other; Java's URL path
                # never produces a shared null domain)
                if limit_domains and to_dom is not None and to_dom in doms:
                    continue
                kept.append({"to_url": to_url, "anchor": ln["anchor"]})
                pages.add(to_page)
                if to_dom is not None:
                    doms.add(to_dom)
            res.append(kept)
        return pd.Series(res)

    edges = (
        src_rows.select(
            F.col("url").alias("src"),
            F.explode(_greedy(F.col("url"), F.col("outlinks"))).alias("l"),
        )
        .select(
            "src",
            F.col("l.to_url").alias("dst"),
            F.col("l.anchor").alias("anchor"),
            F.lit(ts).alias("ts"),
        )
    )
    # cross-row (src,dst) dedup for multi-segment input (one edge per pair)
    w = Window.partitionBy("src", "dst").orderBy(F.desc("ts"), F.asc("anchor"))
    edges = edges.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")

    return {"edges": edges, "nodes": nodes_from_edges(edges)}


def nodes_from_edges(edges: DataFrame) -> DataFrame:
    """NodeDb derivation (WebGraph.java:540-608): per-url in/out degree
    over the (deduped) edge set. Shared by build_webgraph and the tool
    CLI's webgraph command, which runs it over MATERIALIZED edges."""
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    return (
        out_deg.select(F.col("src").alias("url"), "out_deg")
        .join(in_deg.select(F.col("dst").alias("url"), "in_deg"), "url", "full_outer")
        .fillna(0, ["in_deg", "out_deg"])
    )


def limit_inlinks(edges: DataFrame, limit_pages: bool = True,
                  limit_domains: bool = True) -> DataFrame:
    """LinkRank Analyzer inlink dedup (LinkRank.java:509-545): walking a
    dst's inlinks in src-ascending order, an inlink is COUNTED only when its
    src page and src domain are both unseen; both sets grow only on accept.
    (The reference walks MR value order, which is undefined — src-ascending
    is this port's deterministic realization.)

    Exact pre-reduction: rows identical in (dst, page, domain) can never be
    counted after the first-in-order one (accept marks both keys; reject
    marks nothing, and the sets only grow), so the fold input is bounded by
    distinct (page, domain) pairs per dst. The fold itself runs JVM-side
    over xxhash64 lanes of page/domain (no Python in the path).
    """
    if not (limit_pages or limit_domains):
        return edges.select("src", "dst")
    ann = edges.select(
        "src", "dst",
        F.xxhash64(_page_col(F.col("src"))).alias("ph"),
        F.xxhash64(_domain_col(F.col("src"))).alias("dh"),
    )
    # one exchange for the whole tail (PLANS §6.20 shape): dst-hash placement
    # satisfies the (dst,ph,dh) pre-reduction window AND the fold's
    # groupBy(dst) — the default plan shipped the annotated edges twice
    ann = ann.repartition("dst")
    w = Window.partitionBy("dst", "ph", "dh").orderBy("src")
    ann = (ann.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1).drop("rk"))

    init = F.struct(
        F.array().cast("array<bigint>").alias("pages"),
        F.array().cast("array<bigint>").alias("doms"),
        F.array().cast("array<string>").alias("kept"),
    )
    folded = (
        ann.groupBy("dst")
        .agg(F.array_sort(F.collect_list(F.struct("src", "ph", "dh"))).alias("ins"))
        .select(
            "dst",
            F.aggregate(
                "ins", init,
                lambda acc, x: F.when(
                    F.array_contains(acc["pages"], x["ph"]) if limit_pages
                    else F.lit(False), acc
                ).when(
                    F.array_contains(acc["doms"], x["dh"]) if limit_domains
                    else F.lit(False), acc
                ).otherwise(F.struct(
                    F.array_append(acc["pages"], x["ph"]).alias("pages"),
                    F.array_append(acc["doms"], x["dh"]).alias("doms"),
                    F.array_append(acc["kept"], x["src"]).alias("kept"),
                )),
            ).alias("acc"),
        )
        .select("dst", F.explode("acc.kept").alias("src"))
        .select("src", "dst")
    )
    return folded


def linkrank(edges: DataFrame, nodes: DataFrame, iterations: int = 10,
             damping: float = 0.85, initial_score: float = 1.0,
             rank_one: float | None = None,
             limit_pages: bool = True, limit_domains: bool = True,
             loops: DataFrame | None = None) -> DataFrame:
    """Iterative LinkRank loop, reference-exact (LinkRank.java:595-660).

    - init: every node scores link.analyze.initial.score (:333, default 1.0);
    - inverter: share = score/numOutlinks (Node.java:69) where numOutlinks
      is the NodeDb out-degree over ALL kept edges — loop-set filtering
      (:429-440) drops contributions but does NOT shrink the divisor;
    - analyzer: per dst, totalInlinkScore seeds at rankOne = 1/numNodes
      (:625-627) and sums the greedily-deduped inlink shares
      (limit_inlinks above); score = (1-d) + d*total (:551-552).
    """
    edges = edges.select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    if loops is not None:
        # Inverter loop-set filter (LinkRank.java:429-440): drop outlinks
        # contained in the src's loop set; out_deg above stays the full count
        edges = (
            edges.join(loops.select(F.col("url").alias("src"), "loop_set"),
                       "src", "left")
            .filter(F.col("loop_set").isNull()
                    | ~F.array_contains(F.col("loop_set"), F.col("dst")))
            .select("src", "dst")
        )
    edges = limit_inlinks(edges, limit_pages, limit_domains)
    edges = edges.repartition("src").cache()
    out_deg = out_deg.cache()
    # every iteration left-joins the node list; pin it so the node-source
    # subtree executes once (count() below doubles as the materializer)
    nodes = iter_checkpoint(nodes.select("url"), eager=True)
    n_nodes = nodes.count()
    r1 = (1.0 / n_nodes) if rank_one is None else rank_one
    rank = nodes.select("url", F.lit(float(initial_score)).alias("rank"))

    for _ in range(iterations):
        contrib = (
            edges.join(rank.withColumnRenamed("url", "src"), "src")
            .join(out_deg, "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("in_share"))
        )
        rank = (
            nodes.select("url")
            .join(contrib.withColumnRenamed("dst", "url"), "url", "left")
            .select(
                "url",
                (F.lit(1.0 - damping) + F.lit(damping)
                 * (F.lit(r1) + F.coalesce(F.col("in_share"), F.lit(0.0)))
                 ).alias("rank"),
            )
        )
        rank = iter_checkpoint(rank, eager=False)  # cut lineage per iteration
    return rank


def node_dump(nodes: DataFrame, rank: DataFrame | None = None,
              by: str = "scores", topn: int | None = None,
              descending: bool = True) -> DataFrame:
    """NodeDumper (scoring/webgraph/NodeDumper.java:58-220): top urls by
    number of inlinks, number of outlinks, or link-analysis score, asc or
    desc, optionally capped at topn. Pure Catalyst: project + global sort
    (+ limit pushes a TakeOrdered at scale)."""
    if by == "inlinks":
        df = nodes.select("url", F.col("in_deg").cast("double").alias("value"))
    elif by == "outlinks":
        df = nodes.select("url", F.col("out_deg").cast("double").alias("value"))
    elif by == "scores":
        if rank is None:
            raise ValueError("by='scores' needs the linkrank frame")
        df = nodes.select("url").join(rank, "url", "left").select(
            "url", F.coalesce(F.col("rank"), F.lit(0.0)).alias("value")
        )
    else:
        raise ValueError(by)
    order = [F.desc("value") if descending else F.asc("value"), F.asc("url")]
    df = df.orderBy(*order)
    return df.limit(topn) if topn is not None else df


def link_dump(edges: DataFrame, nodes: DataFrame, rank: DataFrame | None = None) -> DataFrame:
    """LinkDumper (scoring/webgraph/LinkDumper.java:60-130 analogue): per
    target url, its inlink nodes with their score/degree state — the
    "why does this url rank this way" debugging view, as a queryable table
    instead of a MapFile."""
    info = nodes
    if rank is not None:
        info = info.join(rank, "url", "left")
    else:
        info = info.withColumn("rank", F.lit(None).cast("double"))
    src_info = info.select(
        F.col("url").alias("src"), F.col("in_deg").alias("src_in_deg"),
        F.col("out_deg").alias("src_out_deg"), F.col("rank").alias("src_rank"),
    )
    return (
        edges.select("src", "dst")
        .join(src_info, "src")
        .groupBy(F.col("dst").alias("url"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("src", "src_rank", "src_in_deg", "src_out_deg")
                )
            ).alias("inlink_nodes"),
            F.count("*").alias("n_inlinks"),
        )
    )


def update_scores(frontier: DataFrame, rank: DataFrame,
                  clear_score: float = 0.0) -> DataFrame:
    """ScoreUpdater (ScoreUpdater.java:76,119-131): overwrite frontier score
    with the graph score; urls ABSENT from the node db are reset to
    link.score.updater.clear.score (default 0.0) — the reference clears
    stale scores rather than preserving them (J5)."""
    return (
        frontier.join(rank.withColumnRenamed("rank", "graph_score"), "url", "left")
        .withColumn(
            "score",
            F.coalesce(F.col("graph_score"), F.lit(float(clear_score))).cast("float"),
        )
        .drop("graph_score")
    )


def find_loops(edges: DataFrame, depth: int = 2) -> DataFrame:
    """L3 Loops (scoring/webgraph/Loops.java:79-560): link-cycle detection.

    Reference semantics, ported pass-for-pass:
    - Initializer (:238-275): every node WITH inlinks seeds one route per
      outlink: (looking_for=url, outlink_url=first hop, position=first hop);
    - Looper x depth (:338-393, default link.loops.depth=2 -> finds cycles
      up to 3 links, :515): a route at `position` is FOUND when position's
      outlinks contain looking_for; otherwise it forks to every outlink
      (routes at sinks fall off); found routes stop propagating;
    - Finalizer (:434-459): LoopSet(url) = the SET of first-hop outlink
      urls whose route returned — route.outlinkUrl is never rewritten after
      the Initializer, so the set identifies which outgoing edges of `url`
      sit on a cycle.

    The reference marks the job prohibitively expensive at web scale
    (Loops.java:73-77) because routes fork combinatorially; this port
    dedupes routes on (looking_for, first_hop, position) — semantics-
    preserving since the Finalizer output is a set — which bounds state by
    |URLs|^2/... in the worst case but by edges x avg-degree^depth in
    practice; depth stays small (2) exactly like the reference.

    Returns (url, loop_set array<string>, n_loops)."""
    # materialize the deduped edge set once: every Looper pass joins against
    # it (and `routes` derives from it) — without the checkpoint the edge
    # fixture subtree re-executes per pass x per join
    e = iter_checkpoint(edges.select("src", "dst").distinct(), eager=True)
    inlinked = e.select(F.col("dst").alias("src")).distinct()
    routes = (
        e.join(inlinked, "src")  # numInlinks > 0 gate (:261-263)
        .select(
            F.col("src").alias("looking_for"),
            F.col("dst").alias("first_hop"),
            F.col("dst").alias("position"),
        )
        .distinct()
    )
    out = e.select(F.col("src").alias("position"), F.col("dst").alias("nxt"))
    found_parts: list[DataFrame] = []
    for i in range(max(depth, 1)):
        hits = (
            routes.join(out, "position")
            .filter(F.col("nxt") == F.col("looking_for"))
            .select("looking_for", "first_hop")
            .distinct()
        )
        if i < depth - 1:
            # this pass's hits feed BOTH the final union and the next
            # pass's anti-join; the next routes checkpoint materializes
            # them eagerly anyway, so pinning them here is free and stops
            # the final action recomputing the routes-join a second time
            hits = iter_checkpoint(hits, eager=True)
        found_parts.append(hits)
        if i < depth - 1:
            routes = (
                routes.join(hits, ["looking_for", "first_hop"], "left_anti")
                .join(out, "position")
                .select("looking_for", "first_hop", F.col("nxt").alias("position"))
                .distinct()
            )
            routes = iter_checkpoint(routes, eager=True)  # cut the per-pass lineage
    found = found_parts[0]
    for f in found_parts[1:]:
        found = found.unionByName(f)
    return (
        found.distinct()
        .groupBy(F.col("looking_for").alias("url"))
        .agg(
            F.sort_array(F.collect_set("first_hop")).alias("loop_set"),
            F.countDistinct("first_hop").alias("n_loops"),
        )
    )

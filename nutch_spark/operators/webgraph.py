"""WebGraph + LinkRank (scoring/webgraph/*).

- WebGraph build (WebGraph.java:533-700): OutlinkDb = deduped timestamped
  edges; InlinkDb = inversion; NodeDb = degrees + score.
- LinkRank (LinkRank.java:88-660): score = (1-d) + d * sum(inlink shares),
  d=0.85, default 10 iterations, initial score 1/N... realized as the classic
  iterative DataFrame pagerank loop with per-iteration localCheckpoint to cut
  lineage (the reference writes each iteration to HDFS — same role).
- ScoreUpdater (ScoreUpdater.java:60+): webgraph score -> frontier score
  (left join + coalesce).

Scale: edges are repartitioned by src once; each iteration is one shuffle
(groupBy dst). Dedup-by-domain options from LinkRank.java:457-563 are
exposed as flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nutch_spark.functions.urls import host_col


def build_webgraph(parse_data: DataFrame, ts: int = 0,
                   ignore_internal: bool = False) -> dict[str, DataFrame]:
    """parse_data -> edges(src,dst,anchor,ts) + nodes(url,in_deg,out_deg)."""
    edges = (
        parse_data.select(
            F.col("url").alias("src"),
            F.explode_outer("outlinks").alias("l"),
        )
        .filter(F.col("l").isNotNull())
        .select(
            "src",
            F.col("l.to_url").alias("dst"),
            F.col("l.anchor").alias("anchor"),
            F.lit(ts).alias("ts"),
        )
    )
    if ignore_internal:
        edges = edges.filter(host_col(F.col("dst")) != host_col(F.col("src")))
    # OutlinkDb dedup: one edge per (src,dst), latest ts (WebGraph.java:112-401)
    w = Window.partitionBy("src", "dst").orderBy(F.desc("ts"), F.asc("anchor"))
    edges = edges.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    nodes = (
        out_deg.select(F.col("src").alias("url"), "out_deg")
        .join(in_deg.select(F.col("dst").alias("url"), "in_deg"), "url", "full_outer")
        .fillna(0, ["in_deg", "out_deg"])
    )
    return {"edges": edges, "nodes": nodes}


def linkrank(edges: DataFrame, nodes: DataFrame, iterations: int = 10,
             damping: float = 0.85, dedup_by_host: bool = False) -> DataFrame:
    """Iterative LinkRank loop (LinkRank.java:595-660)."""
    spark = edges.sparkSession
    if dedup_by_host:  # count one inlink per (dst, src-host) (LinkRank.java:457-563)
        w = Window.partitionBy("dst", host_col(F.col("src"))).orderBy("src")
        edges = edges.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk")

    edges = edges.select("src", "dst").repartition("src").cache()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg")).cache()
    # every iteration left-joins the node list; pin it so the node-source
    # subtree executes once (count() below doubles as the materializer)
    nodes = nodes.select("url").localCheckpoint(eager=True)
    n_nodes = nodes.count()
    rank = nodes.select("url", (F.lit(1.0) / n_nodes).alias("rank"))

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
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce(F.col("in_share"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=False)  # cut lineage per iteration
        )
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


def update_scores(frontier: DataFrame, rank: DataFrame) -> DataFrame:
    """ScoreUpdater: overwrite frontier score with graph score (J5)."""
    return (
        frontier.join(rank.withColumnRenamed("rank", "graph_score"), "url", "left")
        .withColumn("score", F.coalesce(F.col("graph_score"), F.col("score")).cast("float"))
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
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
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
        found_parts.append(hits)
        if i < depth - 1:
            routes = (
                routes.join(hits, ["looking_for", "first_hop"], "left_anti")
                .join(out, "position")
                .select("looking_for", "first_hop", F.col("nxt").alias("position"))
                .distinct()
                .localCheckpoint(eager=True)  # cut the per-pass lineage
            )
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

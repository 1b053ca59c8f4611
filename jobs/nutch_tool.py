"""spark-submit CLI for the standalone tools — the `bin/nutch <command>`
dispatch table (reference: src/bin/nutch:194-247) minus the crawl-loop
commands, which live in jobs/crawl_job.py (crawl/inject/generate/fetch/
parse/updatedb run as one resumable loop there).

    spark-submit --py-files nutch_spark.zip jobs/nutch_tool.py <command> ...

Tables are parquet paths (the directory a job or the crawl loop wrote),
mirroring how the reference commands take crawldb/linkdb/segment dirs.
Output goes to --out as parquet, or to stdout with --show.

Commands:
  readdb      CrawlDbReader: -stats | -topn N | -url U | -scan REGEX | -dump
  readlinkdb  LinkDbReader: -dump | -url U           (input: inlink rows)
  invertlinks LinkDb invert: parse_data -> inlink rows
  mergedb     CrawlDbMerger: union N crawldbs, latest fetch_time wins
  mergelinkdb LinkDbMerger: union N linkdbs, dedupe + re-cap
  mergesegs   SegmentMerger: union N segments, newest per url
  readseg     SegmentReader: -dump merged view | -get U
  solrdedup   SolrDeleteDuplicates over the index table
  solrclean   SolrClean: drop DB_GONE docs from the index table
  domainstats DomainStatistics: host|domain|suffix|tld counts
  webgraph    OutlinkDb/NodeDb build from parse_data
  linkrank    LinkRank iterations over a built webgraph
  scoreupdater ScoreUpdater: fold rank into the crawldb score
  nodedumper  NodeDumper: top-N nodes by inlinks/outlinks/scores
  loops       Loops: short-cycle detection
  parsechecker  single-document parse debug (local html file + url)
  indexchecker  single-document indexing-filter debug
  dataset     end-to-end training-dataset build over a documents parquet
              (lang gate -> quality -> dedup -> PII scrub -> quota -> split)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(master: str | None):
    from nutch_spark.session import get_spark

    return get_spark(master=master or os.environ.get("SPARK_MASTER", "local[*]"))


def _emit(df, args) -> None:
    if getattr(args, "out", None):
        df.write.mode("overwrite").parquet(args.out)
    else:
        df.show(getattr(args, "n", 20) or 20, truncate=False)


def _content_df(spark, html_path: str, url: str, content_type: str | None):
    with open(html_path, encoding="utf-8", errors="replace") as fh:
        body = fh.read()
    return spark.createDataFrame(
        [(url, body, content_type or "text/html")],
        "url string, content string, content_type string",
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nutch_tool", description=__doc__)
    ap.add_argument("--master", help="spark master (default local[*])")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, *specs):
        p = sub.add_parser(name)
        for flags, kw in specs:
            p.add_argument(*flags, **kw)
        p.add_argument("--out", help="write result as parquet here")
        p.add_argument("-n", type=int, default=20, help="rows to show without --out")
        return p

    add("readdb", (["crawldb"], {}),
        (["-stats"], {"action": "store_true"}),
        (["-topn"], {"type": int}),
        (["-min"], {"type": float, "default": 0.0}),
        (["-url"], {}), (["-scan"], {}), (["-status"], {}),
        (["-dump"], {"action": "store_true"}))
    add("readlinkdb", (["linkdb"], {}),
        (["-url"], {}), (["-dump"], {"action": "store_true"}))
    add("invertlinks", (["parse_data"], {}))
    add("mergedb", (["dbs"], {"nargs": "+"}))
    add("mergelinkdb", (["dbs"], {"nargs": "+"}))
    add("mergesegs", (["segs"], {"nargs": "+"}),
        (["-seg-ids"], {"dest": "seg_ids", "type": int, "nargs": "+",
                        "help": "recency stamp per segment (same order as "
                                "segs) for inputs lacking a 'segment' "
                                "column; without it such inputs are "
                                "stamped by ARGUMENT POSITION, so 'newest "
                                "per url' means last-listed"}))
    add("readseg", (["fetch"], {}), (["docs"], {}), (["ptext"], {}),
        (["-get"], {}))
    add("solrdedup", (["index"], {}))
    add("solrclean", (["index"], {}), (["crawldb"], {}))
    add("domainstats", (["crawldb"], {}),
        (["-mode"], {"default": "host",
                     "choices": ["host", "domain", "suffix", "tld"]}))
    add("webgraph", (["parse_data"], {}), (["outdir"], {}))
    add("linkrank", (["webgraph_dir"], {}),
        (["-iterations"], {"type": int}))  # default: cfg link.analyze.num.iterations
    add("scoreupdater", (["crawldb"], {}), (["rank"], {}),
        (["-clear-score"], {"dest": "clear_score", "type": float}))
    # ^ default: cfg link.score.updater.clear.score
    add("nodedumper", (["nodes"], {}),
        (["-by"], {"default": "inlinks",
                   "choices": ["inlinks", "outlinks", "scores"]}),
        (["-topn"], {"type": int, "default": 100}),
        (["-rank"], {"help": "optional linkrank parquet for -by scores"}))
    add("loops", (["webgraph_dir"], {}),
        (["-depth"], {"type": int}))  # default: cfg link.loops.depth
    add("fileproto", (["urls"], {"nargs": "+"}),
        (["-maxContentLength"], {"dest": "max_len", "type": int}),
        (["-dumpContent"], {"dest": "dump_content", "action": "store_true"}))
    add("dataset", (["documents"], {}),
        (["-langs"], {"default": "en"}),
        (["-minChars"], {"dest": "min_chars", "type": int, "default": 80}),
        (["-punctPermille"], {"dest": "punct_permille", "type": int,
                              "default": 200}),
        (["-quota"], {"type": int, "default": 1000}),
        (["-valFrac"], {"dest": "val_frac", "type": float, "default": 0.01}))
    add("parsechecker", (["html"], {}), (["url"], {}),
        (["-forceAs"], {"dest": "force_as"}),
        (["-dumpText"], {"dest": "dump_text", "action": "store_true"}))
    add("indexchecker", (["html"], {}), (["url"], {}),
        (["-forceAs"], {"dest": "force_as"}))

    args = ap.parse_args(argv)
    spark = _spark(args.master)
    read = spark.read.parquet

    from nutch_spark.config import CrawlConfig
    cfg = CrawlConfig()

    if args.cmd == "readdb":
        from nutch_spark.operators import stats
        db = read(args.crawldb)
        if args.stats:
            df = stats.crawldb_stats(db)
        elif args.topn is not None:
            df = stats.crawldb_topn(db, args.topn, args.min)
        elif args.url:
            df = stats.crawldb_get(db, args.url)
        elif args.scan:
            df = stats.crawldb_scan(db, args.scan, status=args.status)
        else:  # -dump
            df = db
        _emit(df, args)
    elif args.cmd == "readlinkdb":
        from nutch_spark.operators.linkdb import (
            linkdb_aggregate, linkdb_dump, linkdb_get,
        )
        db = linkdb_aggregate(read(args.linkdb), cfg)
        df = linkdb_get(db, args.url) if args.url else linkdb_dump(db)
        _emit(df, args)
    elif args.cmd == "invertlinks":
        from nutch_spark.operators.linkdb import invert_links
        _emit(invert_links(read(args.parse_data), cfg), args)
    elif args.cmd == "mergedb":
        from nutch_spark.operators.mergers import merge_crawldbs
        _emit(merge_crawldbs([read(p) for p in args.dbs]), args)
    elif args.cmd == "mergelinkdb":
        from nutch_spark.operators.linkdb import merge_linkdbs
        _emit(merge_linkdbs([read(p) for p in args.dbs], cfg), args)
    elif args.cmd == "mergesegs":
        from nutch_spark.operators.mergers import merge_segments
        if args.seg_ids is not None and len(args.seg_ids) != len(args.segs):
            raise SystemExit("mergesegs: -seg-ids needs one id per segment")
        _emit(merge_segments([read(p) for p in args.segs],
                             seg_ids=args.seg_ids), args)
    elif args.cmd == "readseg":
        from nutch_spark.operators.stats import segment_dump, segment_get
        dump = segment_dump(read(args.fetch), read(args.docs), read(args.ptext))
        _emit(segment_get(dump, args.get) if args.get else dump, args)
    elif args.cmd == "solrdedup":
        from nutch_spark.operators.indexer import dedup_index
        _emit(dedup_index(read(args.index)), args)
    elif args.cmd == "solrclean":
        from nutch_spark.operators.indexer import clean_index
        _emit(clean_index(read(args.index), read(args.crawldb)), args)
    elif args.cmd == "domainstats":
        from nutch_spark.operators.stats import domain_statistics
        _emit(domain_statistics(read(args.crawldb), mode=args.mode), args)
    elif args.cmd == "webgraph":
        from nutch_spark.operators.webgraph import build_webgraph
        # thread the link.* conf knobs (WebGraph.java:233-234,569) — they
        # were declared in CrawlConfig but reached no call site
        g = build_webgraph(
            read(args.parse_data),
            ignore_internal_host=cfg.link_ignore_internal_host,
            ignore_internal_domain=cfg.link_ignore_internal_domain,
            limit_pages=cfg.link_ignore_limit_page,
            limit_domains=cfg.link_ignore_limit_domain,
            delete_gone=cfg.link_delete_gone)
        # reference runs OutlinkDb then NodeDb as separate jobs — write
        # edges first, derive nodes from the MATERIALIZED edges (see the
        # build_webgraph scale note)
        g["edges"].write.mode("overwrite").parquet(f"{args.outdir}/edges")
        from nutch_spark.operators.webgraph import nodes_from_edges
        nodes_from_edges(read(f"{args.outdir}/edges")) \
            .write.mode("overwrite").parquet(f"{args.outdir}/nodes")
        print(f"webgraph written: {args.outdir}/edges, {args.outdir}/nodes")
    elif args.cmd == "linkrank":
        from nutch_spark.operators.webgraph import linkrank
        edges = read(f"{args.webgraph_dir}/edges")
        nodes = read(f"{args.webgraph_dir}/nodes")
        _emit(linkrank(
            edges, nodes.select("url"),
            iterations=(args.iterations if args.iterations is not None
                        else cfg.link_analyze_num_iterations),
            damping=cfg.link_analyze_damping_factor,
            initial_score=cfg.link_analyze_initial_score,
            limit_pages=cfg.link_ignore_limit_page,
            limit_domains=cfg.link_ignore_limit_domain), args)
    elif args.cmd == "scoreupdater":
        from nutch_spark.operators.webgraph import update_scores
        _emit(update_scores(
            read(args.crawldb), read(args.rank),
            clear_score=(args.clear_score if args.clear_score is not None
                         else cfg.link_score_updater_clear_score)), args)
    elif args.cmd == "nodedumper":
        from nutch_spark.operators.webgraph import node_dump
        rank = read(args.rank) if args.rank else None
        _emit(node_dump(read(args.nodes), rank=rank, by=args.by,
                        topn=args.topn), args)
    elif args.cmd == "loops":
        from nutch_spark.operators.webgraph import find_loops
        _emit(find_loops(
            read(f"{args.webgraph_dir}/edges"),
            depth=(args.depth if args.depth is not None
                   else cfg.link_loops_depth)), args)
    elif args.cmd == "fileproto":
        # protocol-file debug main (plugin File.java:107-170:
        # `File [-maxContentLength L] [-dumpContent] url`)
        from pyspark.sql import functions as F
        from nutch_spark.sources.fileproto import fetch_file_protocol
        if args.max_len is not None:
            cfg = CrawlConfig(file_content_limit=args.max_len)
        df = fetch_file_protocol(
            spark.createDataFrame([(u,) for u in args.urls], "url string"),
            cfg)
        if args.dump_content:
            df = df.withColumn("content", F.col("content").cast("string"))
        else:
            df = df.drop("content")
        _emit(df, args)
    elif args.cmd == "dataset":
        # end-to-end training-dataset build over a documents parquet
        # (lang gate -> quality -> exact dedup -> PII scrub -> domain
        # quota -> train/val split) — the composed pipeline surface,
        # drivable standalone like the other tools
        from nutch_spark.plans.dataset import build_dataset
        _emit(build_dataset(
            read(args.documents),
            langs=tuple(s for s in args.langs.split(",") if s),
            min_chars=args.min_chars,
            punct_permille_max=args.punct_permille,
            quota=args.quota,
            val_frac=args.val_frac), args)
    elif args.cmd == "parsechecker":
        from nutch_spark.operators.checkers import check_parse
        df = check_parse(_content_df(spark, args.html, args.url, None),
                         cfg, force_content_type=args.force_as,
                         dump_text=args.dump_text)
        _emit(df, args)
    elif args.cmd == "indexchecker":
        from nutch_spark.operators.checkers import check_index
        _emit(check_index(
            _content_df(spark, args.html, args.url, None), cfg,
            force_content_type=args.force_as), args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

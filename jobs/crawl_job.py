"""spark-submit entrypoint for the crawl loop (north_rule deployment shape).

Cluster:
    zip -r nutch_spark.zip nutch_spark
    spark-submit --py-files nutch_spark.zip jobs/crawl_job.py \
        --catalog s3://bucket/crawl --depth 10 --topn 10000 --partitions 2048

Sandbox (local mode is the default master):
    python jobs/crawl_job.py --catalog /tmp/crawl --depth 3 --bench-corpus

The job is resumable: re-submitting with the same --catalog continues from
the last committed cycle (snapshot tags; see plans/crawl_cycle.py). Seeds
come from --seeds (url-per-line text file, Injector format: '#' comments,
tab-separated key=value metadata incl. nutch.score / nutch.fetchInterval —
crawl/Injector.java:84-129) or --bench-corpus for the synthetic web.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def parse_seed_file(spark, path: str):
    """Seed-list text scan (S1, crawl/Injector.java:84-129): url-per-line,
    '#' comments, tab-separated key=value metadata."""
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    lines = lines.filter((F.col("line") != "") & ~F.col("line").startswith("#"))
    parts = F.split(F.col("line"), "\t")
    kvs = F.filter(F.slice(parts, 2, 1000), lambda s: s.contains("="))
    # value = everything after the FIRST '=' (Injector.java splits once;
    # a limit-less split truncated 'k=a=b' to 'a'); duplicate keys are
    # last-wins like the reference's Map.put (map_from_arrays would THROW
    # on the first duplicate under the default EXCEPTION dedup policy,
    # killing the whole inject job on one bad seed line)
    empty = F.create_map().cast("map<string,string>")
    meta = F.aggregate(
        kvs, empty,
        lambda acc, s: F.map_concat(
            F.map_filter(acc, lambda k, _: k != F.split(s, "=", 2)[0]),
            F.create_map(F.split(s, "=", 2)[0], F.split(s, "=", 2)[1]),
        ),
    )
    return lines.select(
        F.element_at(parts, 1).alias("url"),
        meta.alias("metadata"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="table root (resumable state)")
    ap.add_argument("--seeds", help="seed list text file (Injector format)")
    ap.add_argument("--bench-corpus", action="store_true",
                    help="use the distributed synthetic web as the network")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--topn", type=int, default=10_000)
    ap.add_argument("--partitions", type=int, default=0,
                    help="fetch partitions (0 = default parallelism)")
    ap.add_argument("--threads", type=int, default=10, help="virtual fetcher threads")
    ap.add_argument("--hosts", type=int, default=200, help="bench corpus hosts")
    ap.add_argument("--pages", type=int, default=30, help="bench corpus pages/host")
    args = ap.parse_args()

    from nutch_spark.config import CrawlConfig
    from nutch_spark.plans.crawl_cycle import crawl
    from nutch_spark.session import get_spark

    spark = get_spark("nutch-spark-crawl")
    parts = args.partitions or spark.sparkContext.defaultParallelism
    cfg = CrawlConfig(num_partitions=parts, topn=args.topn,
                      fetcher_threads=args.threads)

    if args.bench_corpus:
        from nutch_spark.bench_corpus import bench_web_tables

        tables = bench_web_tables(spark, n_hosts=args.hosts,
                                  pages_per_host=args.pages, mega_factor=4,
                                  n_partitions=parts)
        # one seed per host, really: the seeds table is the full page
        # list ordered host-by-host, so a bare limit(hosts) seeded ~4
        # whole hosts instead of one page from each
        seeds = (tables["seeds"]
                 .filter(F.col("url").endswith("/page/0.html"))
                 .limit(args.hosts))
    else:
        from nutch_spark.corpus import SyntheticWeb

        tables = SyntheticWeb().to_spark(spark)
        seeds = parse_seed_file(spark, args.seeds) if args.seeds else tables["seeds"]

    results = crawl(
        spark, args.catalog, cfg, seeds,
        tables["web_graph"], tables["robots"], tables["raw_content"],
        depth=args.depth,
    )
    for r in results:
        print(json.dumps({
            "cycle": r.cycle, "generated": r.generated, "fetched": r.fetched,
            "parsed": r.parsed, "frontier": r.frontier_size,
            "new_urls": r.new_urls, "wall_s": round(r.wall_s, 2),
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

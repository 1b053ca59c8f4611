"""A/B: update_frontier materialization cost with links cached vs not.

Usage: python tools/probe_cache_links.py CORES
Checks that aggregate_signatures' union-branch pruning really keeps the
links subtree single-evaluated when the cache is off.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    import pyspark.sql.functions as F

    from nutch_spark.bench_corpus import bench_web_tables
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.fetch import run_fetch
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject
    from nutch_spark.operators.parse import run_parse
    from nutch_spark.operators.updatedb import update_frontier
    from nutch_spark.session import get_spark

    spark = get_spark("probe-cache-links", master=f"local[{cores}]",
                      shuffle_partitions=max(2 * cores, 16))
    cfg = CrawlConfig(num_partitions=32, topn=10_000_000, fetcher_threads=16,
                      fetch_duration_ms=10, fetcher_server_delay_ms=50,
                      gen_delay_ms=0)
    tables = bench_web_tables(spark, n_hosts=2000, pages_per_host=250,
                              mega_factor=2, n_partitions=32)
    for name in ("web_graph", "raw_content", "robots"):
        tables[name] = tables[name].cache()
        tables[name].count()
    cur = 1_700_000_000_000 + 24 * 3600 * 1000
    frontier = inject(None, tables["seeds"], cfg, 1_700_000_000_000).cache()
    frontier.count()
    fl = generate(frontier, cfg, cur).cache()
    fl.count()
    fetch_out = run_fetch(fl, tables["web_graph"], tables["robots"], cfg, 1, cur).cache()
    fetch_out.count()

    t = {}
    for label, cache_links in (("cached", True), ("uncached", False),
                               ("uncached2", False), ("cached2", True)):
        parsed = run_parse(fetch_out, tables["raw_content"], cfg,
                           cache_links=cache_links)
        parsed["documents"].write.format("noop").mode("overwrite").save()
        t0 = time.time()
        nf = update_frontier(frontier, fetch_out, parsed["parse_updates"], cfg,
                             cur, include_new_flag=True,
                             parse_meta=parsed.get("parse_meta"))
        nf.write.format("noop").mode("overwrite").save()
        t[label] = round(time.time() - t0, 2)
        parsed["docs_nested"].unpersist()
        parsed["links"].unpersist()
    print(json.dumps({"cores": cores, **t}))
    spark.stop()


if __name__ == "__main__":
    main()

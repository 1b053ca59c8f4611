"""Diagnostic: time A2/A3 (parse + updatedb + sketch) sub-stages.

Usage: python tools/probe_a3.py CORES
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
    from nutch_spark.operators.seen import build_seen_sketch, update_seen_sketch
    from nutch_spark.operators.updatedb import update_frontier
    from nutch_spark.session import get_spark

    spark = get_spark("probe-a3", master=f"local[{cores}]",
                      shuffle_partitions=max(2 * cores, 16))
    cfg = CrawlConfig(num_partitions=32, topn=10_000_000, fetcher_threads=16,
                      fetch_duration_ms=10, fetcher_server_delay_ms=50,
                      gen_delay_ms=0)
    tables = bench_web_tables(spark, n_hosts=4000, pages_per_host=250,
                              mega_factor=4, n_partitions=64)
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
    t0 = time.time()
    parsed = run_parse(fetch_out, tables["raw_content"], cfg)
    parsed["documents"].write.format("noop").mode("overwrite").save()
    t["A2_parse_documents_noop"] = time.time() - t0

    t0 = time.time()
    parsed["links"].count()  # materialize links cache
    t["links_cache"] = time.time() - t0

    t0 = time.time()
    parsed["parse_updates"].write.format("noop").mode("overwrite").save()
    t["parse_updates_noop"] = time.time() - t0

    from nutch_spark.operators.updatedb import aggregate_linked
    t0 = time.time()
    aggregate_linked(parsed["parse_updates"], cfg).write.format("noop").mode("overwrite").save()
    t["aggregate_linked_noop"] = time.time() - t0

    t0 = time.time()
    nf = update_frontier(frontier, fetch_out, parsed["parse_updates"], cfg, cur,
                         include_new_flag=True, parse_meta=parsed.get("parse_meta"))
    nf.write.format("noop").mode("overwrite").save()
    t["update_frontier_noop"] = time.time() - t0

    nf = nf.cache()
    t0 = time.time()
    nf.count()
    t["update_frontier_cache"] = time.time() - t0

    t0 = time.time()
    sk = build_seen_sketch(frontier, cfg).cache()
    sk.count()
    t["sketch_full_build"] = time.time() - t0

    t0 = time.time()
    sk2 = update_seen_sketch(sk, nf.filter(F.col("is_new")).select("url"), cfg)
    sk2.write.mode("overwrite").parquet("/tmp/probe_a3_sk")
    t["sketch_incr_update_write"] = time.time() - t0

    t0 = time.time()
    nf.drop("is_new").write.mode("overwrite").parquet("/tmp/probe_a3_nf")
    t["frontier_parquet_write"] = time.time() - t0

    print(json.dumps({"cores": cores,
                      **{k: round(v, 2) for k, v in t.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()

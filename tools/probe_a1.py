"""Diagnostic: time A1 (generate+fetch) sub-stages at a given core count.

Usage: python tools/probe_a1.py CORES
Prints wall seconds for: corpus cache, generate-only, fetch-no-kernel
(joins + robots expr), full fetch (kernel), parquet write, plus the
sum/max of per-partition kernel_wall_ms.
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
    from nutch_spark.session import get_spark

    spark = get_spark("probe-a1", master=f"local[{cores}]",
                      shuffle_partitions=max(2 * cores, 16))
    cfg = CrawlConfig(num_partitions=32, topn=10_000_000, fetcher_threads=16,
                      fetch_duration_ms=10, fetcher_server_delay_ms=50,
                      gen_delay_ms=0)
    tables = bench_web_tables(spark, n_hosts=4000, pages_per_host=250,
                              mega_factor=4, n_partitions=64)
    t = {}
    t0 = time.time()
    for name in ("web_graph", "raw_content", "robots"):
        tables[name] = tables[name].cache()
        tables[name].count()
    t["corpus_cache"] = time.time() - t0

    t0 = time.time()
    frontier = inject(None, tables["seeds"], cfg, 1_700_000_000_000).cache()
    n = frontier.count()
    t["inject_cache"] = time.time() - t0

    cur = 1_700_000_000_000 + 24 * 3600 * 1000
    t0 = time.time()
    fl = generate(frontier, cfg, cur)
    fl.write.format("noop").mode("overwrite").save()
    t["generate_noop"] = time.time() - t0

    fl = fl.cache()
    t0 = time.time()
    fl.count()
    t["generate_cache"] = time.time() - t0

    t0 = time.time()
    out = run_fetch(fl, tables["web_graph"], tables["robots"], cfg, 1, cur)
    out.write.format("noop").mode("overwrite").save()
    t["fetch_noop"] = time.time() - t0

    t0 = time.time()
    kw = out.groupBy("partition_id").agg(
        F.max("kernel_wall_ms").alias("kw"), F.count("*").alias("n")
    ).collect()
    t["fetch_noop2_kernelagg"] = time.time() - t0
    t["kernel_sum_s"] = sum(r["kw"] for r in kw) / 1000
    t["kernel_max_s"] = max(r["kw"] for r in kw) / 1000
    t["n_parts"] = len(kw)

    t0 = time.time()
    out.write.mode("overwrite").parquet("/tmp/probe_a1_out")
    t["fetch_parquet_write"] = time.time() - t0

    print(json.dumps({"cores": cores, "n_urls": n,
                      **{k: round(v, 2) for k, v in t.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()

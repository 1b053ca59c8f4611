"""A/B: links dedupe+cap as [partialAgg->xchg(url,to)->xchg(url)->window]
vs [xchg(url)->agg->sort->window] (one exchange, subset-key clustering).

Usage: python tools/probe_dedupe.py CORES
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from nutch_spark.bench_corpus import bench_web_tables
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.fetch import run_fetch
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject
    from nutch_spark.operators.parse import run_parse
    from nutch_spark.session import get_spark

    spark = get_spark("probe-dedupe", master=f"local[{cores}]",
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

    # filtered (pre-dedupe) links, cached so both variants share the input
    parsed = run_parse(fetch_out, tables["raw_content"], cfg, cache_links=False)
    # rebuild the pre-dedupe frame: run_parse has already deduped, so for a
    # pure A/B we reuse the cached post-filter stream via parse internals —
    # simplest faithful proxy: explode the links back out of parse_data is
    # wrong; instead re-run the pipeline up to the filter by calling
    # run_parse once and capturing links before dedupe is not exposed.
    # Proxy: use the deduped links as input rows (same key distribution).
    base = parsed["links"].select("url", "to_url", "offset", "anchor").cache()
    n = base.count()

    t = {}
    for label in ("two_xchg", "one_xchg", "one_xchg2", "two_xchg2"):
        t0 = time.time()
        if label.startswith("two"):
            d = base.groupBy("url", "to_url").agg(
                F.min("offset").alias("offset"),
                F.min_by("anchor", "offset").alias("anchor"))
            w = Window.partitionBy("url")
            out = (d.withColumn("r", F.row_number().over(w.orderBy("offset")))
                   .filter(F.col("r") <= cfg.db_max_outlinks_per_page)
                   .withColumn("n_out", F.count("*").over(w)))
        else:
            d = base.repartition("url").groupBy("url", "to_url").agg(
                F.min("offset").alias("offset"),
                F.min_by("anchor", "offset").alias("anchor"))
            w = Window.partitionBy("url")
            out = (d.withColumn("r", F.row_number().over(w.orderBy("offset")))
                   .filter(F.col("r") <= cfg.db_max_outlinks_per_page)
                   .withColumn("n_out", F.count("*").over(w)))
        out.write.format("noop").mode("overwrite").save()
        t[label] = round(time.time() - t0, 2)
    print(json.dumps({"cores": cores, "rows": n, **t}))
    spark.stop()


if __name__ == "__main__":
    main()

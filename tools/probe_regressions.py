"""ABBA probe for the r02->r03 bench regressions (VERDICT r3, What's-wrong #2).

BENCH_r02 -> BENCH_r03 showed inject_merge 1.36->3.28 s and
updatedb_transitions 0.75->3.29 s. Both gate queries are pure
derived_frontier DataFrame pipelines whose code did NOT change between the
rounds (git -L confirms), so the suspects are (a) session state in the
bench suite (they run right after the crawl job with cached corpus tables)
vs (b) host noise. This probe interleaves the two suspects with a
non-regressed control (generator_topn, 1.09->0.45 s across the same rounds)
in an A-B-C round-robin, 6 rounds after a warm-up, in BOTH a fresh session
and a session that first runs the bench crawl job — mimicking the suite.

Usage: python tools/probe_regressions.py [--with-crawl]
Prints one JSON line {query: [walls...]} plus medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "6"))


def main() -> None:
    from nutch_spark.entry_queries import QUERIES
    from nutch_spark.session import get_spark

    spark = get_spark("probe", master="local[32]", shuffle_partitions=64)

    if "--with-crawl" in sys.argv:
        # reproduce the suite's session state: crawl job first, cached tables
        import bench

        bench.run_crawl_throughput(spark, num_partitions=32)

    names = ["inject_merge", "updatedb_transitions", "generator_topn"]
    walls: dict[str, list[float]] = {n: [] for n in names}

    # warm-up (JVM/python-worker startup, parquet footer cache)
    for n in names:
        QUERIES[n][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for _ in range(ROUNDS):
        for n in names:
            t0 = time.time()
            QUERIES[n][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls[n].append(round(time.time() - t0, 3))

    out = {
        "sf_dir": SF_DIR,
        "with_crawl": "--with-crawl" in sys.argv,
        "walls": walls,
        "medians": {n: round(statistics.median(w), 3) for n, w in walls.items()},
        "r02_walls": {"inject_merge": 1.36, "updatedb_transitions": 0.75,
                      "generator_topn": 1.09},
        "r03_walls": {"inject_merge": 3.28, "updatedb_transitions": 3.29,
                      "generator_topn": 0.45},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Crawl loop driver: inject once, then generate->fetch->parse->updatedb
cycles with per-cycle checkpointing and resume.

Reference lifecycle: crawl/Crawl.java:60-161 (the depth loop). Each Hadoop
job boundary becomes a Spark action; each CrawlDb.install() rename-swap
becomes a SnapshotTable commit tagged `cycle-N` (Iceberg snapshot tags in
production). A killed run resumes from the last committed cycle: frontier,
seen sketch, lineage and metrics are all recoverable from the catalog —
north_rule's "resumable mid-cycle with per-partition lineage + metrics".
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.fetch import fetch_metrics, run_fetch
from nutch_spark.operators.generate import generate, mark_generated
from nutch_spark.operators.inject import inject
from nutch_spark.operators.parse import run_parse
from nutch_spark.operators.seen import (build_seen_sketch, sketch_if_current,
                                        update_seen_sketch)
from nutch_spark.operators.updatedb import update_frontier
from nutch_spark.storage import Catalog

# one virtual day per cycle keeps re-generate delays meaningful
CYCLE_VIRTUAL_MS = 24 * 3600 * 1000
T0_DEFAULT = 1_700_000_000_000


@dataclass
class CycleResult:
    cycle: int
    generated: int
    fetched: int
    parsed: int
    frontier_size: int
    new_urls: int
    wall_s: float


class CrawlDriver:
    def __init__(self, spark: SparkSession, catalog_root: str, cfg: CrawlConfig,
                 web_graph: DataFrame, robots: DataFrame, raw_content: DataFrame,
                 t0_ms: int = T0_DEFAULT,
                 resolver: DataFrame | None = None):
        self.spark = spark
        self.cfg = cfg
        self.cat = Catalog(catalog_root)
        self.web_graph = web_graph
        self.robots = robots
        self.raw_content = raw_content
        # (host, ip) table for the byIP partition/queue modes — without it
        # those modes FALL BACK to byHost inside generate()/run_fetch(), so
        # the driver must be able to inject one or the knobs are dead
        self.resolver = resolver
        self.t0_ms = t0_ms
        self.frontier_t = self.cat.table("frontier")
        self.metrics_t = self.cat.table("fetch_metrics")
        self.lineage_t = self.cat.table("lineage")
        self.sketch_t = self.cat.table("seen_sketch")
        self.documents_t = self.cat.table("documents")
        self.fetch_t = self.cat.table("fetch_status")

    # -- state -------------------------------------------------------------
    def last_completed_cycle(self) -> int:
        snap = self.frontier_t.latest()
        if snap is None or snap.tag is None:
            return -1 if snap is None else 0
        if snap.tag.startswith("cycle-"):
            return int(snap.tag.split("-")[1])
        return 0  # inject tag

    def _bucket_spec(self) -> tuple[str, int] | None:
        n = self.cfg.frontier_buckets
        return ("url", n) if n and n > 0 else None

    def frontier(self) -> DataFrame:
        # is_new is a cycle-internal column (rides each snapshot so the
        # sketch update can re-read it); consumers never see it
        return self.frontier_t.read(self.spark).drop("is_new")

    # -- stages ------------------------------------------------------------
    def bootstrap(self, seeds: DataFrame) -> int:
        """Inject seeds (idempotent: skipped if already committed)."""
        if self.frontier_t.exists():
            snap = self.frontier_t.latest()
            return snap.row_count if snap.row_count is not None else self.frontier().count()
        frontier = inject(None, seeds, self.cfg, self.t0_ms)
        obs = Observation()
        pending = self.frontier_t.prepare(
            frontier.observe(obs, F.count(F.lit(1)).alias("n")),
            tag="inject", bucket_by=self._bucket_spec())
        n = int(obs.get["n"])
        pending["row_count"] = n
        self.frontier_t.install(pending)
        # seed the seen sketch: the incremental per-cycle OR requires the
        # invariant sketch ⊇ frontier (bloom negatives short-circuit the
        # exact join, so the sketch must cover every frontier URL)
        self.sketch_t.commit(build_seen_sketch(self.frontier(), self.cfg), tag="inject")
        return n

    def run_cycle(self, cycle: int) -> CycleResult:
        """One generate->fetch->parse->updatedb cycle.

        Row counts for lineage ride along with the write actions via
        Observation instead of separate .count() passes — each stage
        materializes exactly once (7 actions/cycle instead of 11; driver
        barriers are the serial fraction the scaling criterion punishes).
        Independent actions overlap: A1 (fetch append) runs while the
        driver constructs the parse/updatedb plans, then A2 (documents
        commit), A3 (frontier write) and A5 (metrics collect) run
        concurrently — their job-submission/codegen/committer fixed costs
        coincide instead of summing, and on a real cluster the concurrent
        jobs fill executor slots a single job's tail stages leave idle.
        """
        t_start = time.time()
        _marks: list[tuple[str, float]] = []
        _spans: dict[str, float] = {}
        _trace = os.environ.get("BENCH_STAGE_TIMES")

        def _mark(label: str) -> None:
            if _trace:
                _marks.append((label, time.time()))

        def _timed(label: str, fn):
            # per-thread stage duration (wall inside the worker; stages in
            # one overlap group share the clock, so durations can sum past
            # the group's wall — that gap IS the overlap win)
            t = time.time()
            out = fn()
            _spans[label] = time.time() - t
            return out

        cfg = self.cfg
        cur = self.t0_ms + cycle * CYCLE_VIRTUAL_MS
        # NOT cached: the frontier is the highest-cardinality table in the
        # system (10^10 rows at target scale) — a columnar cache copy per
        # cycle is the one frame that can never fit. Every consumer
        # (generate, the urlmeta slice, the updatedb merge) scans the
        # immutable bucketed snapshot directly: pruned-column streaming
        # reads that keep HashPartitioning(url), so the cycle's peak cached
        # memory is O(topN + new URLs), independent of frontier size. The
        # size comes from the snapshot summary (writer-side Observation),
        # never a count() scan.
        frontier_snap = self.frontier_t.latest()
        frontier = self.frontier()
        frontier_n = (frontier_snap.row_count
                      if frontier_snap and frontier_snap.row_count is not None
                      else frontier.count())  # legacy snapshots only

        obs_gen, obs_fetch = Observation(), Observation()
        fetchlist = (
            generate(frontier, cfg, cur, resolver=self.resolver)
            .observe(obs_gen, F.count(F.lit(1)).alias("n"))
            .cache()
        )
        fetch_out = (
            run_fetch(fetchlist, self.web_graph, self.robots, cfg, cycle, cur,
                      resolver=self.resolver)
            .observe(obs_fetch, F.count(F.lit(1)).alias("n"))
            .cache()
        )
        # the append materializes fetchlist + fetch_out and yields all counts
        _mark("plan:gen+fetch")
        # A1 runs in a worker thread while the driver constructs the parse +
        # updatedb plans below: several seconds of pure py4j plan-building
        # that previously serialized after the fetch job now overlap it.
        # (Spark's scheduler accepts jobs from any thread; on a real cluster
        # concurrent jobs additionally fill executor slots a single job's
        # committer/tail stages leave idle.)
        pool = ThreadPoolExecutor(max_workers=3, thread_name_prefix=f"cycle{cycle}")
        try:
            fut_a1 = pool.submit(
                _timed, "A1:fetch_append",
                lambda: self.fetch_t.append(fetch_out, tag=f"cycle-{cycle}"))

            # cache_links=False: the cycle materializes links exactly once
            # (inside parse_updates -> update_frontier), so the cache write —
            # a full columnar copy of the highest-cardinality frame — is waste
            url_meta = None
            if cfg.urlmeta_tags:
                # urlmeta page-side slice: this cycle's fetching pages with
                # their configured tags (join keys on the bucketed frontier's
                # url — narrow projection, non-empty maps only)
                tags = list(cfg.urlmeta_tags)
                url_meta = (
                    frontier.select(
                        "url",
                        F.map_filter(
                            F.coalesce(F.col("metadata"),
                                       F.create_map().cast("map<string,string>")),
                            lambda k, _: k.isin(*tags),
                        ).alias("urlmeta"),
                    )
                    .filter(F.size(F.map_keys(F.col("urlmeta"))) > 0)
                )
            # fetcher.store.content=false AND fetcher.parse=false
            # (Fetcher.java:1065,1090): nothing stored content and nothing
            # parsed in-fetch, so the segment has no content for a parse pass —
            # the parse stage sees zero rows (status transitions still flow
            # from fetch_out through updatedb).
            parse_in = (fetch_out if cfg.fetcher_store_content or cfg.fetcher_parse
                        else fetch_out.limit(0))
            parsed = run_parse(parse_in, self.raw_content, cfg, cache_links=False,
                               url_meta=url_meta)
            obs_docs = Observation()
            docs_df = parsed["documents"].observe(obs_docs, F.count(F.lit(1)).alias("n"))

            # generate.update.crawldb (Generator.java:582-612): stamp _ngt_ on
            # the generated rows BEFORE the merge so rows the fetch pass never
            # produced output for (timelimit / throughput-kill purges) stay
            # protected by crawl.gen.delay next cycle. Fetched rows shed the
            # stamp in the merge (CrawlDbReducer.java:293). The left join keys
            # on url, so the bucketed frontier side still shows no Exchange —
            # only the topN-bounded fetchlist side shuffles.
            merge_frontier = (mark_generated(frontier, fetchlist, cur)
                              if cfg.gen_update_crawldb else frontier)
            new_frontier = update_frontier(
                merge_frontier, fetch_out, parsed["parse_updates"], cfg, cur,
                include_new_flag=True, parse_meta=parsed.get("parse_meta"))

            # Phase-1 frontier write (prepare, not install): the bucketed
            # snapshot write IS the single materialization of the updatedb
            # merge. The previous shape cached the merged frontier — a full
            # columnar copy of the highest-cardinality table per cycle (at
            # 10^10 rows, the worst possible frame to duplicate) — then
            # re-scanned the cache for the final write. `is_new` rides into
            # the snapshot (an RLE-compressed boolean, ~free in parquet) so
            # the sketch update below reads it back with a pushed filter;
            # frontier() drops it for every other consumer. The pointer
            # install — the cycle-completeness marker resume keys on — stays
            # the LAST step of the cycle (A6), exactly as before.
            obs_front = Observation()
            front_df = new_frontier.observe(obs_front, F.count(F.lit(1)).alias("n"))

            # all plans for the cycle are built; join A1 (counts become safe to
            # read), then run the three independent actions CONCURRENTLY:
            #   A2 documents commit   (reads fetch_out cache + parse kernel)
            #   A3 frontier write     (updatedb merge -> bucketed snapshot)
            #   A5 metrics collect    (~1 row/partition over the fetch_out cache)
            # A2 and A3 share the parse kernel through the docs_nested cache
            # (block-level locks make the second job wait per partition, not
            # recompute). Their fixed costs — job submission, codegen compile,
            # output-committer passes — are driver/tail-serial and previously
            # summed; overlapped they largely coincide. Crash semantics are
            # unchanged: every one of these precedes the A6 pointer install
            # that marks the cycle complete, exactly as in the serial order.
            fut_a1.result()
            _mark("plan:parse+updatedb(overlaps A1)")
            n_gen = int(obs_gen.get["n"])
            n_fetch = int(obs_fetch.get["n"])

            def _docs_commit() -> int:
                self.documents_t.commit(docs_df, tag=f"cycle-{cycle}")
                return int(obs_docs.get["n"])

            def _frontier_write() -> dict:
                p = self.frontier_t.prepare(front_df, tag=f"cycle-{cycle}",
                                            bucket_by=self._bucket_spec())
                # snapshot summary: next cycle's frontier_n
                p["row_count"] = int(obs_front.get["n"])
                return p

            def _metrics() -> list[dict]:
                return [r.asDict()
                        for r in fetch_metrics(fetch_out, cycle, cur).collect()]

            fut_docs = pool.submit(_timed, "A2:documents_commit", _docs_commit)
            fut_front = pool.submit(_timed, "A3:frontier_write", _frontier_write)
            fut_met = pool.submit(_timed, "A5:metrics_collect", _metrics)
            n_parsed = fut_docs.result()
            pending = fut_front.result()
            met_rows = fut_met.result()
            new_n = pending["row_count"]
            _mark("A2+A3+A5:overlap_group")

            # seen sketch updated INCREMENTALLY: only this cycle's new URLs are
            # OR'd into the previous cycle's bitmaps (O(new) per cycle, not
            # O(frontier) — at 10^10 frontier URLs the full rebuild was a
            # per-cycle scan of the whole crawl history). Source = the pending
            # snapshot's files, column-pruned to (url, is_new) with the filter
            # pushed to the scan. Crash windows are safe: redo before install
            # overwrites the same snapshot dir; a sketch committed for a cycle
            # whose install never happened is a superset of the frontier
            # (bloom OR is idempotent), same as the previous ordering.
            committed = self.frontier_t.read_pending(self.spark, pending)
            prev_sketch = sketch_if_current(
                self.sketch_t.read(self.spark) if self.sketch_t.exists() else None,
                cfg)
            if prev_sketch is not None:
                new_sketch = update_seen_sketch(
                    prev_sketch,
                    committed.filter(F.col("is_new")).select("url"),
                    cfg,
                )
            else:  # no/legacy sketch: restore the ⊇-frontier invariant
                new_sketch = build_seen_sketch(committed, cfg)
            self.sketch_t.commit(new_sketch, tag=f"cycle-{cycle}")
            _mark("A4:sketch_commit")

            # metrics + lineage (north_rule: per-partition rows). The metrics
            # aggregate (A5, collected in the overlap group above — ~1 row per
            # partition over the cached fetch output) lands via a driver-side
            # pyarrow write — one Spark job instead of two write jobs + two
            # serial output-committer passes per cycle.
            if met_rows:
                self.metrics_t.append_rows(met_rows, tag=f"cycle-{cycle}")
            self.lineage_t.append_rows(
                [
                    {"cycle": cycle, "stage": s, "rows_in": ri, "rows_out": ro}
                    for s, ri, ro in (
                        ("generate", frontier_n, n_gen),
                        ("fetch", n_gen, n_fetch),
                        ("parse", n_fetch, n_parsed),
                        ("updatedb", frontier_n + n_fetch, new_n),
                    )
                ],
                tag=f"cycle-{cycle}",
            )

            _mark("A5b:log_appends")
            # atomic install — THE pointer swap that marks the cycle complete.
            # Bucketed by url: next cycle's scan reports HashPartitioning(url),
            # so updatedb's merge shuffles only the topN-bounded updates side —
            # never the 10^10-row frontier. The data files were written in A3
            # (already hash-placed on url: one bucket-tagged file per task, no
            # exchange); this step is a driver-side JSON rename, no Spark job.
            self.frontier_t.install(pending)
            _mark("A6:frontier_install")

            # snapshot GC (CrawlDb.install old-dir rotation / Iceberg
            # expire_snapshots analogue): state tables only — at 10^10 rows
            # every retained frontier snapshot is a full copy of the crawl
            # state, so unbounded retention is itself a scale bug. Runs AFTER
            # install so a crash mid-expire still leaves the committed cycle
            # intact; keep >= 2 preserves current + old like the reference.
            if cfg.snapshot_keep > 0:
                self.frontier_t.expire_snapshots(cfg.snapshot_keep, self.spark)
                self.sketch_t.expire_snapshots(cfg.snapshot_keep, self.spark)

            fetchlist.unpersist()
            fetch_out.unpersist()
            parsed["docs_nested"].unpersist()
            parsed["links"].unpersist()
            if _trace:
                prev = t_start
                spans = []
                for label, ts in _marks:
                    spans.append(f"{label}={ts - prev:.2f}s")
                    prev = ts
                spans += [f"{k}={v:.2f}s(thread)" for k, v in _spans.items()]
                print(f"[cycle {cycle} stages] " + " ".join(spans), flush=True)
            return CycleResult(
                cycle=cycle, generated=n_gen, fetched=n_fetch, parsed=n_parsed,
                frontier_size=new_n, new_urls=new_n - frontier_n,
                wall_s=time.time() - t_start,
            )
        finally:
            # an error anywhere above lets in-flight worker actions
            # FINISH before it propagates: a crawl() redo never races
            # an orphaned append/prepare on the same snapshot log/dir
            # (the pointer-swap log is single-writer-per-table by
            # design, not lock-protected)
            pool.shutdown(wait=True)


def crawl(spark: SparkSession, catalog_root: str, cfg: CrawlConfig,
          seeds: DataFrame, web_graph: DataFrame, robots: DataFrame,
          raw_content: DataFrame, depth: int, t0_ms: int = T0_DEFAULT) -> list[CycleResult]:
    """Run (or resume) a depth-cycle crawl. Safe to re-invoke after a kill:
    completed cycles are skipped via snapshot tags."""
    drv = CrawlDriver(spark, catalog_root, cfg, web_graph, robots, raw_content, t0_ms)
    drv.bootstrap(seeds)
    done = drv.last_completed_cycle()
    results = []
    for cycle in range(done + 1, depth + 1):
        results.append(drv.run_cycle(cycle))
    return results

"""Fetch stage: per-partition politeness scheduler over the simulated web.

The reference's Fetcher is one long-running map task per fetchlist partition
with per-host FIFO queues, N worker threads, and a politeness clock
(fetcher/Fetcher.java:306-573):

- queue id = host (fetcher.queue.mode=byHost), maxThreads per queue = 1,
- an item is eligible only if its queue has no fetch in progress and
  now >= nextFetchTime (Fetcher.java:360-373),
- after a fetch finishes at endTime: nextFetchTime = endTime + crawlDelay
  (Fetcher.java:389-398); robots Crawl-Delay overrides the default delay and
  > fetcher.max.crawl.delay marks the URL gone (Fetcher.java:794-806),
- robots-disallowed -> denied (Fetcher.java:783-793),
- >= fetcher.max.exceptions.per.queue errors -> purge the host queue
  (Fetcher.java:542-562),
- redirects: with http.redirect.max=0 (the 1.6 default) targets are emitted
  as linked rows for the next cycle (Fetcher.java:963-1024).

Here the "network" is the deterministic web_graph corpus, so fetching is a
pure function and the politeness clock is a *virtual* clock simulated inside
one `mapInPandas` kernel per partition. Politeness is guaranteed structurally:
the fetchlist is hash-partitioned by host (crawl/URLPartitioner.java:36-93),
so a host never appears in two partitions, and within the partition the
kernel enforces the queue discipline. Determinism: same input partition ->
same virtual schedule -> same fetch order, at ANY core count (this is what
makes the N-vs-4N scaling run produce identical output).
"""

from __future__ import annotations

from collections import OrderedDict, deque
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.corpus import page_signature

FETCH_OUT_SCHEMA = T.StructType(
    list(schemas.FETCH_SCHEMA.fields)
    + [T.StructField("redirect_to", T.StringType(), True),
       T.StructField("redirect_temp", T.BooleanType(), True)]
)


def _robots_allowed(path: str, disallow: list[str] | None, allow: list[str] | None) -> bool:
    """Longest-prefix-match rules (lib-http RobotRulesParser.java:152-190)."""
    best_len, best_allow = -1, True
    for p in allow or []:
        if p and path.startswith(p) and len(p) > best_len:
            best_len, best_allow = len(p), True
    for p in disallow or []:
        if p and path.startswith(p) and len(p) > best_len:
            best_len, best_allow = len(p), False
    return best_allow


def _url_path(url: str) -> str:
    i = url.find("://")
    j = url.find("/", i + 3) if i >= 0 else -1
    return url[j:] if j >= 0 else "/"


class _HostQueue:
    __slots__ = ("items", "next_fetch_time", "busy_until", "exceptions", "crawl_delay")

    def __init__(self, crawl_delay: int, start: int):
        self.items: deque = deque()
        self.next_fetch_time = start  # ready immediately (FetchItemQueue ctor)
        self.busy_until = start
        self.exceptions = 0
        self.crawl_delay = crawl_delay


def fetch_partition_kernel(cfg: CrawlConfig, cycle: int, start_ms: int):
    """Build the mapInPandas kernel closure (pure; all state per-call)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1

        # per-host FIFO queues in fetchlist (sort_hash) order
        queues: "OrderedDict[str, _HostQueue]" = OrderedDict()
        for idx in range(len(pdf)):
            host = pdf["host"].iat[idx]
            q = queues.get(host)
            if q is None:
                delay_s = pdf["crawl_delay"].iat[idx]
                delay_ms = (
                    int(float(delay_s) * 1000)
                    if delay_s == delay_s and delay_s is not None
                    else cfg.fetcher_server_delay_ms
                )
                q = _HostQueue(delay_ms, start_ms)
                queues[host] = q
            q.items.append(idx)

        threads = [start_ms] * max(1, cfg.fetcher_threads)
        duration = cfg.fetch_duration_ms
        out_rows: list[dict] = []
        seq = 0
        deadline = start_ms + cfg.fetcher_timelimit_ms if cfg.fetcher_timelimit_ms > 0 else None

        def emit(idx: int, status: int, ts: int, sig: str | None, trunc: bool,
                 redir_to: str | None = None, redir_temp: bool | None = None):
            nonlocal seq
            out_rows.append(
                {
                    "url": pdf["url"].iat[idx],
                    "host": pdf["host"].iat[idx],
                    "fetch_status": status,
                    "fetch_ts": ts,
                    "seq": seq,
                    "repr_url": None,
                    "signature": sig,
                    "content_length": int(pdf["content_length"].iat[idx]) if pdf["content_length"].iat[idx] == pdf["content_length"].iat[idx] else None,
                    "truncated": trunc,
                    "score": float(pdf["score"].iat[idx]),
                    "fetch_interval": int(pdf["fetch_interval"].iat[idx]),
                    "retries": int(pdf["retries"].iat[idx]),
                    "partition_id": pid,
                    "redirect_to": redir_to,
                    "redirect_temp": redir_temp,
                }
            )
            seq += 1

        remaining = len(pdf)
        while remaining > 0:
            # thread with the earliest free time picks next
            ti = min(range(len(threads)), key=threads.__getitem__)
            now = threads[ti]
            if deadline is not None and now >= deadline:
                break  # timelimit: drop remaining items (R8); they stay due
            # first eligible queue in insertion order (FetchItemQueues.getFetchItem)
            picked = None
            earliest_ready = None
            for host, q in queues.items():
                if not q.items:
                    continue
                ready = max(q.next_fetch_time, q.busy_until)
                if ready <= now:
                    picked = (host, q)
                    break
                if earliest_ready is None or ready < earliest_ready:
                    earliest_ready = ready
            if picked is None:
                # no queue eligible: advance this thread's clock
                threads[ti] = earliest_ready if earliest_ready is not None else now + duration
                continue

            host, q = picked
            idx = q.items.popleft()
            remaining -= 1

            # gates evaluated at fetch time
            delay_s = pdf["crawl_delay"].iat[idx]
            robots_delay_ms = int(float(delay_s) * 1000) if delay_s == delay_s and delay_s is not None else None
            if robots_delay_ms is not None and robots_delay_ms > cfg.fetcher_max_crawl_delay_ms:
                # Crawl-Delay too long -> gone, queue untouched (Fetcher.java:794-801)
                emit(idx, schemas.STATUS_FETCH_GONE, now, None, False)
                continue
            if not bool(pdf["robots_allowed"].iat[idx]):
                emit(idx, schemas.STATUS_FETCH_GONE, now, None, False)  # robots denied
                continue

            # perform the (simulated) fetch: occupies the thread + queue
            end = now + duration
            threads[ti] = end
            q.busy_until = end
            q.next_fetch_time = end + q.crawl_delay  # setEndTime (Fetcher.java:389-398)

            pstat = pdf["page_status"].iat[idx]
            if pstat is None or pstat != pstat:  # not in web_graph -> notfound
                emit(idx, schemas.STATUS_FETCH_GONE, now, None, False)
            elif pstat == "ok":
                sig = page_signature(int(pdf["signature_seed"].iat[idx]))
                trunc = bool(pdf["declared_length"].iat[idx] > pdf["content_length"].iat[idx])
                emit(idx, schemas.STATUS_FETCH_SUCCESS, now, sig, trunc)
            elif pstat in ("redir_perm", "redir_temp"):
                status = (
                    schemas.STATUS_FETCH_REDIR_PERM
                    if pstat == "redir_perm"
                    else schemas.STATUS_FETCH_REDIR_TEMP
                )
                emit(idx, status, now, None, False,
                     redir_to=pdf["redirect_to"].iat[idx], redir_temp=pstat == "redir_temp")
            elif pstat == "notmodified":
                emit(idx, schemas.STATUS_FETCH_NOTMODIFIED, now, None, False)
            elif pstat == "gone":
                emit(idx, schemas.STATUS_FETCH_GONE, now, None, False)
            else:  # exception -> retry + per-queue purge (Fetcher.java:542-562)
                emit(idx, schemas.STATUS_FETCH_RETRY, now, None, False)
                q.exceptions += 1
                if (
                    cfg.fetcher_max_exceptions_per_queue >= 0
                    and q.exceptions >= cfg.fetcher_max_exceptions_per_queue
                ):
                    remaining -= len(q.items)
                    q.items.clear()

        if out_rows:
            yield pd.DataFrame(out_rows)

    return kernel


def run_fetch(
    fetchlist: DataFrame,
    web_graph: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
    cycle: int,
    start_ms: int,
) -> DataFrame:
    """Join the fetchlist with the simulated web + robots, then run the
    politeness kernel per host-partition.

    Scale notes: robots is per-host (small) -> broadcast. web_graph at 100 TB
    is the content store; the join is an equi-join on url that AQE handles
    (fetchlist is topN-bounded per cycle, so it broadcasts in practice).
    """
    wg = web_graph.select(
        F.col("url"),
        F.col("status").alias("page_status"),
        "redirect_to",
        "content_length",
        "declared_length",
        "signature_seed",
    )
    rb = robots.groupBy("host").agg(
        F.first("crawl_delay", ignorenulls=True).alias("crawl_delay"),
        F.flatten(F.collect_list("disallow")).alias("rb_disallow"),
        F.flatten(F.collect_list("allow")).alias("rb_allow"),
    )
    fl = (
        fetchlist.join(wg, "url", "left")
        .join(F.broadcast(rb), "host", "left")
    )
    # robots prefix gate as a native expression (F12): longest-rule match
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    best_dis = F.array_max(
        F.transform(
            F.coalesce(F.col("rb_disallow"), F.array().cast("array<string>")),
            lambda p: F.when(F.startswith(path, p), F.length(p)).otherwise(F.lit(-1)),
        )
    )
    best_alw = F.array_max(
        F.transform(
            F.coalesce(F.col("rb_allow"), F.array().cast("array<string>")),
            lambda p: F.when(F.startswith(path, p), F.length(p)).otherwise(F.lit(-1)),
        )
    )
    fl = fl.withColumn(
        "robots_allowed",
        F.coalesce(best_alw, F.lit(-1)) >= F.coalesce(best_dis, F.lit(-1)),
    )

    # politeness placement: one host -> one partition, spread by sort_hash (P1/P3/P4)
    fl = fl.repartition(cfg.num_partitions, F.col("partition_id")).sortWithinPartitions(
        "sort_hash", "url"
    )
    kernel = fetch_partition_kernel(cfg, cycle, start_ms)
    return fl.mapInPandas(kernel, schema=FETCH_OUT_SCHEMA)


def fetch_metrics(fetch_out: DataFrame, cycle: int, start_ms: int) -> DataFrame:
    """Per-partition lineage/metrics rows (north_rule; Fetcher.java:1244-1265)."""
    return fetch_out.groupBy("partition_id").agg(
        F.lit(cycle).alias("cycle"),
        F.countDistinct("host").cast("int").alias("hosts"),
        F.count("*").alias("rows_in"),
        F.count("*").alias("rows_out"),
        (F.max("fetch_ts") - F.lit(start_ms)).alias("virtual_ms"),
        F.lit(0).cast("long").alias("wall_ms"),
    ).select("cycle", "partition_id", "hosts", "rows_in", "rows_out", "virtual_ms", "wall_ms")

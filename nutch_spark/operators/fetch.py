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

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.corpus import page_signature
from nutch_spark.functions.urls import choose_repr_url

FETCH_OUT_SCHEMA = T.StructType(
    list(schemas.FETCH_SCHEMA.fields)
    + [T.StructField("redirect_to", T.StringType(), True),
       T.StructField("redirect_temp", T.BooleanType(), True),
       T.StructField("kernel_wall_ms", T.LongType(), True)]
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


def fetch_partition_kernel(cfg: CrawlConfig, cycle: int, start_ms: int):
    """Build the mapInPandas kernel closure (pure; all state per-call).

    Vectorized design: every per-row predicate (robots gate, crawl-delay
    gate, page-status class) is a numpy array computed once per batch; the
    sequential politeness loop touches only integers + two int heaps, and
    the output frame is assembled by vectorized gathers in fetch order. The
    scheduler's selection rule is IDENTICAL to the reference's linear scan
    (FetchItemQueues.getFetchItem: first eligible queue in insertion order):
    `eligible` is a heap of insertion indices (pd.factorize codes are
    first-appearance-ordered), `pending` a heap of (ready_ms, idx); a queue
    moves pending->eligible when the virtual clock passes its ready time.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        t_kernel = _time.monotonic()
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        n = len(pdf)

        # ---- vectorized per-row facts -----------------------------------
        # null hosts (parse_url can null out hosts urlsplit accepted) get
        # their own '' queue — factorize's -1 sentinel would otherwise file
        # them into the LAST host's queue (and crash on all-null partitions);
        # '' is also what the output row carries (host is non-null in
        # FETCH_SCHEMA: the queue identity IS the emitted host)
        host_filled = pdf["host"].fillna("")
        host_codes, hosts_u = pd.factorize(host_filled)  # codes = insertion order
        crawl_delay_s = pdf["crawl_delay"].to_numpy(dtype=float)
        robots_delay_ms = crawl_delay_s * 1000.0  # NaN stays NaN
        too_long = (~np.isnan(robots_delay_ms)) & (
            robots_delay_ms > cfg.fetcher_max_crawl_delay_ms
        )
        denied = ~pdf["robots_allowed"].fillna(False).to_numpy(dtype=bool)
        gated = too_long | denied  # emitted GONE without occupying the queue

        pstat = pdf["page_status"].to_numpy(dtype=object)
        is_missing = pd.isna(pdf["page_status"]).to_numpy()
        is_ok = pstat == "ok"
        is_rp = pstat == "redir_perm"
        is_rt = pstat == "redir_temp"
        is_nm = pstat == "notmodified"
        is_gn = pstat == "gone"
        is_exc = ~(is_ok | is_rp | is_rt | is_nm | is_gn | is_missing)

        # ---- per-host FIFO queues in fetchlist (sort_hash) order --------
        nq = len(hosts_u)
        q_items: list[list[int]] = [[] for _ in range(nq)]
        for i, hc in enumerate(host_codes):
            q_items[hc].append(i)
        q_head = [0] * nq
        q_len = [len(items) for items in q_items]
        # crawl delay fixed at queue creation from its first row
        # (Fetcher.java FetchItemQueue ctor semantics)
        first_rows = [items[0] for items in q_items]
        fr_delay = robots_delay_ms[first_rows]
        q_delay = np.where(
            np.isnan(fr_delay), float(cfg.fetcher_server_delay_ms), fr_delay
        ).astype(np.int64)
        q_exc = [0] * nq
        max_exc = cfg.fetcher_max_exceptions_per_queue

        threads_heap = [(start_ms, ti) for ti in range(max(1, cfg.fetcher_threads))]
        duration = cfg.fetch_duration_ms
        deadline = start_ms + cfg.fetcher_timelimit_ms if cfg.fetcher_timelimit_ms > 0 else None

        eligible = list(range(nq))  # already a valid heap (sorted)
        pending: list[tuple[int, int]] = []  # (ready_ms, queue_idx)

        emit_rows = np.empty(n, dtype=np.int64)
        emit_ts = np.empty(n, dtype=np.int64)
        m = 0
        remaining = n

        while remaining > 0:
            now, ti = threads_heap[0]  # thread with the earliest free time
            if deadline is not None and now >= deadline:
                break  # timelimit: drop remaining items (R8); they stay due
            while pending and pending[0][0] <= now:
                _, qi = heapq.heappop(pending)
                if q_head[qi] < q_len[qi]:
                    heapq.heappush(eligible, qi)
            qpick = -1
            while eligible:
                qi = heapq.heappop(eligible)
                if q_head[qi] < q_len[qi]:
                    qpick = qi
                    break
            if qpick < 0:
                # no queue eligible: advance this thread's clock
                while pending and q_head[pending[0][1]] >= q_len[pending[0][1]]:
                    heapq.heappop(pending)
                nxt = pending[0][0] if pending else now + duration
                heapq.heapreplace(threads_heap, (nxt, ti))
                continue

            i = q_items[qpick][q_head[qpick]]
            q_head[qpick] += 1
            remaining -= 1
            emit_rows[m] = i
            emit_ts[m] = now
            m += 1

            if gated[i]:
                # Crawl-Delay too long or robots denied -> GONE, no fetch,
                # queue untouched (Fetcher.java:783-801)
                if q_head[qpick] < q_len[qpick]:
                    heapq.heappush(eligible, qpick)
                continue

            # the (simulated) fetch occupies the thread + queue; afterwards
            # nextFetchTime = endTime + crawlDelay (Fetcher.java:389-398)
            end = now + duration
            heapq.heapreplace(threads_heap, (end, ti))
            if is_exc[i]:  # exception -> per-queue purge (Fetcher.java:542-562)
                q_exc[qpick] += 1
                if max_exc >= 0 and q_exc[qpick] >= max_exc:
                    remaining -= q_len[qpick] - q_head[qpick]
                    q_head[qpick] = q_len[qpick]
            if q_head[qpick] < q_len[qpick]:
                heapq.heappush(pending, (end + int(q_delay[qpick]), qpick))

        if m == 0:
            return

        # ---- vectorized output assembly in fetch order ------------------
        sel = emit_rows[:m]
        g = gated[sel]
        status = np.select(
            [g, is_missing[sel], is_ok[sel], is_rp[sel], is_rt[sel],
             is_nm[sel], is_gn[sel]],
            [schemas.STATUS_FETCH_GONE, schemas.STATUS_FETCH_GONE,
             schemas.STATUS_FETCH_SUCCESS, schemas.STATUS_FETCH_REDIR_PERM,
             schemas.STATUS_FETCH_REDIR_TEMP, schemas.STATUS_FETCH_NOTMODIFIED,
             schemas.STATUS_FETCH_GONE],
            default=schemas.STATUS_FETCH_RETRY,
        ).astype(np.int64)

        ok_mask = is_ok[sel] & ~g
        sig = np.full(m, None, dtype=object)
        seeds = pdf["signature_seed"].to_numpy()[sel]
        sig[ok_mask] = [page_signature(int(s)) for s in seeds[ok_mask]]

        declared = pdf["declared_length"].to_numpy(dtype=float)[sel]
        content_len = pdf["content_length"].to_numpy(dtype=float)[sel]
        with np.errstate(invalid="ignore"):
            trunc = ok_mask & (declared > content_len)

        redir_mask = (is_rp[sel] | is_rt[sel]) & ~g
        redirect_to = np.full(m, None, dtype=object)
        redirect_to[redir_mask] = pdf["redirect_to"].to_numpy(dtype=object)[sel][redir_mask]
        redirect_temp = np.full(m, None, dtype=object)
        redirect_temp[redir_mask] = is_rt[sel][redir_mask]

        # repr-URL on redirects (C4/R5): chooseRepr(src, dst, temp) decides
        # the canonical identity of the redirect target
        # (util/URLUtil.java:343-449, Fetcher.java:963-1024). Python loop
        # touches redirect rows only (a small fraction of any fetch batch).
        urls_sel = pdf["url"].to_numpy(dtype=object)[sel]
        repr_arr = np.full(m, None, dtype=object)
        for j in np.nonzero(redir_mask)[0]:
            if redirect_to[j] is not None:
                repr_arr[j] = choose_repr_url(
                    urls_sel[j], redirect_to[j], bool(redirect_temp[j])
                )

        cl_obj = np.full(m, None, dtype=object)
        cl_ok = ~np.isnan(content_len)
        cl_obj[cl_ok] = content_len[cl_ok].astype(np.int64)

        out = pd.DataFrame(
            {
                "url": urls_sel,
                "host": host_filled.to_numpy(dtype=object)[sel],
                "fetch_status": status,
                "fetch_ts": emit_ts[:m],
                "seq": np.arange(m, dtype=np.int64),
                "repr_url": repr_arr,
                "signature": sig,
                "content_length": cl_obj,
                "truncated": trunc,
                "score": pdf["score"].to_numpy(dtype=float)[sel],
                "fetch_interval": pdf["fetch_interval"].to_numpy()[sel],
                "retries": pdf["retries"].to_numpy()[sel],
                "partition_id": np.full(m, pid, dtype=np.int64),
                "redirect_to": redirect_to,
                "redirect_temp": redirect_temp,
                # real per-partition kernel wall (north_rule: per-partition
                # metrics; constant within the partition)
                "kernel_wall_ms": np.full(
                    m, int((_time.monotonic() - t_kernel) * 1000), dtype=np.int64
                ),
            }
        )
        yield out

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

    # politeness placement: one host -> one partition, spread by sort_hash
    # (P1/P3/P4). Repartition on the HIGH-CARDINALITY host, not on the
    # logical partition_id: hashing a 0..n-1 id into n buckets collides
    # (measured: 18/32 buckets filled, 2x skew) while hash(host) balances;
    # the politeness invariant (one host -> one physical partition) holds
    # either way.
    fl = fl.repartition(cfg.num_partitions, F.col("host")).sortWithinPartitions(
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
        F.coalesce(F.max("kernel_wall_ms"), F.lit(0)).cast("long").alias("wall_ms"),
    ).select("cycle", "partition_id", "hosts", "rows_in", "rows_out", "virtual_ms", "wall_ms")

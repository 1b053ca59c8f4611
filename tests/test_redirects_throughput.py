"""R5 in-thread redirect following + R8 throughput kill-switch
(Fetcher.java:826-942 redirect do-loop; :1330-1386 monitor kill)."""

import pytest
from pyspark.sql import functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.functions.urls import choose_repr_url, host_col
from nutch_spark.operators.fetch import run_fetch

T0 = 1_700_000_000_000


def _wg(spark, rows):
    """rows: (url, host, status, redirect_to)"""
    data = [
        {
            "url": u, "host": h, "status": s, "redirect_to": r,
            "outlinks": [], "content_length": 100, "declared_length": 100,
            "signature_seed": i,
        }
        for i, (u, h, s, r) in enumerate(rows)
    ]
    return spark.createDataFrame(data, schema=schemas.WEB_GRAPH_SCHEMA)


def _robots(spark, rows=None):
    return spark.createDataFrame(rows or [], schema=schemas.ROBOTS_SCHEMA)


def _fetchlist(spark, urls):
    return (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .withColumn("host", host_col(F.col("url")))
        .withColumn("score", F.lit(1.0).cast("float"))
        .withColumn("fetch_interval", F.lit(2592000))
        .withColumn("retries", F.lit(0))
        .withColumn("sort_hash", F.lit(0))
    )


def test_redirect_followed_in_thread_same_host(spark):
    """The same thread fetches the target immediately (reference marks it
    in-progress and loops), and a LATER fetch of that host waits out the
    hop's politeness window."""
    cfg = CrawlConfig(num_partitions=1, fetcher_threads=2, http_redirect_max=2)
    wg = _wg(spark, [
        ("http://a-sim.com/p1.html", "a-sim.com", "redir_perm", "http://a-sim.com/p2.html"),
        ("http://a-sim.com/p2.html", "a-sim.com", "ok", None),
        ("http://a-sim.com/p3.html", "a-sim.com", "ok", None),
    ])
    fl = _fetchlist(spark, ["http://a-sim.com/p1.html", "http://a-sim.com/p3.html"])
    out = {r.url: r for r in run_fetch(fl, wg, _robots(spark), cfg, 1, T0).collect()}
    assert len(out) == 3
    p1 = out["http://a-sim.com/p1.html"]
    p2 = out["http://a-sim.com/p2.html"]
    p3 = out["http://a-sim.com/p3.html"]
    assert p1.fetch_status == schemas.STATUS_FETCH_REDIR_PERM
    assert p2.fetch_status == schemas.STATUS_FETCH_SUCCESS
    # hop fetched by the same thread right after the source fetch
    assert p2.fetch_ts - T0 == cfg.fetch_duration_ms
    # accumulated repr-URL on the followed target
    assert p2.repr_url == choose_repr_url(
        "http://a-sim.com/p1.html", "http://a-sim.com/p2.html", False
    )
    # p3 (same host) respects the clock pushed out by the HOP fetch:
    # hop ends at 2*duration, + server delay
    assert p3.fetch_ts - T0 == 2 * cfg.fetch_duration_ms + cfg.fetcher_server_delay_ms
    assert p1.seq < p2.seq < p3.seq


def test_redirect_max_exceeded_gone(spark):
    """count > http.redirect.max emits GONE for the unfetched target
    (Fetcher.java:934-941 STATUS_REDIR_EXCEEDED)."""
    cfg = CrawlConfig(num_partitions=1, fetcher_threads=1, http_redirect_max=2)
    c = [f"http://c-sim.com/c{k}.html" for k in range(4)]
    wg = _wg(spark, [
        (c[0], "c-sim.com", "redir_perm", c[1]),
        (c[1], "c-sim.com", "redir_temp", c[2]),
        (c[2], "c-sim.com", "redir_perm", c[3]),
        (c[3], "c-sim.com", "ok", None),
    ])
    out = {r.url: r for r in run_fetch(
        _fetchlist(spark, [c[0]]), wg, _robots(spark), cfg, 1, T0).collect()}
    assert len(out) == 4
    assert out[c[0]].fetch_status == schemas.STATUS_FETCH_REDIR_PERM
    assert out[c[1]].fetch_status == schemas.STATUS_FETCH_REDIR_TEMP
    assert out[c[2]].fetch_status == schemas.STATUS_FETCH_REDIR_PERM
    assert out[c[3]].fetch_status == schemas.STATUS_FETCH_GONE  # exceeded, not fetched
    d = cfg.fetch_duration_ms
    assert [out[u].fetch_ts - T0 for u in c] == [0, d, 2 * d, 3 * d]
    # repr accumulates chooseRepr hop by hop
    r1 = choose_repr_url(c[0], c[1], False)
    r2 = choose_repr_url(r1, c[2], True)
    assert out[c[1]].repr_url == r1
    assert out[c[2]].repr_url == r2
    assert out[c[3]].repr_url == choose_repr_url(r2, c[3], False)


def test_redirect_cross_host_queue_coupling(spark):
    """A cross-host redirect target lands in the target host's queue: the
    hop fetch pushes THAT queue's politeness clock, delaying the host's own
    later fetchlist items."""
    cfg = CrawlConfig(num_partitions=1, fetcher_threads=4, http_redirect_max=1)
    wg = _wg(spark, [
        ("http://a-sim.com/p1.html", "a-sim.com", "redir_perm", "http://b-sim.com/q1.html"),
        ("http://b-sim.com/q1.html", "b-sim.com", "ok", None),
        ("http://b-sim.com/q2.html", "b-sim.com", "ok", None),
        ("http://b-sim.com/q3.html", "b-sim.com", "ok", None),
    ])
    fl = _fetchlist(spark, [
        "http://a-sim.com/p1.html", "http://b-sim.com/q2.html", "http://b-sim.com/q3.html",
    ])
    out = {r.url: r for r in run_fetch(fl, wg, _robots(spark), cfg, 1, T0).collect()}
    assert len(out) == 4
    d, delay = cfg.fetch_duration_ms, cfg.fetcher_server_delay_ms
    assert out["http://b-sim.com/q2.html"].fetch_ts - T0 == 0      # own queue, own thread
    assert out["http://b-sim.com/q1.html"].fetch_ts - T0 == d      # hop, in-thread
    assert out["http://b-sim.com/q1.html"].host == "b-sim.com"
    # q3 waits for the HOP's end + delay (2d + delay), not q2's (d + delay)
    assert out["http://b-sim.com/q3.html"].fetch_ts - T0 == 2 * d + delay


def test_redirect_hop_robots_denied(spark):
    """The reference re-checks robots at the loop top for the new fit:
    denied target -> GONE, no fetch (Fetcher.java:783-793)."""
    cfg = CrawlConfig(num_partitions=1, fetcher_threads=1, http_redirect_max=2)
    wg = _wg(spark, [
        ("http://a-sim.com/p1.html", "a-sim.com", "redir_perm", "http://b-sim.com/priv/x.html"),
        ("http://b-sim.com/priv/x.html", "b-sim.com", "ok", None),
    ])
    rb = _robots(spark, [
        {"host": "b-sim.com", "agent": "*", "disallow": ["/priv/"], "allow": [], "crawl_delay": None},
    ])
    out = {r.url: r for r in run_fetch(
        _fetchlist(spark, ["http://a-sim.com/p1.html"]), wg, rb, cfg, 1, T0).collect()}
    assert len(out) == 2
    assert out["http://b-sim.com/priv/x.html"].fetch_status == schemas.STATUS_FETCH_GONE
    # gate consumes no fetch time: emitted at the source fetch's end
    assert out["http://b-sim.com/priv/x.html"].fetch_ts - T0 == cfg.fetch_duration_ms


def test_redirect_external_ignored(spark):
    """db.ignore.external.links stops a cross-host chain with no target row
    (handleRedirect, Fetcher.java:970-983)."""
    cfg = CrawlConfig(num_partitions=1, fetcher_threads=1, http_redirect_max=2,
                      db_ignore_external_links=True)
    wg = _wg(spark, [
        ("http://a-sim.com/p1.html", "a-sim.com", "redir_perm", "http://b-sim.com/q1.html"),
        ("http://b-sim.com/q1.html", "b-sim.com", "ok", None),
    ])
    out = run_fetch(_fetchlist(spark, ["http://a-sim.com/p1.html"]), wg,
                    _robots(spark), cfg, 1, T0).collect()
    assert len(out) == 1
    assert out[0].fetch_status == schemas.STATUS_FETCH_REDIR_PERM


def test_redirect_corpus_chain_integration(spark, corpus_tables):
    """The planted h004 redirect chain is followed through the full
    normalize/filter/robots chain-builder path."""
    cfg = CrawlConfig(num_partitions=4, fetcher_threads=4, http_redirect_max=2)
    start = "http://h004.example.com/redir/0.html"
    out = run_fetch(_fetchlist(spark, [start]), corpus_tables["web_graph"],
                    corpus_tables["robots"], cfg, 1, T0).collect()
    # source + 2 fetched hops + exceeded-GONE lookahead
    assert len(out) == 4
    by_url = {r.url: r for r in out}
    assert by_url[start].fetch_status == schemas.STATUS_FETCH_REDIR_PERM
    assert by_url["http://h004.example.com/redir/3.html"].fetch_status == schemas.STATUS_FETCH_GONE


def test_redirect_defer_mode_unchanged(spark):
    """http.redirect.max = 0 (default): targets deferred as linked rows,
    exactly one output row per fetchlist row."""
    cfg = CrawlConfig(num_partitions=1, fetcher_threads=1, http_redirect_max=0)
    wg = _wg(spark, [
        ("http://a-sim.com/p1.html", "a-sim.com", "redir_perm", "http://a-sim.com/p2.html"),
        ("http://a-sim.com/p2.html", "a-sim.com", "ok", None),
    ])
    out = run_fetch(_fetchlist(spark, ["http://a-sim.com/p1.html"]), wg,
                    _robots(spark), cfg, 1, T0).collect()
    assert len(out) == 1
    assert out[0].redirect_to == "http://a-sim.com/p2.html"


def test_throughput_kill_switch(spark):
    """Sustained sub-threshold pages/s empties the queues after N violations
    (Fetcher.java:1366-1386); dropped items are simply not emitted."""
    cfg = CrawlConfig(
        num_partitions=1, fetcher_threads=1,
        fetcher_throughput_threshold_pages=2,
        fetcher_throughput_threshold_retries=3,
        fetcher_server_delay_ms=1000, fetch_duration_ms=100,
    )
    urls = [f"http://a-sim.com/k{k}.html" for k in range(20)]
    wg = _wg(spark, [(u, "a-sim.com", "ok", None) for u in urls])
    out = run_fetch(_fetchlist(spark, urls), wg, _robots(spark), cfg, 1, T0).collect()
    # ~0.9 pages/s < 2: violations at virtual t=1s,2s,3s -> kill at 3s
    # after fetches at 0 / 1100 / 2200 ms
    assert len(out) == 3


def test_throughput_above_threshold_not_killed(spark):
    cfg = CrawlConfig(
        num_partitions=1, fetcher_threads=1,
        fetcher_throughput_threshold_pages=2,
        fetcher_throughput_threshold_retries=3,
        fetcher_server_delay_ms=100, fetch_duration_ms=100,
    )
    urls = [f"http://a-sim.com/k{k}.html" for k in range(20)]
    wg = _wg(spark, [(u, "a-sim.com", "ok", None) for u in urls])
    out = run_fetch(_fetchlist(spark, urls), wg, _robots(spark), cfg, 1, T0).collect()
    assert len(out) == 20  # 5 pages/s clears the threshold


def test_threads_per_queue_concurrent_inflight(spark):
    """fetcher.threads.per.queue=2 (FetchItemQueue maxThreads): two fetches
    of one queue run concurrently; fetcher.server.min.delay replaces the
    crawl delay and gates on the last FINISHED fetch. Virtual clock is
    deterministic, so the exact start times are asserted."""
    urls = [f"http://q-sim.com/p{i}.html" for i in range(6)]
    wg = _wg(spark, [(u, "q-sim.com", "ok", None) for u in urls])
    base = dict(num_partitions=1, fetcher_threads=4,
                fetch_duration_ms=100, fetcher_server_delay_ms=5000)

    one = CrawlConfig(**base)
    out1 = run_fetch(_fetchlist(spark, urls), wg, _robots(spark), one, 1, T0).collect()
    ts1 = sorted(r.fetch_ts - T0 for r in out1)
    assert ts1 == [0, 5100, 10200, 15300, 20400, 25500]  # serial: end+5000 each

    two = CrawlConfig(**base, fetcher_threads_per_queue=2,
                      fetcher_server_min_delay_ms=1000)
    out2 = run_fetch(_fetchlist(spark, urls), wg, _robots(spark), two, 1, T0).collect()
    ts2 = sorted(r.fetch_ts - T0 for r in out2)
    # pairs start together; next pair at previous finish (100) + min delay
    assert ts2 == [0, 0, 1100, 1100, 2200, 2200]
    assert len({r.url for r in out2}) == 6

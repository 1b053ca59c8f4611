"""Distributed synthetic web for benchmarking — generated entirely with
native Catalyst expressions (spark.range + sequence/explode/concat), no
driver-side rows, so corpus size scales to millions of URLs.

The small driver-side SyntheticWeb (corpus.py) stays the CORRECTNESS
fixture (it carries ground-truth span sequences, dup pages, traps). This
module only has to be shape-compatible with the crawl loop's inputs:

- web_graph(url, host, status, redirect_to, outlinks, content_length,
  declared_length, signature_seed)
- raw_content(url, host, content, content_type, base_url) — mini-HTML the
  parse kernel scans (<title>/<p>/<img src>/<a href> in document order)
- robots(host, agent, disallow, allow, crawl_delay)
- seeds(url, metadata) — the FULL url list (FreeGenerator G8 semantics,
  tools/FreeGenerator.java:52+) so one cycle saturates the frontier and
  throughput measures the engine, not discovery.

Determinism: every value is a pure function of (host_id, page_id) via
xxhash64 — identical at any core count, which the N-vs-4N scaling run
requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

IMG_CDN = "http://img.bench-cdn.com/"


def _host(hid):
    # zero-pad WITHOUT Spark's lpad, which TRUNCATES strings longer than
    # the target width — hid 12345 would collide with hid 1234, producing
    # duplicate urls that inject dedups and the bench silently undercounts
    h = hid.cast("string")
    return F.concat(
        F.lit("h"),
        F.when(F.length(h) < 4, F.lpad(h, 4, "0")).otherwise(h),
        F.lit(".bench.example.com"))


def _url(hid, pid):
    return F.concat(
        F.lit("http://"), _host(hid), F.lit("/page/"), pid.cast("string"), F.lit(".html")
    )


def bench_web_tables(
    spark: SparkSession,
    n_hosts: int = 2000,
    pages_per_host: int = 150,
    mega_factor: int = 4,
    n_partitions: int = 64,
) -> dict[str, DataFrame]:
    hosts = spark.range(n_hosts).select(
        F.col("id").alias("hid"),
        F.when(F.col("id") == 0, F.lit(pages_per_host * mega_factor))
        .otherwise(F.lit(pages_per_host))
        .cast("long")
        .alias("np"),
    )
    pages = hosts.select(
        "hid", "np",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("np") - 1)).alias("pid"),
    ).repartition(n_partitions, "hid", "pid")

    hid, pid, np_ = F.col("hid"), F.col("pid"), F.col("np")
    url = _url(hid, pid)
    h = F.abs(F.xxhash64(url))
    m = F.pmod(h, F.lit(100))

    status = (
        F.when(m == 0, F.lit("gone"))
        .when(m == 1, F.lit("exception"))
        .when(m == 2, F.lit("redir_perm"))
        .when(m == 3, F.lit("redir_temp"))
        .when(m == 4, F.lit("notmodified"))
        .otherwise(F.lit("ok"))
    )
    redirect_to = F.when(
        m.isin(2, 3), _url(hid, F.pmod(pid + 1, np_))
    ).otherwise(F.lit(None).cast("string"))

    # outlinks: 3 intra-host + 1 cross-host, all guaranteed-valid targets
    l1 = _url(hid, F.pmod(pid * 7 + 1, np_))
    l2 = _url(hid, F.pmod(pid * 13 + 3, np_))
    l3 = _url(hid, F.pmod(pid * 29 + 11, np_))
    x_hid = F.pmod(hid * 31 + pid, F.lit(n_hosts))
    x1 = _url(x_hid, F.pmod(pid, F.lit(pages_per_host)))
    outlinks = F.array(
        F.struct(l1.alias("to_url"), F.lit("l1").alias("anchor")),
        F.struct(l2.alias("to_url"), F.lit("l2").alias("anchor")),
        F.struct(l3.alias("to_url"), F.lit("l3").alias("anchor")),
        F.struct(x1.alias("to_url"), F.lit("x1").alias("anchor")),
    )

    title = F.concat(F.lit("bench page "), hid.cast("string"), F.lit("/"), pid.cast("string"))
    img = F.concat(F.lit(IMG_CDN), F.conv(h.cast("string"), 10, 16), F.lit(".jpg"))
    para = F.concat(
        F.lit("alpha bravo charlie token"),
        F.pmod(h, F.lit(997)).cast("string"),
        F.lit(" delta echo foxtrot golf hotel india "),
        F.pmod(h, F.lit(31)).cast("string"),
    )
    content = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title></head><body><p>"),
        para, F.lit("</p><img src=\""), img, F.lit("\"><p>"),
        para, F.lit(" juliet kilo lima</p>"),
        F.lit("<a href=\""), l1, F.lit("\">l1</a>"),
        F.lit("<a href=\""), l2, F.lit("\">l2</a>"),
        F.lit("<a href=\""), l3, F.lit("\">l3</a>"),
        F.lit("<a href=\""), x1, F.lit("\">x1</a>"),
        F.lit("</body></html>"),
    )
    content_length = F.length(content).cast("int")
    declared_length = F.when(
        F.pmod(h, F.lit(211)) == 5, content_length + 1000
    ).otherwise(content_length).cast("int")
    # ~2% of pages share a per-host signature -> exact-dup detection work
    signature_seed = F.when(
        F.pmod(h, F.lit(50)) == 7, F.xxhash64(_host(hid))
    ).otherwise(F.xxhash64(url))

    web_graph = pages.select(
        url.alias("url"),
        _host(hid).alias("host"),
        status.alias("status"),
        redirect_to.alias("redirect_to"),
        outlinks.alias("outlinks"),
        content_length.alias("content_length"),
        declared_length.alias("declared_length"),
        signature_seed.alias("signature_seed"),
    )

    raw_content = pages.filter(
        status.isin("ok", "notmodified")
    ).select(
        url.alias("url"),
        _host(hid).alias("host"),
        content.alias("content"),
        F.lit("text/html").alias("content_type"),
        url.alias("base_url"),
    )

    robots = spark.createDataFrame(
        [
            ("h0001.bench.example.com", "*", [], [], 2.0),
            ("h0002.bench.example.com", "*", ["/page/1"], [], None),
            ("h0003.bench.example.com", "*", [], [], 40.0),  # > max crawl delay -> gone
        ],
        "host string, agent string, disallow array<string>, allow array<string>, crawl_delay double",
    )

    seeds = pages.select(
        url.alias("url"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )

    return {
        "web_graph": web_graph,
        "raw_content": raw_content,
        "robots": robots,
        "seeds": seeds,
    }

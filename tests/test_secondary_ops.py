"""LinkDb / mergers / stats / indexer / webgraph operator tests
(TestCrawlDbMerger, TestLinkDbMerger, TestSegmentMerger semantics)."""

import pytest
from pyspark.sql import functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.operators.linkdb import invert_links, linkdb_aggregate, merge_linkdbs
from nutch_spark.operators.mergers import merge_crawldbs, merge_segments
from nutch_spark.operators.stats import crawldb_stats, crawldb_topn, domain_statistics
from nutch_spark.operators.webgraph import build_webgraph, linkrank, update_scores

T0 = 1_700_000_000_000


def mk_parse_data(spark, rows):
    return spark.createDataFrame(
        rows, "url string, title string, outlinks array<struct<to_url:string,anchor:string>>"
    )


def mk_frontier(spark, rows):
    full = [
        {
            "url": u, "host": h, "status": st, "fetch_time": ft, "retries": 0,
            "fetch_interval": 3600, "score": float(sc), "signature": None,
            "modified_time": 0, "metadata": {},
        }
        for (u, h, st, ft, sc) in rows
    ]
    return spark.createDataFrame(full, schemas.FRONTIER_SCHEMA)


def test_invert_links_drops_internal(spark):
    cfg = CrawlConfig()  # db_ignore_internal_links=True
    pd_ = mk_parse_data(spark, [
        ("http://a.com/1", "t", [
            {"to_url": "http://a.com/2", "anchor": "internal"},
            {"to_url": "http://b.com/x", "anchor": "external"},
        ]),
    ])
    rows = invert_links(pd_, cfg).collect()
    assert len(rows) == 1
    assert rows[0].to_url == "http://b.com/x"
    assert rows[0].from_url == "http://a.com/1"


def test_invert_links_anchor_truncated_and_capped(spark):
    cfg = CrawlConfig(db_max_anchor_length=5, db_max_inlinks=2, db_ignore_internal_links=False)
    pd_ = mk_parse_data(spark, [
        (f"http://s{i}.com/", "t", [{"to_url": "http://t.com/x", "anchor": "abcdefghij"}])
        for i in range(5)
    ])
    rows = invert_links(pd_, cfg).collect()
    assert len(rows) == 2  # capped at db_max_inlinks
    assert all(r.anchor == "abcde" for r in rows)
    agg = linkdb_aggregate(invert_links(pd_, cfg), cfg).collect()
    assert agg[0].n_inlinks == 2


def test_merge_linkdbs_dedupes(spark):
    cfg = CrawlConfig(db_ignore_internal_links=False)
    a = spark.createDataFrame(
        [("http://t.com/x", "http://s.com/", "a1")], "to_url string, from_url string, anchor string"
    )
    b = spark.createDataFrame(
        [("http://t.com/x", "http://s.com/", "a2"),
         ("http://t.com/y", "http://s.com/", "a3")],
        "to_url string, from_url string, anchor string",
    )
    merged = merge_linkdbs([a, b], cfg).collect()
    assert len(merged) == 2  # (t/x, s) deduped


def test_merge_crawldbs_latest_wins(spark):
    """TestCrawlDbMerger.java:96+ — the entry with newer fetchTime wins."""
    a = mk_frontier(spark, [("http://x.com/", "x.com", schemas.STATUS_DB_UNFETCHED, T0, 1.0)])
    b = mk_frontier(spark, [("http://x.com/", "x.com", schemas.STATUS_DB_FETCHED, T0 + 5, 2.0)])
    out = merge_crawldbs([a, b]).collect()
    assert len(out) == 1
    assert out[0].status == schemas.STATUS_DB_FETCHED
    assert out[0].fetch_time == T0 + 5


def test_merge_segments_latest_segment_wins(spark):
    s1 = spark.createDataFrame([("http://x.com/", "old")], "url string, val string")
    s2 = spark.createDataFrame([("http://x.com/", "new"), ("http://y.com/", "only")],
                               "url string, val string")
    out = {r.url: r.val for r in merge_segments([s1, s2], seg_ids=[20240101, 20240202]).collect()}
    assert out == {"http://x.com/": "new", "http://y.com/": "only"}


def test_crawldb_stats_and_topn(spark):
    f = mk_frontier(spark, [
        ("http://a.com/1", "a.com", schemas.STATUS_DB_UNFETCHED, T0, 1.0),
        ("http://a.com/2", "a.com", schemas.STATUS_DB_UNFETCHED, T0, 3.0),
        ("http://a.com/3", "a.com", schemas.STATUS_DB_FETCHED, T0, 2.0),
    ])
    st = {r.status: r for r in crawldb_stats(f).collect()}
    assert st[schemas.STATUS_DB_UNFETCHED].n == 2
    assert abs(st[schemas.STATUS_DB_UNFETCHED].max_score - 3.0) < 1e-6
    top = crawldb_topn(f, 2).collect()
    assert [r.url for r in top] == ["http://a.com/2", "http://a.com/3"]


def test_domain_statistics(spark):
    f = mk_frontier(spark, [
        ("http://a.x.com/1", "a.x.com", 1, T0, 1.0),
        ("http://b.x.com/1", "b.x.com", 1, T0, 1.0),
        ("http://c.org/1", "c.org", 1, T0, 1.0),
    ])
    hosts = {r.host: r.n for r in domain_statistics(f, "host").collect()}
    assert hosts == {"a.x.com": 1, "b.x.com": 1, "c.org": 1}
    doms = {r.domain: r.n for r in domain_statistics(f, "domain").collect()}
    assert doms == {"x.com": 2, "c.org": 1}


def test_webgraph_and_linkrank(spark):
    pd_ = mk_parse_data(spark, [
        ("http://a.com/", "a", [{"to_url": "http://b.com/", "anchor": "b"},
                                 {"to_url": "http://c.com/", "anchor": "c"}]),
        ("http://b.com/", "b", [{"to_url": "http://c.com/", "anchor": "c"}]),
        ("http://c.com/", "c", [{"to_url": "http://a.com/", "anchor": "a"}]),
    ])
    g = build_webgraph(pd_)
    nodes = {r.url: (r.in_deg, r.out_deg) for r in g["nodes"].collect()}
    assert nodes["http://c.com/"] == (2, 1)
    rank = linkrank(g["edges"], g["nodes"], iterations=5)
    rk = {r.url: r.rank for r in rank.collect()}
    assert rk["http://c.com/"] > rk["http://b.com/"]  # 2 inlinks > 1
    # ScoreUpdater overlays graph score onto frontier
    f = mk_frontier(spark, [("http://c.com/", "c.com", 1, T0, 0.5)])
    upd = update_scores(f, rank).collect()[0]
    assert abs(upd.score - rk["http://c.com/"]) < 1e-5


def test_node_dump_modes(spark):
    """J7 NodeDumper: top urls by inlinks/outlinks/scores, asc/desc."""
    from nutch_spark.operators.webgraph import node_dump

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")], "src string, dst string")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    nodes = (out_deg.withColumnRenamed("src", "url")
             .join(in_deg.withColumnRenamed("dst", "url"), "url", "full_outer")
             .fillna(0, ["in_deg", "out_deg"]))
    top_in = [(r.url, r.value) for r in node_dump(nodes, by="inlinks", topn=2).collect()]
    assert top_in == [("c", 2.0), ("a", 1.0)]
    top_out = [(r.url, r.value) for r in node_dump(nodes, by="outlinks", topn=1).collect()]
    assert top_out == [("a", 2.0)]
    rank = spark.createDataFrame([("a", 0.5), ("b", 0.9), ("c", 0.1)], "url string, rank double")
    asc = [r.url for r in node_dump(nodes, rank, by="scores", descending=False).collect()]
    assert asc == ["c", "a", "b"]


def test_link_dump_inlink_view(spark):
    from nutch_spark.operators.webgraph import link_dump

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "a")], "src string, dst string")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    nodes = (out_deg.withColumnRenamed("src", "url")
             .join(in_deg.withColumnRenamed("dst", "url"), "url", "full_outer")
             .fillna(0, ["in_deg", "out_deg"]))
    got = {r.url: r for r in link_dump(edges, nodes).collect()}
    assert got["c"].n_inlinks == 2
    assert [n.src for n in got["c"].inlink_nodes] == ["a", "b"]
    assert got["c"].inlink_nodes[0].src_out_deg == 1


def test_csv_dump_roundtrip(spark, tmp_path):
    """S7 CrawlDb CSV dump (CrawlDbReader.java:95-146)."""
    import pandas as pd

    from nutch_spark.operators.stats import dump_csv

    frontier = spark.createDataFrame(
        [("http://a.com/", 1, 1000, 0, 86400, 1.5, "aa", 0),
         ("http://b.com/", 2, 2000, 1, 86400, 2.5, "bb", 5)],
        "url string, status int, fetch_time long, retries int, "
        "fetch_interval int, score float, signature string, modified_time long")
    path = str(tmp_path / "dump")
    dump_csv(frontier, path)
    import glob
    parts = sorted(glob.glob(path + "/*.csv"))
    back = pd.concat([pd.read_csv(p) for p in parts]).sort_values("url")
    assert list(back["url"]) == ["http://a.com/", "http://b.com/"]
    assert list(back["status"]) == [1, 2]


def test_http_date_roundtrip():
    """C12: RFC-822 GMT format + lenient parse."""
    from nutch_spark.functions.dates import http_date_format, http_date_parse

    ms = 1_700_000_000_000
    s = http_date_format(ms)
    assert s == "Tue, 14 Nov 2023 22:13:20 GMT"
    assert http_date_parse(s) == ms
    # lenient alternates (HttpDateFormat parse tolerance)
    assert http_date_parse("14 Nov 2023 22:13:20 GMT") == ms
    assert http_date_parse("2023-11-14T22:13:20Z") == ms
    assert http_date_parse("not a date") is None
    assert http_date_parse(None) is None


def test_http_date_udfs(spark):
    from nutch_spark.functions.dates import (
        http_date_format, http_date_format_udf, http_date_parse_udf,
    )

    df = spark.createDataFrame([(1_700_000_000_000,), (0,)], "ts long")
    out = (df.withColumn("s", http_date_format_udf(F.col("ts")))
           .withColumn("back", http_date_parse_udf(F.col("s"))).collect())
    for r in out:
        assert r.s == http_date_format(r.ts)
        assert r.back == r.ts


def test_segment_dump_and_get(spark):
    """SegmentReader.java:204-316 merged per-URL view + :319-500 get."""
    from nutch_spark.operators.stats import segment_dump, segment_get

    fetch = spark.createDataFrame(
        [("http://a.example.com/", 33, 1000, "s1", 10),
         ("http://b.example.com/", 35, 2000, "s2", 20)],
        "url string, fetch_status int, fetch_ts long, signature string, "
        "content_length int")
    docs = spark.createDataFrame(
        [("http://a.example.com/",
          [{"kind": "text", "text": "T", "media_ref": None, "offset": 0},
           {"kind": "link", "text": "", "media_ref": "http://c.example.com/",
            "offset": 1}]),
         ("http://only-parsed.example.com/",
          [{"kind": "text", "text": "P", "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    ptext = spark.createDataFrame(
        [("http://a.example.com/", "T"), ("http://only-parsed.example.com/", "P")],
        "url string, text string")
    dump = segment_dump(fetch, docs, ptext)
    rows = {r.url: r for r in dump.collect()}
    assert len(rows) == 3  # full-outer: fetch-only + parse-only both survive
    assert rows["http://a.example.com/"].n_spans == 2
    assert rows["http://a.example.com/"].n_outlinks == 1
    assert rows["http://b.example.com/"].n_spans is None  # fetch-only
    assert rows["http://only-parsed.example.com/"].fetch_status is None
    got = segment_get(dump, "http://a.example.com/").collect()
    assert len(got) == 1 and got[0].text == "T"


def test_crawldb_scan_full_match_and_status(spark):
    """CrawlDBScanner.java:84-91: status-name gate (case-insensitive) +
    Java String.matches FULL-match regex semantics."""
    from nutch_spark.operators.stats import crawldb_scan

    f = spark.createDataFrame(
        [("http://a.example.com/x", 1), ("http://a.example.com/xy", 2),
         ("http://b.example.com/x", 2)],
        "url string, status int")
    # partial match is NOT enough: /xy does not fully match .../x
    got = {r.url for r in crawldb_scan(
        f, r"http://a\.example\.com/x").collect()}
    assert got == {"http://a.example.com/x"}
    got = {r.url for r in crawldb_scan(
        f, r"http://.*/xy?", status="DB_FETCHED").collect()}
    assert got == {"http://a.example.com/xy", "http://b.example.com/x"}
    with pytest.raises(ValueError):  # unknown status: error, not empty dump
        crawldb_scan(f, r".*", status="nope")
    # a caller-anchored pattern keeps FULL-match semantics: "^http" matches
    # only the literal string "http" under String.matches, never a prefix
    assert crawldb_scan(f, r"^http").count() == 0
    assert crawldb_scan(f, r"^http://a\.example\.com/x$").count() == 1


def test_crawldb_get(spark):
    """CrawlDbReader.get/readUrl (CrawlDbReader.java:378-395): the single
    datum for one URL; 'not found' is an empty result."""
    from nutch_spark.operators.stats import crawldb_get

    f = spark.createDataFrame(
        [("http://a.example.com/x", 1, 2.5), ("http://b.example.com/x", 2, 0.5)],
        "url string, status int, score float")
    got = crawldb_get(f, "http://a.example.com/x").collect()
    assert len(got) == 1 and got[0].status == 1 and got[0].score == 2.5
    assert crawldb_get(f, "http://missing.example.com/") .count() == 0


def test_crawldb_scan_unknown_status_raises(spark):
    """A typo'd status name must raise, not silently return an empty dump
    (code -1 matched nothing and looked like 'regex matched no rows')."""
    import pytest as _pytest

    from nutch_spark.operators.stats import crawldb_scan

    db = spark.createDataFrame(
        [("http://a.com/", 2)], "url string, status int")
    with _pytest.raises(ValueError, match="db_feched"):
        crawldb_scan(db, "http://.*", status="db_feched")

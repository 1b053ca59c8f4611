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

"""parsechecker / indexchecker / readlinkdb / solrclean tool tests
(ParserChecker.java, IndexingFiltersChecker.java, LinkDbReader.java,
SolrClean.java)."""

from pyspark.sql import functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.operators.checkers import check_index, check_parse
from nutch_spark.operators.linkdb import (
    get_anchors, linkdb_aggregate, linkdb_dump, linkdb_get,
)

PAGE = (
    "<html><head><title>Demo Page</title></head><body>"
    "<p>hello world</p>"
    '<a href="http://other.example.com/a">first</a> '
    '<a href="http://other.example.com/b">second</a>'
    "</body></html>"
)


def mk_content(spark, rows):
    return spark.createDataFrame(rows, "url string, content string, content_type string")


def test_check_parse_fields(spark):
    out = check_parse(
        mk_content(spark, [("http://site.example.com/p", PAGE, "text/html")]),
        CrawlConfig(),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.content_type == "text/html"
    assert r.title == "Demo Page"
    assert r.n_outlinks == 2
    assert r.signature is not None and len(r.signature) == 32


def test_check_parse_force_as_and_dump_text(spark):
    # -forceAs text/plain: the HTML is NOT parsed as html — no title, no
    # outlinks, text = raw content (ParserChecker.java:86-88)
    out = check_parse(
        mk_content(spark, [("http://site.example.com/p", PAGE, "text/html")]),
        CrawlConfig(),
        force_content_type="text/plain",
        dump_text=True,
    ).collect()[0]
    assert out.content_type == "text/plain"
    assert out.n_outlinks == 0
    assert "hello world" in (out.text or "")
    assert "<a href" in (out.text or "")  # plain-text parse keeps markup


def test_check_parse_mime_resolution(spark):
    # no -forceAs: content.getContentType() resolves declared-vs-sniffed
    # (an html payload declared octet-stream resolves to text/html)
    out = check_parse(
        mk_content(
            spark,
            [("http://site.example.com/p", PAGE, "application/octet-stream")],
        ),
        CrawlConfig(),
    ).collect()[0]
    assert out.content_type == "text/html"
    assert out.title == "Demo Page"


def test_check_index_field_rows(spark):
    rows = check_index(
        mk_content(spark, [("http://site.example.com/p", PAGE, "text/html")]),
        CrawlConfig(index_static="collection:demo"),
    ).collect()
    fields = {r.field: r.value for r in rows}
    assert fields["title"] == "Demo Page"
    assert fields["host"] == "site.example.com"
    assert fields["collection"] == "demo"
    assert all(len(r.value) <= 100 for r in rows)  # display truncation


def _mk_linkdb(spark):
    inlinks = spark.createDataFrame(
        [
            ("http://t.example.com/x", "http://a.example.com/", "one"),
            ("http://t.example.com/x", "http://b.example.com/", "two"),
            ("http://solo.example.com/", "http://c.example.com/", "z"),
        ],
        "to_url string, from_url string, anchor string",
    )
    return linkdb_aggregate(inlinks, CrawlConfig())


def test_linkdb_dump_repr(spark):
    dump = {r.url: r for r in linkdb_dump(_mk_linkdb(spark)).collect()}
    assert dump["http://t.example.com/x"].n_inlinks == 2
    assert dump["http://t.example.com/x"].inlinks_repr == (
        "Inlinks:\n"
        " fromUrl: http://a.example.com/ anchor: one\n"
        " fromUrl: http://b.example.com/ anchor: two"
    )
    assert dump["http://solo.example.com/"].n_inlinks == 1


def test_linkdb_get_and_anchors(spark):
    db = _mk_linkdb(spark)
    got = linkdb_get(db, "http://t.example.com/x").collect()
    assert {(r.from_url, r.anchor) for r in got} == {
        ("http://a.example.com/", "one"),
        ("http://b.example.com/", "two"),
    }
    assert get_anchors(db, "http://solo.example.com/") == ["z"]
    assert linkdb_get(db, "http://missing.example.com/").count() == 0


def test_dedup_index_keep_order(spark):
    from nutch_spark.operators.indexer import dedup_index

    idx = spark.createDataFrame(
        [
            ("http://a.example.com/longer", "d1", 2.0),   # boost loses to 3.0
            ("http://b.example.com/x", "d1", 3.0),        # winner: max boost
            ("http://c.example.com/pp", "d2", 1.0),       # longer url loses
            ("http://d.example.com/p", "d2", 1.0),        # winner: shorter
            ("http://e.example.com/s", "d3", 1.0),        # lexical winner
            ("http://f.example.com/s", "d3", 1.0),
            ("http://g.example.com/", None, 9.0),         # null digest dropped
        ],
        "url string, digest string, boost double",
    )
    kept = {r.digest: r.url for r in dedup_index(idx).collect()}
    assert kept == {
        "d1": "http://b.example.com/x",
        "d2": "http://d.example.com/p",
        "d3": "http://e.example.com/s",
    }


def test_dedup_index_null_and_nan_boost_ordering(spark):
    """Window-parity for the min_by rewrite: desc(boost) put NaN first and
    NULL last — a NULL-boost doc must LOSE to any boosted duplicate, a
    NaN-boost doc must WIN (Spark sorts NaN above every double)."""
    from nutch_spark.operators.indexer import dedup_index

    idx = spark.createDataFrame(
        [("http://a.example.com/", "d1", None),
         ("http://b.example.com/", "d1", 5.0),
         ("http://c.example.com/", "d2", float("nan")),
         ("http://d.example.com/", "d2", 9.0),
         ("http://e.example.com/", "d3", None)],  # all-null group keeps a row
        "url string, digest string, boost double",
    )
    kept = {r.digest: r.url for r in dedup_index(idx).collect()}
    assert kept == {
        "d1": "http://b.example.com/",
        "d2": "http://c.example.com/",
        "d3": "http://e.example.com/",
    }


def test_dedup_keep_first_null_ids(spark):
    """min_by must not skip NULL-id rows (the old asc window put NULLs
    first): an all-NULL-id duplicate group keeps a REAL row, not a
    fabricated all-null one."""
    from nutch_spark.operators.dedup import dedup_exact_keep_first

    df = spark.createDataFrame(
        [(None, "same text"), (None, "same text"), (7, "other")],
        "doc_id int, text string",
    )
    rows = sorted(dedup_exact_keep_first(df).collect(),
                  key=lambda r: r.text)
    assert [r.text for r in rows] == ["other", "same text"]
    assert rows[1].text == "same text"  # body NOT nulled out


def test_merge_segments_null_segment_keeps_row(spark):
    """max_by must not skip NULL-segment rows: a url whose stored segment
    values are all NULL keeps its real data (old desc-nulls-last window
    behavior), and a non-null segment still beats a NULL one."""
    from nutch_spark.operators.mergers import merge_segments

    seg = spark.createDataFrame(
        [("http://u.example.com/", "v1", None),
         ("http://w.example.com/", "old", None),
         ("http://w.example.com/", "new", 5)],
        "url string, val string, segment long",
    )
    rows = {r.url: r.val for r in merge_segments([seg]).collect()}
    assert rows == {"http://u.example.com/": "v1",
                    "http://w.example.com/": "new"}


def test_linkdb_dump_null_anchor_rendered(spark):
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.linkdb import linkdb_aggregate

    inl = spark.createDataFrame(
        [("http://t.example.com/", "http://a.example.com/", None),
         ("http://t.example.com/", "http://b.example.com/", "x")],
        "to_url string, from_url string, anchor string",
    )
    row = linkdb_dump(linkdb_aggregate(inl, CrawlConfig())).collect()[0]
    assert row.n_inlinks == 2
    assert row.inlinks_repr.count("fromUrl:") == 2  # null anchor still listed


def test_check_index_resolves_mime(spark):
    """indexchecker resolves declared-vs-sniffed content type exactly like
    parsechecker (octet-stream-declared HTML indexes with its real title)."""
    rows = check_index(
        mk_content(
            spark,
            [("http://site.example.com/p", PAGE, "application/octet-stream")],
        ),
        CrawlConfig(),
    ).collect()
    fields = {r.field: r.value for r in rows}
    assert fields["title"] == "Demo Page"


def test_clean_index_removes_gone(spark):
    from nutch_spark.operators.indexer import clean_index

    idx = spark.createDataFrame(
        [("http://a.example.com/", "d1"), ("http://b.example.com/", "d2"),
         ("http://c.example.com/", "d3")],
        "url string, digest string",
    )
    frontier = spark.createDataFrame(
        [("http://a.example.com/", schemas.STATUS_DB_FETCHED),
         ("http://b.example.com/", schemas.STATUS_DB_GONE),
         ("http://d.example.com/", schemas.STATUS_DB_GONE)],
        "url string, status int",
    )
    kept = {r.url for r in clean_index(idx, frontier).collect()}
    assert kept == {"http://a.example.com/", "http://c.example.com/"}

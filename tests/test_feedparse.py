"""parse-feed (plugin/feed FeedParser.java) — kernel-level tests.

Pure-pandas: the extractor is a MIME-family kernel; Spark plumbing is the
same dispatch path already covered by test_parse_spans/test_crawl_cycle.
"""

import pandas as pd

from nutch_spark.operators.feedparse import _feed_pdf, _parse_date_ms, _strip_tags
from nutch_spark.operators.parse import MIME_PARSERS

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Site &lt;b&gt;News&lt;/b&gt;</title>
  <link>http://feeds.example.com/home</link>
  <description>All the <b>news</b></description>
  <item>
    <title>First post</title>
    <link>http://feeds.example.com/posts/1</link>
    <description>&lt;p&gt;Hello world&lt;/p&gt; &lt;a href="http://feeds.example.com/next"&gt;next&lt;/a&gt;</description>
    <author>alice</author>
    <category>tech</category><category>spark</category>
    <pubDate>Mon, 07 Jan 2008 10:00:00 GMT</pubDate>
  </item>
  <item>
    <title>Dropped</title>
    <link></link>
    <description>no link, entry dropped</description>
  </item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <subtitle>sub</subtitle>
  <link rel="alternate" href="http://atom.example.com/"/>
  <entry>
    <title>Entry one</title>
    <link rel="alternate" href="http://atom.example.com/e/1"/>
    <summary type="text">plain body</summary>
    <author><name>bob</name></author>
    <category term="misc"/>
    <published>2008-01-07T10:00:00Z</published>
    <updated>2008-01-08T11:30:00Z</updated>
  </entry>
</feed>"""


def _run(content, url="http://feeds.example.com/feed.xml"):
    return _feed_pdf(pd.DataFrame({"url": [url], "content": [content]}))


def test_registered_mime_families():
    assert any(m.startswith("application/rss") for m in MIME_PARSERS)
    assert "text/xml" in MIME_PARSERS  # parse-plugins.xml:75-78 maps it to feed


def test_rss_entries_and_feed_doc():
    out = _run(RSS)
    # 1 kept entry + the feed doc; the link-less entry is dropped
    # (FeedParser.java:237-238)
    assert len(out) == 2
    entry = out[out.doc_id == "http://feeds.example.com/posts/1"].iloc[0]
    assert entry["title"] == "First post"
    # html-typed description: sub-parsed -> text spans AND the outlink
    kinds = [s["kind"] for s in entry["spans"]]
    assert "link" in kinds and "text" in kinds
    link = next(s for s in entry["spans"] if s["kind"] == "link")
    assert link["media_ref"] == "http://feeds.example.com/next"
    assert entry["meta"]["feed"] == "http://feeds.example.com/home"
    assert entry["meta"]["author"] == "alice"
    assert entry["meta"]["tags"] == "tech\tspark"
    assert entry["meta"]["published"] == "1199700000000"

    feed_doc = out[out.doc_id == "http://feeds.example.com/feed.xml"].iloc[0]
    assert feed_doc["title"] == "Site News"  # stripTags
    assert [s["kind"] for s in feed_doc["spans"]] == ["text"]
    assert feed_doc["spans"][0]["text"] == "All the news"


def test_atom_entry_text_body():
    out = _run(ATOM, url="http://atom.example.com/feed")
    entry = out[out.doc_id == "http://atom.example.com/e/1"].iloc[0]
    # text-typed summary: TextParser path — one text span, no links
    assert [(s["kind"], s["text"]) for s in entry["spans"]] == [("text", "plain body")]
    assert entry["meta"]["author"] == "bob"
    assert entry["meta"]["tags"] == "misc"
    assert entry["meta"]["published"] == "1199700000000"
    assert entry["meta"]["updated"] == "1199791800000"  # 2008-01-08T11:30Z
    assert entry["meta"]["feed"] == "http://atom.example.com/"


def test_malformed_feed_empty_parse():
    out = _run("<rss><channel><item></rss>")  # broken XML
    assert len(out) == 0  # FeedParser.java:119-125 empty parse result


def test_strip_tags_and_dates():
    assert _strip_tags(" <b>hi</b> there ") == "hi there"
    assert _parse_date_ms("Mon, 07 Jan 2008 10:00:00 GMT") == 1199700000000
    assert _parse_date_ms("2008-01-07T10:00:00Z") == 1199700000000
    assert _parse_date_ms("not a date") is None


RSS_RELATIVE = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>T</title>
  <atom:link xmlns:atom="http://www.w3.org/2005/Atom" rel="self"
             href="http://feeds.example.com/feed.xml"/>
  <link>http://feeds.example.com/home</link>
  <item>
    <title>Rel</title>
    <atom:link xmlns:atom="http://www.w3.org/2005/Atom" rel="self"
               href="http://feeds.example.com/posts/1.xml"/>
    <link>http://feeds.example.com/posts/1</link>
    <description>&lt;a href="/other/page.html"&gt;rel link&lt;/a&gt;</description>
  </item>
</channel></rss>"""


def test_atom_self_link_does_not_shadow_rss_link():
    """An empty-text <atom:link rel=self href=...> namespace-strips to the
    same local name 'link' (the feedburner pattern) — it must not shadow
    the real RSS <link>, which used to drop the entry entirely and lose
    the feed-level meta key."""
    out = _run(RSS_RELATIVE)
    ids = set(out["doc_id"])
    assert "http://feeds.example.com/posts/1" in ids  # entry kept
    entry = out[out["doc_id"] == "http://feeds.example.com/posts/1"].iloc[0]
    assert entry["meta"]["feed"] == "http://feeds.example.com/home"


def test_relative_hrefs_resolve_against_entry_link():
    """HTML entry bodies sub-parse with the ENTRY's url as base (the
    reference hands the sub-parse the entry link): a relative href must
    resolve, not null out at the normalizer under a synthetic base."""
    out = _run(RSS_RELATIVE)
    entry = out[out["doc_id"] == "http://feeds.example.com/posts/1"].iloc[0]
    links = [s["media_ref"] for s in entry["spans"] if s["kind"] == "link"]
    assert "http://feeds.example.com/other/page.html" in links

"""parse-feed: RSS/Atom feeds -> one parse per entry plus one for the feed.

Reference: plugin/feed FeedParser.java:106-150 (getParse), 221-287 (addToMap),
289-303 (stripTags), 305-360 (addFields); FeedIndexingFilter.java:70-110.

Semantics re-expressed over the nested-documents model (DOCS_NESTED_SCHEMA):

- The feed document itself (FeedParser.java:142-147): doc_id = fetch url,
  title = tag-stripped feed title, text = tag-stripped feed description,
  NO outlinks.
- Each entry (addToMap): keyed by the entry link after the outlink-scope
  normalize + filter chain (FeedParser.java:229-238 — a null/filtered link
  drops the entry); title = tag-stripped entry title. The entry body is the
  description (or the concatenated <content> values when absent,
  FeedParser.java:252-263); ROME types RSS descriptions and html-typed Atom
  summaries as html, so the body is re-parsed with the HTML parser
  (FeedParser.java:265-270 hands it to ParserFactory for the description's
  content type) — text spans AND outlinks come from that sub-parse. A
  text-typed Atom body takes the TextParser path: one text span, no links.
- Parse-meta per entry (addFields + FeedIndexingFilter fields): `feed` =
  the normalized+filtered feed-level link, `author` (atom authors, multi
  joined by tab), `tags` (category names, multi joined by tab),
  `published`/`updated` = epoch millis as strings (Date.getTime(),
  FeedParser.java:332-337).
- A feed ElementTree/ROME parse failure returns an EMPTY parse
  (FeedParser.java:119-125): no document rows.

Multi-valued metadata rides the map<string,string> column tab-joined (the
reference Metadata is multi-valued; consumers split on tab).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pandas as pd

from nutch_spark.functions.dates import http_date_parse
from nutch_spark.functions.urls import RegexUrlFilter, normalize_url

_TAG_RE = re.compile(r"<[^>]*>")
_NS_RE = re.compile(r"^\{[^}]*\}")

#: multi-value join char for map<string,string> parse meta
META_SEP = "\t"

_FILTER_CACHE: list = []


def _default_filter() -> RegexUrlFilter:
    """Per-worker cached default filter chain (compiling the 51-rule set
    per Arrow batch is measurable at feed volume)."""
    if not _FILTER_CACHE:
        _FILTER_CACHE.append(RegexUrlFilter())
    return _FILTER_CACHE[0]


def _strip_tags(v: str | None) -> str:
    """FeedParser.stripTags: drop markup, trim (FeedParser.java:289-303)."""
    return _TAG_RE.sub("", v or "").strip()


def _local(el: ET.Element) -> str:
    return _NS_RE.sub("", el.tag).lower()


def _parse_date_ms(s: str | None) -> int | None:
    """RFC-822 (RSS pubDate) or ISO-8601 (Atom published/updated) -> epoch
    ms, the reference's Date.getTime() (FeedParser.java:332-337)."""
    if not s or not s.strip():
        return None
    s = s.strip()
    # ISO first (C fast path) — http_date_parse's lenient pandas fallback
    # would also accept ISO but at ~1 ms/string of format guessing. A naive
    # datetime is UTC (matching the pandas fallback's utc=True convention);
    # astimezone() on a naive value would bind it to the HOST timezone.
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.astimezone(timezone.utc).timestamp() * 1000)
    except ValueError:
        pass
    return http_date_parse(s)


def _child_text(el: ET.Element, name: str) -> str | None:
    """Full text of the first matching child — itertext() so literal
    (unescaped) markup nested inside the element is not lost."""
    for c in el:
        if _local(c) == name:
            return "".join(c.itertext())
    return None


def _rss_link(el: ET.Element) -> str | None:
    """RSS link: the first <link> child with non-empty TEXT. An empty-text
    <atom:link href=.../> (the common feedburner self-ref pattern)
    namespace-strips to the same local name and must not shadow the real
    RSS <link>; when no text form exists at all, fall back to a link
    href attribute (rel=alternate preferred)."""
    href_alt = href_any = None
    for c in el:
        if _local(c) == "link":
            t = "".join(c.itertext()).strip()
            if t:
                return t
            h = c.get("href")
            if h:
                if (c.get("rel") or "alternate") == "alternate" and href_alt is None:
                    href_alt = h
                if href_any is None:
                    href_any = h
    return href_alt or href_any


def _atom_link(el: ET.Element) -> str | None:
    """rel=alternate wins, else the first link with an href."""
    first = None
    for c in el:
        if _local(c) == "link":
            href = c.get("href")
            if href is None:
                continue
            if (c.get("rel") or "alternate") == "alternate":
                return href
            if first is None:
                first = href
    return first


def _html_spans_batch(jobs: list[tuple[str, str]]) -> list[tuple[list[dict], bool]]:
    """Run the html family extractor over ALL html-typed entry bodies of a
    batch in ONE vectorized call (the sub-parse path of
    FeedParser.java:265-270). A per-entry one-row frame costs ~1 ms of
    pandas construction overhead — x10^5 entries that was the whole wall.
    Each job is (base_url, body): the sub-parse resolves RELATIVE hrefs in
    the entry body against the entry's link, like the reference handing
    the sub-parse the entry URL as base — a synthetic base would null
    every relative outlink at the normalizer."""
    from nutch_spark.operators.parse import extract_documents_pdf

    if not jobs:
        return []
    sub = extract_documents_pdf(
        pd.DataFrame({"url": [u for u, _ in jobs],
                      "content": [b for _, b in jobs]})
    )
    # extract_documents_pdf emits one row per input row, in input order
    return [
        (list(spans), bool(nofollow))
        for spans, nofollow in zip(sub["spans"], sub["nofollow"])
    ]


def _entry_fields(entry: ET.Element, kind: str) -> dict:
    """Pull link/title/body/meta from one <item> (rss) or <entry> (atom)."""
    out: dict = {"authors": [], "tags": [], "published": None, "updated": None}
    if kind == "rss":
        out["link"] = _rss_link(entry)
        out["title"] = _child_text(entry, "title")
        body = _child_text(entry, "description")
        if body is None:
            # ROME falls back to the concatenated contents
            # (FeedParser.java:255-263); RSS: content:encoded members
            parts = ["".join(c.itertext()) for c in entry if _local(c) == "encoded"]
            body = "".join(parts) if parts else None
        out["body"], out["body_type"] = body, "html"  # ROME types RSS bodies html
        a = _child_text(entry, "author") or _child_text(entry, "creator")
        if a and a.strip():
            out["authors"] = [a.strip()]
        out["tags"] = [c.text.strip() for c in entry
                       if _local(c) == "category" and c.text and c.text.strip()]
        out["published"] = _parse_date_ms(_child_text(entry, "pubdate")
                                          or _child_text(entry, "date"))
    else:  # atom
        out["link"] = _atom_link(entry)
        out["title"] = _child_text(entry, "title")
        body, btype = None, "text"
        for name in ("summary", "content"):
            for c in entry:
                if _local(c) == name:
                    body = "".join(c.itertext())
                    btype = (c.get("type") or "text").lower()
                    break
            if body is not None:
                break
        out["body"] = body
        out["body_type"] = "html" if btype in ("html", "xhtml") else "text"
        for c in entry:
            if _local(c) == "author":
                name = _child_text(c, "name")
                if name and name.strip():
                    out["authors"].append(name.strip())
        out["tags"] = [c.get("term").strip() for c in entry
                       if _local(c) == "category" and (c.get("term") or "").strip()]
        out["published"] = _parse_date_ms(_child_text(entry, "published"))
        out["updated"] = _parse_date_ms(_child_text(entry, "updated"))
    return out


def _feed_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """MIME-family extractor for application/rss+xml / application/atom+xml
    (registered in parse.MIME_PARSERS; one vectorized group per batch)."""
    url_filter = _default_filter()
    rows: list[dict] = []
    html_jobs: list[tuple[int, str]] = []  # (row index, html body)
    for url, content in zip(pdf["url"], pdf["content"]):
        try:
            root = ET.fromstring((content or "").strip())
        except ET.ParseError:
            continue  # empty parse result (FeedParser.java:119-125)
        tag = _local(root)
        if tag == "rss":
            chan = next((c for c in root if _local(c) == "channel"), None)
            if chan is None:
                continue
            kind, feed_el = "rss", chan
            entries = [c for c in chan if _local(c) == "item"]
            feed_link = _rss_link(chan)
            feed_title = _child_text(chan, "title")
            feed_desc = _child_text(chan, "description")
        elif tag == "feed":
            kind, feed_el = "atom", root
            entries = [c for c in root if _local(c) == "entry"]
            feed_link = _atom_link(root)
            feed_title = _child_text(root, "title")
            feed_desc = _child_text(root, "subtitle")
        else:
            continue

        # feed-level link: outlink-scope normalize + filter
        # (FeedParser.java:129-135; failure -> null, entries keep parsing)
        if feed_link is not None:
            feed_link = normalize_url(feed_link)
            if feed_link is not None and not url_filter.accepts(feed_link):
                feed_link = None

        for entry in entries:
            f = _entry_fields(entry, kind)
            link = f["link"]
            if link is not None:
                link = normalize_url(link)
            if link is not None and not url_filter.accepts(link):
                link = None
            if link is None:  # dropped entry (FeedParser.java:237-238)
                continue
            body = f["body"] or ""
            if f["body_type"] == "html":
                spans, nofollow = None, False  # filled by the batched sub-parse
                html_jobs.append((len(rows), link, body))
            else:
                text = body.strip()
                spans = ([{"kind": "text", "text": text, "media_ref": None,
                           "offset": 0}] if text else [])
                nofollow = False
            meta: dict[str, str] = {}
            if feed_link is not None:
                meta["feed"] = feed_link
            if f["authors"]:
                meta["author"] = META_SEP.join(f["authors"])
            if f["tags"]:
                meta["tags"] = META_SEP.join(f["tags"])
            if f["published"] is not None:
                meta["published"] = str(f["published"])
            if f["updated"] is not None:
                meta["updated"] = str(f["updated"])
            rows.append({"doc_id": link, "title": _strip_tags(f["title"]),
                         "noindex": False, "nofollow": nofollow,
                         "refresh_to": None, "meta": meta, "spans": spans})

        # the feed document itself: stripped title/description, no outlinks
        # (FeedParser.java:142-147)
        desc = _strip_tags(feed_desc)
        rows.append({
            "doc_id": url, "title": _strip_tags(feed_title),
            "noindex": False, "nofollow": False, "refresh_to": None,
            "meta": {}, "spans": ([{"kind": "text", "text": desc,
                                    "media_ref": None, "offset": 0}]
                                   if desc else []),
        })
    for (idx, _u, _b), (spans, nofollow) in zip(
        html_jobs, _html_spans_batch([(u, b) for _, u, b in html_jobs])
    ):
        rows[idx]["spans"] = spans
        rows[idx]["nofollow"] = nofollow
    if not rows:
        return pd.DataFrame(columns=["doc_id", "title", "noindex", "nofollow",
                                     "refresh_to", "meta", "spans"])
    return pd.DataFrame(rows)

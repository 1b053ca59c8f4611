"""Dedicated URL filters beyond the regex chain (F7):

- PrefixUrlFilter  (plugin/urlfilter-prefix/.../PrefixURLFilter.java):
  accept iff the url starts with any configured prefix (the reference uses
  a TrieStringMatcher; a sorted-tuple startswith is the Python analogue —
  the Spark path folds native startswith, staying in codegen).
- SuffixUrlFilter  (plugin/urlfilter-suffix/.../SuffixURLFilter.java:85-160):
  suffix list with '+'/'-' default mode and I (ignore case) / P (match the
  path only) flags; a match flips the default.
- DomainUrlFilter  (plugin/urlfilter-domain/.../DomainURLFilter.java:172-201):
  accept iff the url's public suffix, registered domain, or host appears in
  the configured set.

(The urlfilter-automaton plugin shares the regex filter's rule format and
semantics — it is a DFA-compilation speedup of the same contract, covered
here by functions.urls.RegexUrlFilter.)
"""

from __future__ import annotations

import re as _re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column, functions as F

from nutch_spark.functions.urls import (
    domain_suffix, extract_host_series, registered_domain,
)


class PrefixUrlFilter:
    def __init__(self, prefixes: list[str]):
        self.prefixes = tuple(sorted(set(prefixes)))

    def accepts(self, url: str | None) -> bool:
        return bool(url) and url.startswith(self.prefixes)

    def accepts_series(self, urls: pd.Series) -> pd.Series:
        return urls.str.startswith(self.prefixes, na=False)

    def col(self, url_col: Column) -> Column:
        expr = F.lit(False)
        for p in self.prefixes:
            expr = expr | url_col.startswith(p)
        return url_col.isNotNull() & expr


class SuffixUrlFilter:
    def __init__(self, suffixes: list[str], default_accept: bool = False,
                 ignore_case: bool = False, from_path: bool = False):
        self.ignore_case = ignore_case
        self.from_path = from_path
        self.default_accept = default_accept
        sfx = (s.lower() for s in suffixes) if ignore_case else iter(suffixes)
        self.suffixes = tuple(sorted(set(sfx)))

    @classmethod
    def from_text(cls, text: str) -> "SuffixUrlFilter":
        """conf format (SuffixURLFilter.readConfiguration): one suffix per
        line; a '+'/'-' control line sets the default mode, with optional
        I / P flags appended."""
        default_accept, ignore_case, from_path = False, False, False
        suffixes: list[str] = []
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line[0] in "+-":
                default_accept = line[0] == "+"
                flags = line[1:].upper()
                ignore_case = "I" in flags
                from_path = "P" in flags
            else:
                suffixes.append(line)
        return cls(suffixes, default_accept, ignore_case, from_path)

    # java.net.URL.getPath() mirror: LENIENT (spaces etc. parse fine; only
    # an unknown protocol throws MalformedURLException -> "don't care",
    # keep the full url). urlsplit was both too lenient (it "parses"
    # unknown schemes the reference would keep whole) and paired with a
    # native parse_url fallback that fired on DIFFERENT inputs
    # (URISyntaxException on spaces), so the two engines matched different
    # subjects for messy crawled outlinks.
    _PATH_RE = _re.compile(r"(?is)^(?:http|https|ftp|file)://[^/?#]*([^?#]*)")

    def _subject(self, url: str) -> str:
        s = url.lower() if self.ignore_case else url
        if self.from_path:
            m = self._PATH_RE.match(s)
            if m:
                s = m.group(1)
        return s

    def accepts(self, url: str | None) -> bool:
        if url is None:
            return False
        matched = self._subject(url).endswith(self.suffixes)
        return (not self.default_accept) if matched else self.default_accept

    def accepts_series(self, urls: pd.Series) -> pd.Series:
        return urls.map(self.accepts, na_action="ignore").fillna(False).astype(bool)

    def col(self, url_col: Column) -> Column:
        subject = F.lower(url_col) if self.ignore_case else url_col
        if self.from_path:
            # same java.net.URL.getPath() mirror as _subject (see above):
            # known scheme -> path segment, else the full url
            path = F.regexp_extract(subject, self._PATH_RE.pattern, 1)
            subject = F.when(
                subject.rlike(r"(?is)^(?:http|https|ftp|file)://"), path
            ).otherwise(subject)
        matched = F.lit(False)
        for s in self.suffixes:
            matched = matched | subject.endswith(s)
        accept = F.when(matched, F.lit(not self.default_accept)).otherwise(
            F.lit(self.default_accept))
        return url_col.isNotNull() & accept


class DomainUrlFilter:
    def __init__(self, entries: list[str]):
        self.entries = {e.strip().lower() for e in entries if e.strip()}

    @classmethod
    def from_text(cls, text: str):
        return cls([ln for ln in text.splitlines()
                    if ln.strip() and not ln.strip().startswith("#")])

    def _matches(self, url: str | None) -> bool | None:
        """suffix / domain / host membership, in that order
        (DomainURLFilter.java:172-192); None = unparseable/hostless url
        (the reference's exception path)."""
        if url is None:
            return None
        try:
            host = (urlsplit(url).hostname or "").lower()
        except ValueError:
            return None
        if not host:
            return None
        sfx = domain_suffix(host)
        dom = registered_domain(host)
        return (sfx in self.entries or dom in self.entries or host in self.entries)

    def accepts(self, url: str | None) -> bool:
        """Accept-on-match; unparseable urls rejected (the reference's
        exception path returns null)."""
        return bool(self._matches(url))

    def _match_series(self, urls: pd.Series) -> pd.Series:
        """Nullable boolean: True/False = membership, NaN = no host."""
        hosts = extract_host_series(urls)
        sfx = hosts.map(domain_suffix, na_action="ignore")
        dom = hosts.map(registered_domain, na_action="ignore")
        matched = sfx.isin(self.entries) | dom.isin(self.entries) | hosts.isin(self.entries)
        return matched.where(hosts.notna() & (hosts != ""), other=pd.NA)

    def accepts_series(self, urls: pd.Series) -> pd.Series:
        return self._match_series(urls).fillna(False).astype(bool)

    def udf(self):
        entries = sorted(self.entries)
        cls = type(self)

        @F.pandas_udf("boolean")
        def _accepts(urls: pd.Series) -> pd.Series:
            return cls(entries).accepts_series(urls)

        return _accepts


class DomainBlacklistUrlFilter(DomainUrlFilter):
    """Reject-on-match dual of DomainUrlFilter (plugin/
    urlfilter-domainblacklist/.../DomainBlacklistURLFilter.java:172-200):
    a url whose public suffix, registered domain, or host appears in the
    configured file (same one-entry-per-line format, suffix > domain > host
    generality) is filtered OUT. Quirk preserved: the reference's exception
    handler returns null — its comment says "allow the url to pass" but the
    code filters — so unparseable/hostless urls are rejected here too,
    matching both plugins' observable behavior."""

    def accepts_series(self, urls: pd.Series) -> pd.Series:
        m = self._match_series(urls)
        return (~m.astype("boolean")).fillna(False).astype(bool)

    def accepts(self, url: str | None) -> bool:
        m = self._matches(url)
        return False if m is None else not m


# ---------------------------------------------------------------------------
# urlfilter-validator (plugin/urlfilter-validator UrlValidator.java) — the
# commons-validator RFC-2396 syntactic gate. Exact port of the regex
# cascade, including its quirks: TLD length 2-4, overlapping "//" / ".."
# token counts (countToken advances by one char, UrlValidator.java:355-367),
# and an authority char class without "_" (AUTHORITY_CHARS, :65).
# ---------------------------------------------------------------------------


# UrlValidator.java:54-129 pattern constants
_V_SPECIAL = ";/@&=,.?:+$"
_V_ATOM = rf"[^\s{_re.escape(_V_SPECIAL)}]+"
_V_URL_RE = _re.compile(r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?")
_V_LEGAL_ASCII_RE = _re.compile(r"^[\x21-\x7E]+$")
_V_SCHEME_RE = _re.compile(r"^[a-zA-Z]+$")
_V_AUTHORITY_RE = _re.compile(r"^([a-zA-Z0-9\-\.]*)(:\d*)?(.*)?")
_V_IPV4_RE = _re.compile(r"^(\d{1,3})[.](\d{1,3})[.](\d{1,3})[.](\d{1,3})$")
_V_DOMAIN_RE = _re.compile(rf"^{_V_ATOM}(\.{_V_ATOM})*$")
_V_PORT_RE = _re.compile(r"^:(\d{1,5})$")
_V_PATH_RE = _re.compile(r"^(/[-\w:@&?=+,.!/~*'%$_;\(\)]*)?$")
_V_ALPHA_RE = _re.compile(r"^[a-zA-Z]")


def _count_token(token: str, target: str) -> int:
    """countToken (UrlValidator.java:355-367): overlapping occurrences."""
    idx = count = 0
    while True:
        idx = target.find(token, idx)
        if idx < 0:
            return count
        idx += 1
        count += 1


class UrlValidatorFilter:
    """filter(url) -> url | None; accepts() is the boolean core
    (UrlValidator.isValid, :152-184)."""

    def accepts(self, url: str | None) -> bool:
        # fullmatch, not match: Python's '$' matches BEFORE a trailing
        # newline, so 'http://a.com/\n' passed every anchored check while
        # the reference's Pattern.matches() rejects it (urls.py:84-90
        # documents this exact trap for the normalizer fast path)
        if url is None or not _V_LEGAL_ASCII_RE.fullmatch(url):
            return False
        m = _V_URL_RE.match(url)  # always matches (all groups optional)
        scheme, authority, path = m.group(2), m.group(4), m.group(5)
        # scheme (:194-200)
        if scheme is None or not _V_SCHEME_RE.fullmatch(scheme):
            return False
        # authority (:209-297)
        if authority is None:
            return False
        am = _V_AUTHORITY_RE.match(authority)
        host_ip, port, extra = am.group(1), am.group(2), am.group(3)
        ip = _V_IPV4_RE.fullmatch(host_ip)
        if ip:
            if any(int(seg) > 255 for seg in ip.groups()):
                return False
        else:
            if not _V_DOMAIN_RE.fullmatch(host_ip):
                return False
            segs = host_ip.split(".")
            top = segs[-1]
            if not (2 <= len(top) <= 4) or not _V_ALPHA_RE.match(top):
                return False
            if len(segs) < 2:
                return False
        if port is not None and not _V_PORT_RE.fullmatch(port):
            return False
        if extra is not None and extra.strip():
            return False
        # path (:319-337)
        if path is None or not _V_PATH_RE.fullmatch(path):
            return False
        slash2 = _count_token("//", path)
        slash = _count_token("/", path)
        dot2 = _count_token("..", path)
        if not (dot2 <= 0 or (slash - slash2 - 1) > dot2):
            return False
        return True  # query (QUERY_PATTERN `^(.*)$`) cannot fail post-ascii

    def accepts_series(self, urls: pd.Series) -> pd.Series:
        return urls.map(self.accepts, na_action="ignore").fillna(False).astype(bool)

    def col(self, url_col: Column) -> Column:
        """Native Catalyst mirror of accepts(): regexp_extract cascade.
        regexp_extract yields '' both for an absent group and an empty
        match — the Java null-vs-empty cases all resolve to reject for
        scheme/authority, so the collapse is semantics-preserving.
        Overlapping token counts use a lookahead replace
        (length delta of regexp_replace(x, '/(?=/)', ''))."""
        u = url_col
        url_pat = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"
        scheme = F.regexp_extract(u, url_pat, 2)
        auth = F.regexp_extract(u, url_pat, 4)
        path = F.regexp_extract(u, url_pat, 5)
        auth_pat = r"^([a-zA-Z0-9\-\.]*)(:\d*)?(.*)?"
        host_ip = F.regexp_extract(auth, auth_pat, 1)
        port = F.regexp_extract(auth, auth_pat, 2)
        extra = F.regexp_extract(auth, auth_pat, 3)

        ipv4_pat = r"^(\d{1,3})[.](\d{1,3})[.](\d{1,3})[.](\d{1,3})$"
        is_ipv4 = host_ip.rlike(ipv4_pat[:-1] + r"\z")
        octets_ok = F.lit(True)
        for i in range(1, 5):
            octets_ok = octets_ok & (
                F.regexp_extract(host_ip, ipv4_pat, i).cast("int") <= 255
            )
        atom = _V_ATOM
        is_domain = host_ip.rlike(rf"^{atom}(\.{atom})*\z")
        segs = F.split(host_ip, r"\.")
        top = F.element_at(segs, -1)
        domain_ok = (
            is_domain
            & F.length(top).between(2, 4)
            & top.rlike("^[a-zA-Z]")
            & (F.size(segs) >= 2)
        )
        host_ok = F.when(is_ipv4, octets_ok).otherwise(domain_ok)
        port_ok = (port == "") | port.rlike(r"^:\d{1,5}\z")
        extra_ok = F.trim(extra) == ""

        path_ok = path.rlike(r"^(/[-\w:@&?=+,.!/~*'%$_;\(\)]*)?\z")
        slash = F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
        slash2 = F.length(path) - F.length(F.regexp_replace(path, r"/(?=/)", ""))
        dot2 = F.length(path) - F.length(F.regexp_replace(path, r"\.(?=\.)", ""))
        dots_ok = (dot2 <= 0) | ((slash - slash2 - 1) > dot2)

        return (
            u.isNotNull()
            & u.rlike(r"^[\x21-\x7E]+\z")
            & scheme.rlike(r"^[a-zA-Z]+\z")
            & host_ok
            & port_ok
            & extra_ok
            & path_ok
            & dots_ok
        )

    def udf(self):
        @F.pandas_udf("boolean")
        def _accepts(urls: pd.Series) -> pd.Series:
            return UrlValidatorFilter().accepts_series(urls)

        return _accepts

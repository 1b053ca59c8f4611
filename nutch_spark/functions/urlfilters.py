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

    def _subject(self, url: str) -> str:
        s = url.lower() if self.ignore_case else url
        if self.from_path:
            try:
                s = urlsplit(s).path
            except ValueError:
                pass  # reference: "don't care", keep the full url
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
            subject = F.coalesce(F.parse_url(subject, F.lit("PATH")), subject)
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
    def from_text(cls, text: str) -> "DomainUrlFilter":
        return cls([ln for ln in text.splitlines()
                    if ln.strip() and not ln.strip().startswith("#")])

    def accepts(self, url: str | None) -> bool:
        """suffix / domain / host membership, in that order
        (DomainURLFilter.java:172-192)."""
        if url is None:
            return False
        try:
            host = (urlsplit(url).hostname or "").lower()
        except ValueError:
            return False
        if not host:
            return False
        sfx = domain_suffix(host)
        dom = registered_domain(host)
        return (sfx in self.entries or dom in self.entries or host in self.entries)

    def accepts_series(self, urls: pd.Series) -> pd.Series:
        hosts = extract_host_series(urls)
        sfx = hosts.map(domain_suffix, na_action="ignore")
        dom = hosts.map(registered_domain, na_action="ignore")
        return (
            sfx.isin(self.entries) | dom.isin(self.entries) | hosts.isin(self.entries)
        ).fillna(False)

    def udf(self):
        entries = sorted(self.entries)

        @F.pandas_udf("boolean")
        def _accepts(urls: pd.Series) -> pd.Series:
            return DomainUrlFilter(entries).accepts_series(urls)

        return _accepts

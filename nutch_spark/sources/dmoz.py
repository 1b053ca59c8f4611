"""DMOZ RDF seed import (SURVEY S9 — previously declared out of scope).

Reference: tools/DmozParser.java:54-400. Semantics ported:
- structure walk: `<Topic r:id="...">` opens a section; `<ExternalPage
  about="URL">` inside it is a candidate seed; `<d:Title>` fills the title
  (DmozParser.RDFProcessor.startElement:130-160);
- adult filter: sections under `Top/Adult` are skipped unless
  includeAdult (:137-139);
- topic filter: optional regex over the section id, full match (:141-143);
- subset sampling: emit only when
  `abs(hashcode(md5(url)) ^ skew) % subset_denom == 0` (:146-150) — the
  Hadoop `MD5Hash.hashCode()` (quarter-digest: first 4 md5 bytes as a
  big-endian int32) is ported exactly so a given (url, skew, denom) selects
  identically;
- invalid-character scrub: the reference wraps the stream in an
  XMLCharFilter that replaces invalid XML chars with 'X' (:54-90); the
  regex scan here is byte-tolerant so the scrub reduces to errors="replace"
  decoding.

The reference parses one giant RDF file on the driver with SAX. Spark
realization: binaryFile rows -> one regex-streaming kernel per file;
parallelism across the (many, in practice per-category) dump files, then a
normalize+filter DataFrame tail shared with the injector.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DMOZ_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("topic", T.StringType(), True),
])

_TOKEN_RE = re.compile(
    r'<Topic r:id="(?P<topic>[^"]*)"'
    r'|<ExternalPage about="(?P<url>[^"]*)"'
    r"|<d:Title>(?P<title>.*?)</d:Title>"
    r"|</ExternalPage>",
    re.S,
)


def md5_hashcode(url: str) -> int:
    """Hadoop MD5Hash.digest(url).hashCode() = quarterDigest(): the first 4
    md5 bytes as a big-endian signed int32 (DmozParser.java:146)."""
    d = hashlib.md5(url.encode("utf-8")).digest()
    v = int.from_bytes(d[:4], "big", signed=True)
    return v


def subset_selected(url: str, subset_denom: int, skew: int = 0) -> bool:
    """DmozParser.java:146-150: abs(hash ^ skew) % denom == 0. Java's
    Math.abs on int32 (abs(MIN_INT) stays MIN_INT) and int32 xor are
    reproduced with explicit wrapping."""
    if subset_denom <= 1:
        return True
    h = (md5_hashcode(url) ^ skew) & 0xFFFFFFFF
    if h >= 0x80000000:
        h -= 1 << 32
    a = h if h >= 0 else (-h if h != -(1 << 31) else h)
    return a % subset_denom == 0


def parse_dmoz_text(text: str, subset_denom: int = 1, include_adult: bool = False,
                    skew: int = 0, topic_pattern: str | None = None) -> list[dict]:
    """Streaming structure walk over one RDF document (RDFProcessor port)."""
    topic_re = re.compile(topic_pattern) if topic_pattern else None
    cur_topic: str | None = None
    cur_url: str | None = None
    cur_title: str | None = None
    out: list[dict] = []
    for m in _TOKEN_RE.finditer(text):
        if m.group("topic") is not None:
            cur_topic = m.group("topic")
        elif m.group("url") is not None:
            cur_url = None
            if cur_topic is None:
                continue
            if not include_adult and cur_topic.startswith("Top/Adult"):
                continue  # :137-139
            if topic_re is not None and not topic_re.fullmatch(cur_topic):
                continue  # :141-143 (Java matches() = full match)
            url = m.group("url")
            if not subset_selected(url, subset_denom, skew):
                continue  # :146-150
            cur_url = url
            cur_title = None
        elif m.group("title") is not None:
            if cur_url is not None:
                cur_title = m.group("title").strip()
        else:  # </ExternalPage>
            if cur_url is not None:
                out.append({"url": cur_url, "title": cur_title, "topic": cur_topic})
                cur_url = None
    return out


def read_dmoz(spark: SparkSession, path_glob: str, subset_denom: int = 1,
              include_adult: bool = False, skew: int = 0,
              topic_pattern: str | None = None) -> DataFrame:
    """DMOZ RDF files -> (url, title, topic) seed rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for data in pdf["content"]:
                text = bytes(data).decode("utf-8", errors="replace")
                rows.extend(parse_dmoz_text(
                    text, subset_denom, include_adult, skew, topic_pattern
                ))
            if rows:
                yield pd.DataFrame(rows, columns=["url", "title", "topic"])

    files = spark.read.format("binaryFile").load(path_glob).select("content")
    return files.mapInPandas(kernel, DMOZ_SCHEMA)


def dmoz_seeds(records: DataFrame, default_score: float = 1.0) -> DataFrame:
    """Seed rows for the injector (DmozParser main's output is a plain seed
    list consumed by Injector; score rides the nutch.score convention)."""
    from pyspark.sql import functions as F

    return records.select(
        "url",
        F.lit(default_score).alias("score"),
        F.create_map(
            F.lit("dmoz.topic"), F.coalesce(F.col("topic"), F.lit("")),
        ).alias("metadata"),
    )

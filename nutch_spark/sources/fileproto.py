"""protocol-file: a REAL (non-simulated) fetch protocol for file:// URLs.

Reference: plugin/protocol-file — FileResponse.java:60-295 (status walk,
directory listing, content-limit truncation), File.java:70-95 (redirect
loop + code → status conversion). Unlike http (no network in this
sandbox, S10 is a sanctioned simulation), file:// is fully realizable:
the kernel opens paths on the EXECUTORS, which at cluster scale is
exactly how a distributed file protocol works — every executor mounts
the same shared filesystem, and the fetchlist's politeness partitioning
spreads the reads.

Status walk, reference-exact (FileResponse.java:125-160):
  missing            -> 404  (FETCH_GONE)
  unreadable         -> 401  (FETCH_GONE)
  non-canonical path -> 300 + Location: canonical file URI (FETCH_REDIR_PERM;
                        the caller's redirect handling follows it, matching
                        File.java's bounded redirect loop)
  mtime <= datum.modified_time -> 304 (FETCH_NOTMODIFIED) + Last-Modified
  directory          -> 200, text/html listing (list2html:257-292 format,
                        '../' entry gated on file.crawl.parent)
  regular file       -> 200, bytes truncated at file.content.limit
                        (Content-Length header keeps the FULL size,
                        :186-197), MIME from the url/extension map
"""

from __future__ import annotations

import os
import re
from email.utils import formatdate
from typing import Iterator
from urllib.parse import unquote, urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.functions.content import resolve_content_type

FILE_FETCH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("code", T.IntegerType(), False),
    T.StructField("fetch_status", T.IntegerType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("content_length", T.LongType(), True),
    T.StructField("last_modified_ms", T.LongType(), True),
    T.StructField("redirect_to", T.StringType(), True),
    T.StructField("truncated", T.BooleanType(), False),
])

_CODE_TO_STATUS = {
    200: schemas.STATUS_FETCH_SUCCESS,
    300: schemas.STATUS_FETCH_REDIR_PERM,
    304: schemas.STATUS_FETCH_NOTMODIFIED,
    401: schemas.STATUS_FETCH_GONE,
    404: schemas.STATUS_FETCH_GONE,
    500: schemas.STATUS_FETCH_GONE,
}


_SLASHES = re.compile("/+")


def _http_date(mtime_s: float) -> str:
    return formatdate(mtime_s, usegmt=True)


def _list2html(path: str, include_dotdot: bool) -> bytes:
    """Directory listing (FileResponse.list2html:257-292, format verbatim:
    '<a href='name'>name</a>\\ttime\\tsize', dirs get a trailing slash and
    '-' size; os.listdir order matches the reference's unsorted
    File.listFiles note)."""
    x = ["<html><head>", f"<title>Index of {path}</title></head>\n",
         f"<body><h1>Index of {path}</h1><pre>\n"]
    if include_dotdot:
        x.append("<a href='../'>../</a>\t-\t-\t-\n")
    for name in os.listdir(path):
        f = os.path.join(path, name)
        try:
            time = _http_date(os.path.getmtime(f))
            if os.path.isdir(f):
                x.append(f"<a href='{name}/'>{name}/</a>\t{time}\t-\n")
            elif os.path.isfile(f):
                x.append(
                    f"<a href='{name}'>{name}</a>\t{time}\t{os.path.getsize(f)}\n")
            # anything else: ignored (:287)
        except OSError:
            # entry vanished between listdir and stat — skip it, like the
            # mtime race above (getsize/isfile race the same way)
            continue
    x.append("</pre></body></html>\n")
    return "".join(x).encode()


def _fetch_one(url: str, modified_time: int, cfg: CrawlConfig) -> dict:
    out = {"url": url, "content": None, "content_type": None,
           "content_length": None, "last_modified_ms": None,
           "redirect_to": None, "truncated": False}

    def done(code: int) -> dict:
        out["code"] = code
        out["fetch_status"] = _CODE_TO_STATUS.get(
            code, schemas.STATUS_FETCH_GONE)
        return out

    parsed = urlparse(url)
    if parsed.scheme != "file":
        return done(500)
    path = unquote(parsed.path) or "/"
    # every stat/read below can race the filesystem (a file deleted or
    # chmod'd between checks); the reference converts those exceptions to
    # a per-url failure status (File.java:96-98 ProtocolStatus(e)) rather
    # than failing the job, so one vanishing file can't abort a fetch
    # stage over millions of urls
    try:
        if not os.path.exists(path):
            return done(404)
        if not os.access(path, os.R_OK):
            return done(401)
        # FileResponse.java:152: compares the RAW decoded path against the
        # canonical one (java.io.File only strips repeated/trailing
        # separators), so '..'/symlink spellings redirect to ONE canonical
        # URL instead of the same file entering the frontier under many
        # names. normpath here would itself collapse '..' and hide the
        # difference.
        raw = _SLASHES.sub("/", path)
        if len(raw) > 1:
            raw = raw.rstrip("/")
        real = os.path.realpath(raw)
        if real != raw:
            # FileResponse.java:146-162: non-canonical -> 300 + canonical
            out["redirect_to"] = "file://" + real
            return done(300)
        mtime = os.path.getmtime(path)
        out["last_modified_ms"] = int(mtime * 1000)
        if modified_time and int(mtime * 1000) <= modified_time:
            return done(304)  # :152-156
        if os.path.isdir(path):
            body = _list2html(
                path,
                include_dotdot=cfg.file_crawl_parent and path != "/",
            )
            out["content"] = body
            out["content_type"] = "text/html"
            out["content_length"] = len(body)
            return done(200)
        if not os.path.isfile(path):
            return done(500)  # :162-164 (device/pipe/…)
        size = os.path.getsize(path)
        limit = cfg.file_content_limit
        n = size if limit < 0 else min(size, limit)
        with open(path, "rb") as fh:
            out["content"] = fh.read(n)
    except FileNotFoundError:
        return done(404)
    except PermissionError:
        return done(401)
    except OSError:
        return done(500)
    out["truncated"] = n < size
    out["content_length"] = size  # full size, like the header (:215)
    out["content_type"] = resolve_content_type(None, url, out["content"])
    return done(200)


def fetch_file_protocol(fetchlist: DataFrame, cfg: CrawlConfig | None = None) -> DataFrame:
    """fetchlist(url[, modified_time]) with file:// urls -> fetch rows.

    mapInPandas kernel: each executor opens its partition's paths directly
    (shared filesystem at cluster scale). Non-file schemes come back 500 —
    callers route urls to protocols by scheme, like ProtocolFactory."""
    cfg = cfg or CrawlConfig()
    has_mt = "modified_time" in fetchlist.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FILE_FETCH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                mt = int(r["modified_time"]) if has_mt and pd.notna(
                    r.get("modified_time")) else 0
                rows.append(_fetch_one(str(r["url"]), mt, cfg))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    sel = ["url"] + (["modified_time"] if has_mt else [])
    return fetchlist.select(*sel).mapInPandas(kernel, FILE_FETCH_SCHEMA)

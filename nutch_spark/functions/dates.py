"""HTTP date handling (C12; reference: net/protocols/HttpDateFormat.java:37
'EEE, dd MMM yyyy HH:mm:ss zzz' in Locale.US, GMT).

Formatting is a vectorized pandas strftime (session-timezone-independent);
parsing is lenient multi-format (dateutil via pandas), mirroring the
reference's tolerant header parsing. Scalar twins serve tests/driver code.
"""

from __future__ import annotations

from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

_FMT = "%a, %d %b %Y %H:%M:%S GMT"


def http_date_format(ts_ms: int | None) -> str | None:
    if ts_ms is None:
        return None
    return datetime.fromtimestamp(ts_ms / 1000.0, tz=timezone.utc).strftime(_FMT)


def http_date_parse(s: str | None) -> int | None:
    """Lenient parse -> epoch ms (None on failure). RFC-822 forms take the
    email.utils.parsedate_to_datetime fast path (pandas' per-string
    to_datetime costs ~1 ms of format guessing — x10^5 feed pubDates that
    was a wall; strptime %a/%b would be LC_TIME-locale-dependent, this
    parser's month/day tables are not); anything else falls back to the
    lenient pandas parse. Naive results are UTC, matching utc=True below."""
    if not s:
        return None
    try:
        dt = parsedate_to_datetime(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    except (ValueError, TypeError, IndexError):
        pass
    t = pd.to_datetime(s, utc=True, errors="coerce")
    if pd.isna(t):
        return None
    return int(t.value // 1_000_000)


@F.pandas_udf(StringType())
def http_date_format_udf(ts_ms: pd.Series) -> pd.Series:
    t = pd.to_datetime(ts_ms, unit="ms", utc=True)
    return t.dt.strftime(_FMT)


@F.pandas_udf(LongType())
def http_date_parse_udf(dates: pd.Series) -> pd.Series:
    t = pd.to_datetime(dates, utc=True, errors="coerce", format="mixed")
    return pd.Series(
        [None if pd.isna(x) else int(x.value // 1_000_000) for x in t],
        index=dates.index, dtype="object",
    )

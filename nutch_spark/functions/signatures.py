"""Content signatures: MD5 and TextProfile.

Reference semantics:
- MD5Signature (crawl/MD5Signature.java:33-37): md5 of raw content bytes.
  Hot path uses the built-in `F.md5` (JVM, codegen).
- TextProfileSignature (crawl/TextProfileSignature.java:40-170): token
  frequency profile, quantized, sorted by decreasing frequency, md5 of the
  "token cnt" lines — near-duplicate-tolerant digest. Implemented as a
  pandas-vectorized kernel (Arrow batches), with tie-order fixed to
  (freq desc, token asc) for cross-run determinism (the reference's sort is
  not stable across JVM hash iteration; we pin a total order).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_NON_ALNUM = re.compile(r"[^0-9a-z]+")


def text_profile_signature(text: str | None, min_token_len: int = 2, quant_rate: float = 0.01) -> str | None:
    """min_token_len / quant_rate mirror db.signature.text_profile.*
    (TextProfileSignature.java:67-68)."""
    if text is None or len(text) == 0:
        return None
    tokens: dict[str, int] = {}
    max_freq = 0
    for tok in _NON_ALNUM.split(text.lower()):
        if len(tok) > min_token_len:
            c = tokens.get(tok, 0) + 1
            tokens[tok] = c
            if c > max_freq:
                max_freq = c
    # Math.round(maxFreq * QUANT_RATE) in FLOAT32 (TextProfileSignature.java:
    # 111): floor(f32(maxFreq * f32(rate)) + 0.5f) — Python's banker's round
    # over float64 diverges (e.g. maxFreq=350, rate=0.01: Java 3, round() 4)
    quant = int(np.floor(
        np.float32(np.float32(max_freq) * np.float32(quant_rate))
        + np.float32(0.5)))
    if quant < 2:
        quant = 2 if max_freq > 1 else 1
    profile = []
    for tok, cnt in tokens.items():
        cnt = (cnt // quant) * quant
        if cnt >= quant:
            profile.append((tok, cnt))
    profile.sort(key=lambda t: (-t[1], t[0]))
    prof_text = "\n".join(f"{tok} {cnt}" for tok, cnt in profile)
    return hashlib.md5(prof_text.encode("utf-8")).hexdigest()


@F.pandas_udf(StringType())
def text_profile_signature_udf(texts: pd.Series) -> pd.Series:
    return texts.map(text_profile_signature)


def make_text_profile_udf(min_token_len: int = 2, quant_rate: float = 0.01):
    """Parameterized variant carrying db.signature.text_profile.min_token_len
    / .quant_rate (TextProfileSignature.java:67-68)."""

    @F.pandas_udf(StringType())
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: text_profile_signature(t, min_token_len, quant_rate))

    return _udf


def md5_signature_col(content_col):
    """MD5 content signature, JVM-side (crawl/MD5Signature.java:33-37)."""
    return F.md5(content_col.cast("string"))

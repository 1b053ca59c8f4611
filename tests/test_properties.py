"""Property-based tests (hypothesis) over the pure-Python scalar kernels.

These pin INVARIANTS rather than examples — the fixture-port suites
(test_urls.py, test_robots_parser.py, …) pin the reference's exact case
tables; here we assert the algebraic properties those implementations must
hold under arbitrary inputs:

- BasicURLNormalizer is idempotent, and the vectorized fast-path detector
  (urls._FAST_OK_RE / _NEEDS_WORK_RE — the invariant normalize_inline's
  split relies on to skip Python for already-normal rows) is SOUND: any URL
  it classifies as normal is a fixpoint of the exact scalar path.
- fetch_order_hash (the byte-reversed 31-hash, urls.py:337) matches an
  independent plain-int int32 reimplementation — cross-checks the numpy
  overflow semantics against Java's.
- TextProfileSignature is token-order invariant (the profile is a bag).
- simhash_band_bounds partitions the 64 bits and satisfies the pigeonhole
  guarantee: flipping <= max_hamming bits always leaves >= 1 band intact.
- unzip_best_effort inverts gzip; inflate_best_effort inverts zlib/raw.
- http_date_parse inverts RFC-822 formatting (locale-independent path).
- SpellCheckedMetadata header normalization is idempotent.
- choose_repr_url always returns one of its two inputs.
- robots single-stanza parse: is_allowed == not path.startswith(prefix).
"""

import gzip
import zlib
from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st

from nutch_spark.functions.content import normalize_header_name, unzip_best_effort
from nutch_spark.functions.dates import http_date_parse
from nutch_spark.functions.robots import parse_robots_txt
from nutch_spark.functions.signatures import text_profile_signature
from nutch_spark.functions.urls import (
    _FAST_OK_RE, _NEEDS_WORK_RE, choose_repr_url, fetch_order_hash,
    normalize_url,
)
from nutch_spark.operators.dedup import simhash_band_bounds

# --- URL strategies ---------------------------------------------------------

_host_label = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,8}[a-z0-9])?", fullmatch=True)
_hosts = st.lists(_host_label, min_size=1, max_size=4).map(".".join)
_path_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
             "-._~!$&'()*+,;=:@/%. ",
    max_size=40,
)
_messy_urls = st.builds(
    lambda scheme, host, port, path, query, frag: (
        f"{scheme}://{host}{port}{path}{query}{frag}"
    ),
    st.sampled_from(["http", "HTTP", "https", "Https", "ftp"]),
    st.builds(lambda h, dot: h + dot, _hosts, st.sampled_from(["", "."])),
    st.sampled_from(["", ":80", ":443", ":8080", ":21"]),
    st.builds(
        lambda segs, trail: "/" + "/".join(segs) + trail if segs else trail,
        st.lists(st.sampled_from(
            ["a", "b", "x1", ".", "..", "", "idx.html", "A%20B"]), max_size=5),
        st.sampled_from(["", "/"]),
    ),
    st.sampled_from(["", "?", "?k=v", "?a=1&b=2"]),
    st.sampled_from(["", "#", "#frag"]),
)


@given(_messy_urls)
@settings(max_examples=300, deadline=None)
def test_normalize_url_idempotent(url):
    n1 = normalize_url(url)
    if n1 is not None:
        assert normalize_url(n1) == n1


@given(_messy_urls)
@settings(max_examples=300, deadline=None)
def test_fast_path_detector_sound(url):
    # the vectorized skip (urls.normalize_inline / is_normal_form_col) may
    # only claim "already normal" for true fixpoints of the scalar path
    if _FAST_OK_RE.fullmatch(url) and not _NEEDS_WORK_RE.search(url):
        assert normalize_url(url) == url


# --- fetch order hash vs independent int32 reimplementation ------------------

def _java_hash_int(url: str) -> int:
    h = 1
    for b in reversed(url.encode("utf-8")):
        signed = b - 256 if b > 127 else b
        h = (31 * h + signed) & 0xFFFFFFFF
        if h >= 1 << 31:  # wrap to signed int32 like Java overflow
            h -= 1 << 32
        h &= 0xFFFFFFFF  # keep the loop in unsigned space
    return h - (1 << 32) if h >= 1 << 31 else h


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_fetch_order_hash_matches_plain_int32(url):
    assert fetch_order_hash(url) == _java_hash_int(url)


# --- TextProfileSignature bag semantics --------------------------------------

@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "ee", "ffff"]),
             min_size=1, max_size=30),
    st.randoms(use_true_random=False),
)
@settings(max_examples=200, deadline=None)
def test_text_profile_signature_order_invariant(tokens, rng):
    shuffled = list(tokens)
    rng.shuffle(shuffled)
    assert text_profile_signature(" ".join(tokens)) == \
        text_profile_signature(" ".join(shuffled))


# --- SimHash banding pigeonhole ----------------------------------------------

@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.integers(min_value=0, max_value=8),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_simhash_banding_pigeonhole(sig, max_hamming, data):
    bounds = simhash_band_bounds(max_hamming)
    # bounds partition the 64 bits exactly
    assert sum(w for _, w in bounds) == 64
    assert [s for s, _ in bounds] == [
        sum(w for _, w in bounds[:i]) for i in range(len(bounds))]
    # flip <= max_hamming distinct bits: at least one band must stay equal
    n_flip = data.draw(st.integers(min_value=0, max_value=max_hamming))
    bits = data.draw(st.lists(
        st.integers(min_value=0, max_value=63),
        min_size=n_flip, max_size=n_flip, unique=True))
    other = sig
    for b in bits:
        other ^= 1 << b
    intact = [
        (sig >> s) & ((1 << w) - 1) == (other >> s) & ((1 << w) - 1)
        for s, w in bounds
    ]
    assert any(intact)


# --- gzip / deflate best-effort roundtrip ------------------------------------

@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_unzip_roundtrip_gzip(data):
    assert unzip_best_effort(gzip.compress(data)) == data


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_inflate_roundtrip_zlib_and_raw(data):
    from nutch_spark.functions.content import inflate_best_effort

    assert inflate_best_effort(zlib.compress(data)) == data
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    assert inflate_best_effort(
        raw.compress(data) + raw.flush()) == data


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_unzip_garbage_never_raises(data):
    out = unzip_best_effort(data)
    assert out is None or isinstance(out, bytes)


# --- HTTP date roundtrip ------------------------------------------------------

@given(st.integers(min_value=0, max_value=4_102_444_800))  # 1970..2100
@settings(max_examples=200, deadline=None)
def test_http_date_roundtrip_rfc822(epoch_s):
    from email.utils import format_datetime

    dt = datetime.fromtimestamp(epoch_s, tz=timezone.utc)
    assert http_date_parse(format_datetime(dt, usegmt=True)) == epoch_s * 1000


# --- header-name spellcheck idempotence --------------------------------------

@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_header_normalize_idempotent(name):
    once = normalize_header_name(name)
    assert normalize_header_name(once) == once


# --- chooseRepr closure -------------------------------------------------------

@given(
    st.builds(lambda h, p: f"http://{h}/{p}", _hosts, _path_chars),
    st.builds(lambda h, p: f"http://{h}/{p}", _hosts, _path_chars),
    st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_choose_repr_returns_an_input(src, dst, temp):
    assert choose_repr_url(src, dst, temp) in (src, dst)


# --- vectorized kernels == scalar kernels, elementwise ------------------------
# The pandas series kernels are the PRODUCTION hot path (Arrow UDF bodies);
# the scalar forms are the reference-parity ports. Any divergence is a bug
# in the vectorization, so pin elementwise equality over arbitrary batches.

@given(st.lists(st.one_of(_messy_urls, st.none(),
                          st.text(max_size=20)), max_size=25))
@settings(max_examples=150, deadline=None)
def test_normalize_series_matches_scalar(urls):
    import pandas as pd

    from nutch_spark.functions.urls import normalize_url_series

    s = pd.Series(urls, dtype="object")
    got = normalize_url_series(s)
    want = s.map(lambda u: normalize_url(u) if isinstance(u, str) else None)
    assert list(got.where(got.notna(), None)) == \
        list(want.where(want.notna(), None))


@given(st.lists(st.one_of(st.text(max_size=40), st.none()), max_size=25))
@settings(max_examples=150, deadline=None)
def test_fetch_order_hash_series_matches_scalar(urls):
    import pandas as pd

    from nutch_spark.functions.urls import fetch_order_hash_series

    s = pd.Series(urls, dtype="object")
    got = list(fetch_order_hash_series(s))
    want = [fetch_order_hash(u) if isinstance(u, str) else None for u in urls]
    assert got == want


@given(st.lists(st.one_of(_messy_urls, st.none()), max_size=25))
@settings(max_examples=150, deadline=None)
def test_extract_host_series_matches_scalar(urls):
    import pandas as pd

    from nutch_spark.functions.urls import extract_host, extract_host_series

    s = pd.Series(urls, dtype="object")
    got = list(extract_host_series(s).where(lambda x: x.notna(), None))
    want = [extract_host(u) if isinstance(u, str) else None for u in urls]
    assert got == want


# --- robots single-stanza semantics -------------------------------------------

_plain_path = st.from_regex(r"/[a-z0-9/_-]{0,20}", fullmatch=True)


@given(_plain_path, _plain_path)
@settings(max_examples=300, deadline=None)
def test_robots_single_disallow_is_prefix_match(rule_path, probe):
    rules = parse_robots_txt(
        f"User-agent: *\nDisallow: {rule_path}\n", ("nutch",))
    assert rules.is_allowed(probe) == (not probe.startswith(rule_path))


@given(_plain_path)
@settings(max_examples=100, deadline=None)
def test_robots_empty_disallow_allows_all(probe):
    rules = parse_robots_txt("User-agent: *\nDisallow:\n", ("nutch",))
    assert rules.is_allowed(probe)

"""TestHostURLNormalizer / TestPassURLNormalizer / TestURLNormalizers
ports (plugin/urlnormalizer-host/src/test, plugin/urlnormalizer-pass/
src/test, src/test/org/apache/nutch/net/TestURLNormalizers.java).

The hosts table is the plugin's sample data verbatim
(plugin/urlnormalizer-host/data/hosts.txt)."""

from pyspark.sql import functions as F

from nutch_spark.functions.normalizers import (
    HostAliasNormalizer,
    ScopedNormalizers,
)

# plugin/urlnormalizer-host/data/hosts.txt, verbatim
HOSTS_TXT = """\
# Force all sub domains to www.
*.example.com example.com

# Force no sub domain to www. URL's
www.example.net example.net

# Force www. sub domain when hitting link without sub domain
example.org www.example.org
"""

# TestHostURLNormalizer.java:33-50 — the five assertions verbatim
HOST_CASES = [
    ("http://example.org/page.html", "http://www.example.org/page.html"),
    ("http://www.example.net/path/to/something.html",
     "http://example.net/path/to/something.html"),
    ("http://example.com/?does=it&still=work",
     "http://example.com/?does=it&still=work"),
    ("http://http.www.example.com/buh", "http://example.com/buh"),
    ("http://whatever.example.com/blaat", "http://example.com/blaat"),
]


def test_host_normalizer_scalar():
    n = HostAliasNormalizer.from_text(HOSTS_TXT)
    for url, want in HOST_CASES:
        assert n.normalize(url) == want, url


def test_host_normalizer_columnar(spark):
    n = HostAliasNormalizer.from_text(HOSTS_TXT)
    df = spark.createDataFrame([(u,) for u, _ in HOST_CASES], "url string")
    got = [r["out"] for r in df.select(n.col(F.col("url")).alias("out")).collect()]
    assert got == [w for _, w in HOST_CASES]


def test_pass_normalizer_identity():
    # TestPassURLNormalizer.java:33-45 — the pass plugin returns its input
    # unchanged, even for a path a resolving normalizer would rewrite. The
    # chain's identity element here is an empty host-alias table.
    url = "http://www.example.com/test/..//"
    assert HostAliasNormalizer().normalize(url) == url


def test_chain_superfluous_slashes(spark):
    # TestURLNormalizers.java:43-49 (NUTCH-1011) — the default chain strips
    # superfluous path slashes
    chain = ScopedNormalizers()
    assert (chain.normalize("http://www.example.com//path/to//somewhere.html")
            == "http://www.example.com/path/to/somewhere.html")


def test_chain_with_host_rules(spark):
    # TestURLNormalizers.java:52-57 (NUTCH-1319) — slash cleanup + the
    # hosts-table rewrite compose in one chain pass
    chain = ScopedNormalizers(
        host_aliases={"example.org": "www.example.org"})
    assert (chain.normalize("http://example.org//path/to//somewhere.html")
            == "http://www.example.org/path/to/somewhere.html")


def test_host_alias_first_match_col_equals_scalar(spark):
    """Overlapping alias rules: the scalar path resolves ONE first-match
    target; the native when-chain must too — a sequential regexp_replace
    chain once re-rewrote the rewritten host through a later wildcard rule
    ('www.a.com'->'a.com' then '*.a.com'->'canonical.a.com'), so the
    distributed and driver paths produced different dedup keys."""
    from pyspark.sql import functions as F

    from nutch_spark.functions.normalizers import HostAliasNormalizer

    n = HostAliasNormalizer({"www.a.com": "a.com",
                             "*.a.com": "canonical.a.com"})
    urls = ["http://www.a.com/x", "http://sub.a.com/y", "http://b.com/z",
            "http://WWW.A.COM/u:8080/p"]
    want = [n.normalize(u) for u in urls]
    assert want[0] == "http://a.com/x"            # exact wins, ONE rewrite
    assert want[1] == "http://canonical.a.com/y"  # wildcard
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.o for r in df.select(n.col(F.col("url")).alias("o")).collect()]
    assert got == want

"""byIP politeness partitioning + ResolveUrls analogue.

Reference: crawl/URLPartitioner.java:79-86 — PARTITION_MODE_IP hashes the
resolved host address, and UnknownHostException falls back to the host hash
already computed — and tools/ResolveUrls.java (the bulk resolver
diagnostic, a thread pool over a URL list).

This sandbox has no DNS, and a real cluster should not resolve 10^8 distinct
hosts inline inside the generate job either (the reference's per-record
InetAddress.getByName is the classic byIP scale trap: one blocking lookup
per reduce record). So the resolver is an injectable (host, ip) mapping
TABLE — in production a periodically refreshed resolution table built by a
batched resolver job and stored bucketed by host; in tests a deterministic
fixture. Unresolved hosts (left-join miss → null ip) keep the host string as
the politeness key, exactly the reference's UnknownHostException path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def politeness_key_expr(resolved: bool):
    """Key the partitioner hashes: resolved address if present, else host
    (URLPartitioner.java:79-86 fallback semantics)."""
    return F.coalesce(F.col("ip"), F.col("host")) if resolved else F.col("host")


def with_resolved_keys(df: DataFrame, resolver: DataFrame | None) -> DataFrame:
    """Attach `pkey` (politeness/partition key) to a host-bearing frame.

    The join is a plain host-equi join: at 10^10 URLs the resolver table is
    ~|distinct hosts| (orders of magnitude smaller than the frontier but far
    beyond broadcast size), so both sides hash on host — callers that know
    the resolver is small can pass F.broadcast(resolver). Missing hosts keep
    ip NULL and fall back to the host key.
    """
    if resolver is None:
        return df.withColumn("pkey", F.col("host"))
    res = resolver.select("host", "ip")
    out = df.join(res, "host", "left")
    return out.withColumn("pkey", politeness_key_expr(True)).drop("ip")


def resolve_urls(urls: DataFrame, resolver: DataFrame | None,
                 url_col: str = "url") -> DataFrame:
    """ResolveUrls analogue (tools/ResolveUrls.java): per-URL resolution
    report — url, host, ip, resolved — as a DataFrame instead of log lines."""
    from nutch_spark.functions.urls import host_col

    df = urls.select(F.col(url_col).alias("url"))
    df = df.withColumn("host", host_col(F.col("url")))
    if resolver is None:
        return df.withColumn("ip", F.lit(None).cast("string")).withColumn(
            "resolved", F.lit(False))
    return (
        df.join(resolver.select("host", "ip"), "host", "left")
        .withColumn("resolved", F.col("ip").isNotNull())
        .select("url", "host", "ip", "resolved")
    )


def fake_resolver(hosts: DataFrame, coverage_hex_lt: str = "c") -> DataFrame:
    """Deterministic resolver fixture for tests/benches (no DNS in sandbox):
    hosts whose md5 leading nibble is < `coverage_hex_lt` (~75% at 'c')
    resolve to 'ip-' + md5(host)[:8]; the rest stay unresolved to exercise
    the host-fallback path. Portable across engines (md5 over UTF-8 in both
    Spark and DuckDB) so oracle SQL can reproduce it exactly.
    """
    h = hosts.select("host").distinct()
    return h.withColumn(
        "ip",
        F.when(
            F.substring(F.md5(F.col("host")), 1, 1) < F.lit(coverage_hex_lt),
            F.concat(F.lit("ip-"), F.substring(F.md5(F.col("host")), 1, 8)),
        ),
    )

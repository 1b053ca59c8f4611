"""Generator: frontier -> fetchlist (the frontier priority queue).

Reference semantics (crawl/Generator.java):
- gates (:174-218): due-for-fetch (fetchTime <= curTime), re-generate delay
  (crawl.gen.delay via the _ngt_ metadata key), min-score, min-interval.
- priority (:202-209 + scoring/opic/OPICScoringFilter.java:85-87):
  sort value = score.
- topN is per-reducer: limit = topN / numReduceTasks (:141), selection stops
  at `limit` per partition (:235-247) — reproduced exactly as a window rank
  within partition_id, NOT a global orderBy (which wouldn't scale anyway).
- per-host/domain cap (:277-313): generate.max.count per host, overflow
  spilling to up to maxNumSegments segments.
- politeness partitioning (crawl/URLPartitioner.java:36-93): partition by
  hash(host) ^ seed so one host lands in exactly one partition.
- intra-partition order (:369-398): byte-reversed 31-hash of the URL so
  same-host URLs spread apart inside a partition.

Scale design: the two selection windows are salted two-phase (rank within
(partition, salt) keeping a superset, then final rank within partition) so a
mega-host frontier partition never single-threads a giant sort buffer —
north_rule P5. Semantics identical; only the physical plan changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.functions.urls import domain_udf, fetch_order_hash_udf

GENERATE_TIME_KEY = "_ngt_"  # crawl/Generator.java:64


def partition_expr(key_col, cfg: CrawlConfig):
    """URLPartitioner analogue: pmod(hash(key) xor seed, n)."""
    return F.pmod(
        F.hash(key_col).bitwiseXOR(F.lit(cfg.partition_seed)), F.lit(cfg.num_partitions)
    ).cast("int")


def select_due(frontier: DataFrame, cfg: CrawlConfig, cur_time_ms: int) -> DataFrame:
    """Generator gate predicates F9/F10 — plain Catalyst predicates so they
    push down to the frontier scan (partition pruning on `status` at scale)."""
    df = frontier
    # shouldFetch (AbstractFetchSchedule.java:168-185): a fetchTime more
    # than db.fetch.interval.max remote is pulled to now, and an interval
    # beyond the max is shrunk to max*0.9 so the page fits the segment
    # retention period
    max_iv = cfg.db_fetch_interval_max
    too_remote = (F.col("fetch_time") - F.lit(cur_time_ms)) > F.lit(max_iv * 1000)
    df = df.withColumn(
        "fetch_interval",
        F.when(
            too_remote & (F.col("fetch_interval") > max_iv),
            F.lit(int(max_iv * 0.9)),
        ).otherwise(F.col("fetch_interval")),
    ).withColumn(
        "fetch_time",
        F.when(too_remote, F.lit(cur_time_ms)).otherwise(F.col("fetch_time")),
    )
    df = df.filter(F.col("fetch_time") <= F.lit(cur_time_ms))
    # fetchable db statuses only (skip gone/redirects which Generator skips via
    # shouldFetch == false semantics; unfetched/fetched/notmodified are eligible)
    df = df.filter(
        F.col("status").isin(
            schemas.STATUS_DB_UNFETCHED,
            schemas.STATUS_DB_FETCHED,
            schemas.STATUS_DB_NOTMODIFIED,
        )
    )
    # re-generate delay (crawl.gen.delay, Generator.java:195-201)
    gen_time = F.element_at(F.col("metadata"), GENERATE_TIME_KEY).cast("long")
    df = df.filter(
        gen_time.isNull() | (gen_time + F.lit(cfg.gen_delay_ms) <= F.lit(cur_time_ms))
    )
    if cfg.gen_min_score > 0:
        df = df.filter(F.col("score") >= cfg.gen_min_score)
    if cfg.gen_min_interval > 0:
        df = df.filter(F.col("fetch_interval") >= cfg.gen_min_interval)
    return df


def generate(frontier: DataFrame, cfg: CrawlConfig, cur_time_ms: int,
             resolver: DataFrame | None = None) -> DataFrame:
    """Produce the fetchlist: due rows, topN per partition, host caps,
    politeness partitioning, hash-ordered within partition."""
    due = select_due(frontier, cfg, cur_time_ms)

    # byDomain mode (URLPartitioner.java:36-93 PARTITION_MODE_DOMAIN):
    # derive the registered domain once. byIP (URLPartitioner.java:79-86)
    # keys on the resolved address from an injectable (host, ip) resolver
    # table (operators/resolve.py — no DNS here, and per-record lookups
    # would not scale anyway); unresolved or resolver-less rows fall back
    # to host, the reference's UnknownHostException path.
    needs_domain = "byDomain" in (cfg.partition_mode, cfg.gen_count_mode)
    if needs_domain and "domain" not in due.columns:
        due = due.withColumn("domain", domain_udf(F.col("url")))
    if cfg.partition_mode == "byIP" and resolver is not None:
        from nutch_spark.operators.resolve import with_resolved_keys

        due = with_resolved_keys(due, resolver)
        key = F.col("pkey")
    else:
        if cfg.partition_mode == "byIP":
            import warnings

            warnings.warn(
                "partition_mode='byIP' with no resolver table: falling "
                "back to byHost (pass resolver= to generate()/CrawlDriver)",
                stacklevel=2)
        key = F.col(cfg.politeness_key) if cfg.politeness_key in due.columns else F.col("host")
    df = due.withColumn("partition_id", partition_expr(key, cfg))

    limit = max(1, cfg.topn // cfg.num_partitions)  # Generator.java:141

    if cfg.gen_max_count > 0:
        # --- cap-aware salted prefilter (G2/G3/G4/G5 + P5 skew defense) ---
        # A url-hash salt here is WRONG under the host cap: a mega-host
        # whose rows top every salt's score order crowds other hosts out
        # of the phase-1 supersets, yet the cap later demotes most of the
        # mega-host rows to higher segments — segment 1 comes out
        # under-filled vs the reference walk (rows it should emit were
        # pre-dropped). Salting by the CAP KEY keeps each host whole in
        # one salt, so host_rank and segnum computed inside the salt are
        # GLOBALLY exact; the per-(salt, segnum) topN is then an exact
        # prefilter for the final per-(partition, segnum) topN: if any
        # dropped segment-peer outscored a row, its salt necessarily
        # retained `limit` rows above that row, so the final rank filter
        # reaches the same verdict the unsalted walk would. Skew stays
        # bounded: every rank filter is a WindowGroupLimit (top-K heap per
        # group, K = allowance or limit), never a full group sort.
        kcol = F.col("domain") if cfg.gen_count_mode == "byDomain" else F.col("host")
        allowance = cfg.gen_max_count * cfg.gen_max_num_segments
        salt = F.pmod(F.xxhash64(kcol), F.lit(cfg.salt_buckets))
        order = [F.desc("score"), F.asc("url")]
        w_cap = Window.partitionBy("partition_id", "salt", kcol).orderBy(*order)
        w_seg = Window.partitionBy("partition_id", "salt", "segnum").orderBy(*order)
        df = (
            df.withColumn("salt", salt)
            .withColumn("host_rank", F.row_number().over(w_cap))
            .filter(F.col("host_rank") <= allowance)
            .withColumn(
                "segnum",
                (((F.col("host_rank") - 1) / cfg.gen_max_count) + 1).cast("int"),
            )
            .withColumn("seg_rank", F.row_number().over(w_seg))
            .filter(F.col("seg_rank") <= limit)
            .drop("salt", "host_rank", "seg_rank")
        )
        # final per-(partition, segment) topN — NO re-cap: host_rank/segnum
        # above are already global-exact (host-complete salts), and
        # recomputing them on the topN survivors would shift ranks
    else:
        # --- salted two-phase per-partition topN (no cap: plain G3) ---
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets))
        w_salt = Window.partitionBy("partition_id", "salt").orderBy(
            F.desc("score"), F.asc("url")
        )
        df = (
            df.withColumn("salt", salt)
            .withColumn("salt_rank", F.row_number().over(w_salt))
            .filter(F.col("salt_rank") <= limit)  # superset: each salt keeps `limit`
            .drop("salt", "salt_rank")
            .withColumn("segnum", F.lit(1))
        )

    w_final = Window.partitionBy("partition_id", "segnum").orderBy(
        F.desc("score"), F.asc("url")
    )
    df = df.withColumn("rank", F.row_number().over(w_final)).filter(
        F.col("rank") <= limit
    ).drop("rank")

    # record generate time (G6) so the next cycle's gen-delay gate sees it
    df = df.withColumn(
        "metadata",
        F.map_concat(
            F.map_filter(
                F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
                lambda k, _: k != GENERATE_TIME_KEY,
            ),
            F.create_map(F.lit(GENERATE_TIME_KEY), F.lit(str(cur_time_ms))),
        ),
    )

    # --- politeness placement + intra-partition spread (P1/P3/P4) ---
    # physical placement hashes the politeness unit (balanced across all
    # partitions; byDomain co-locates a domain's hosts — a superset of the
    # per-host politeness invariant); partition_id stays the LOGICAL reducer
    # id for topN semantics + metrics
    if cfg.partition_mode == "byDomain" and "domain" in df.columns:
        place = F.col("domain")
    elif "pkey" in df.columns:  # byIP: co-locate every vhost of an address
        place = F.col("pkey")
    else:
        place = F.col("host")
    df = df.withColumn("sort_hash", fetch_order_hash_udf(F.col("url")))
    df = df.repartition(cfg.num_partitions, place).sortWithinPartitions(
        "sort_hash", "url"
    )
    return df.drop("pkey")


def mark_generated(frontier: DataFrame, fetchlist: DataFrame, cur_time_ms: int) -> DataFrame:
    """Optional generate.update.crawldb write-back (Generator.java:582-612):
    left join frontier with the fetchlist urls and stamp _ngt_."""
    # plain shuffle join: the fetchlist is topN-sized (10^6-10^7 at scale),
    # far beyond sane broadcast size; url-equi join shuffles only the small
    # fetchlist side when the frontier is bucket-stored by url
    gen = fetchlist.select("url").withColumn("_was_generated", F.lit(True))
    out = frontier.join(gen, "url", "left")
    stamped = F.map_concat(
        F.map_filter(
            F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
            lambda k, _: k != GENERATE_TIME_KEY,
        ),
        F.create_map(F.lit(GENERATE_TIME_KEY), F.lit(str(cur_time_ms))),
    )
    return out.withColumn(
        "metadata",
        F.when(F.col("_was_generated"), stamped).otherwise(F.col("metadata")),
    ).drop("_was_generated")

"""Indexing stage: the 5-way co-group + field filters + dedup.

- IndexerMapReduce (indexer/IndexerMapReduce.java:149-161): crawldb ⋈ linkdb
  ⋈ parse_data ⋈ parse_text ⋈ crawl_fetch on url; a document is emitted only
  if dbDatum + fetchDatum + parseData + parseText are ALL present (inner-join
  semantics); skip gone/notmodified.
- BasicIndexingFilter (plugin/index-basic/.../BasicIndexingFilter.java:59-110):
  fields host, domain, url, content, title, tstamp.
- anchor filter (plugin/index-anchor/): inlink anchors from linkdb.
- indexerScore (scoring/opic/OPICScoringFilter.java:155-157):
  boost = score^power.
- SolrDeleteDuplicates (indexer/solr/SolrDeleteDuplicates.java:60+): among
  docs with equal signature keep the highest-scoring (then shortest URL) —
  a window dedupe.
- tld filter (plugin/tld TLDIndexingFilter.java:44-59): `tld` field =
  the url host's domain suffix.
- parse-metatags -> index-metadata (plugin/parse-metatags
  MetaTagsParser.java:61-108 + plugin/index-metadata
  MetadataIndexer.java:48-66): general meta tags prefixed `metatag.<name>`,
  indexed when listed in index.parse.md.
- index-static (plugin/index-static StaticFieldIndexer.java:44-68):
  constant field:value pairs from index.static on every doc (the reference
  space-splits values into a multi-valued field; kept as the raw string).

The "index" here is a table (the Solr sink is a writer swap in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nutch_spark import schemas
from nutch_spark.config import CrawlConfig
from nutch_spark.functions.dates import http_date_format_udf
from nutch_spark.functions.urls import domain_udf, host_col, suffix_udf


def parse_static_fields(conf: str) -> dict[str, str]:
    """index.static parser (StaticFieldIndexer.parseFields): comma-separated
    name:value pairs; malformed entries dropped."""
    out: dict[str, str] = {}
    for field in (conf or "").split(","):
        entry = field.split(":")
        if len(entry) == 2:
            out[entry[0].strip()] = entry[1].strip()
    return out


def build_index(
    frontier: DataFrame,
    fetch_out: DataFrame,
    parse_text: DataFrame,
    parse_data: DataFrame,
    linkdb: DataFrame | None,
    cfg: CrawlConfig,
) -> DataFrame:
    """The indexer co-group (J2) + basic/anchor/score filters (I2-I4)."""
    skip_status = [schemas.STATUS_DB_GONE]
    if cfg.indexer_skip_notmodified:
        # indexer.skip.notmodified (IndexerMapReduce.java:61,85,244):
        # DB_NOTMODIFIED pages are indexed UNLESS the knob is set
        skip_status.append(schemas.STATUS_DB_NOTMODIFIED)
    have_repr = "repr_url" in frontier.columns
    want_db_meta = bool(cfg.urlmeta_tags or cfg.index_db_md) \
        and "metadata" in frontier.columns
    db = frontier.filter(~F.col("status").isin(*skip_status)).select(
        "url", "status", "score", "fetch_time", "signature",
        *(["repr_url"] if have_repr else []),
        *(["metadata"] if want_db_meta else []),
    )
    # ONE row per url, newest fetch wins: fetch_out can legitimately carry
    # the same url twice with SUCCESS (a fetchlist row AND an in-thread
    # redirect hop landing on it — the same case updatedb dedupes with its
    # max_by(seq), updatedb.py). Joining the raw rows would fan the
    # document out into duplicate index entries; IndexerMapReduce keeps
    # exactly one fetchDatum per url. map-side-combining hash aggregate,
    # no window sort; struct key is never null so no max_by row-skip.
    fetched = (
        fetch_out.filter(
            F.col("fetch_status") == schemas.STATUS_FETCH_SUCCESS
        )
        .select("url", "fetch_ts", "content_length")
        .groupBy("url")
        .agg(F.max_by(
            F.struct("fetch_ts", "content_length"),
            F.struct("fetch_ts", "content_length"),
        ).alias("_f"))
        .select("url", F.col("_f.fetch_ts").alias("fetch_ts"),
                F.col("_f.content_length").alias("content_length"))
    )
    pd_cols = parse_data
    if "noindex" in parse_data.columns:
        # robots-noindex pages never reach the index (X6; IndexerMapReduce
        # honors the meta directive via the parse status)
        pd_cols = parse_data.filter(~F.coalesce(F.col("noindex"), F.lit(False)))
    want_meta = bool(cfg.index_parse_md) and "meta" in parse_data.columns
    need_meta = "meta" in parse_data.columns and (
        want_meta or bool(cfg.headings) or cfg.index_reltag or cfg.index_lang
        or cfg.index_cc
    )
    have_cache = "cache" in parse_data.columns
    have_ct = "content_type" in parse_data.columns
    have_dispo = "content_disposition" in parse_data.columns
    pd_sel = (["url", "title"] + (["meta"] if need_meta else [])
              + (["cache"] if have_cache else [])
              + (["content_type"] if have_ct else [])
              + (["content_disposition"] if have_dispo else []))
    doc = (
        db.join(fetched, "url", "inner")
        .join(parse_text.select("url", "text"), "url", "inner")
        .join(pd_cols.select(*pd_sel), "url", "inner")
    )
    if linkdb is not None:
        anchors = linkdb.select(
            F.col("to_url").alias("url"),
            F.col("inlinks"),
        ).select(
            "url",
            F.transform(F.col("inlinks"), lambda s: s["anchor"]).alias("anchors"),
        )
        if cfg.anchor_deduplicate:
            # anchorIndexingFilter.deduplicate (AnchorIndexingFilter.java:
            # 45,63-75): case-insensitive dedup, first occurrence wins,
            # original casing kept — an order-preserving fold over the
            # bounded inlink-anchor array
            anchors = anchors.withColumn(
                "anchors",
                F.aggregate(
                    "anchors",
                    F.struct(
                        F.array().cast("array<string>").alias("seen"),
                        F.array().cast("array<string>").alias("kept"),
                    ),
                    lambda acc, a: F.when(
                        F.array_contains(acc["seen"], F.lower(a)), acc
                    ).otherwise(F.struct(
                        F.array_append(acc["seen"], F.lower(a)).alias("seen"),
                        F.array_append(acc["kept"], a).alias("kept"),
                    )),
                    lambda acc: acc["kept"],
                ),
            )
        doc = doc.join(anchors, "url", "left")
    else:
        doc = doc.withColumn("anchors", F.lit(None).cast("array<string>"))
    # index-basic url/host/domain come from the representative url when the
    # frontier carries one (BasicIndexingFilter.java:55-79: reprUrl ?? url)
    doc_url = (F.coalesce(F.col("repr_url"), F.col("url")) if have_repr
               else F.col("url"))
    title_c = F.when(
        F.length("title") > 0,
        F.substring(F.col("title"), 1, cfg.indexer_max_title_length),
    )
    content_c = F.col("text")
    if cfg.indexer_max_content_length > -1:
        content_c = F.substring(content_c, 1, cfg.indexer_max_content_length)
    return doc.select(
        doc_url.alias("url"),
        host_col(doc_url).alias("host"),
        (domain_udf(doc_url) if cfg.indexer_add_domain
         else F.lit(None).cast("string")).alias("domain"),
        title_c.alias("title"),
        content_c.alias("content"),
        F.col("anchors"),
        F.col("signature").alias("digest"),
        F.col("fetch_ts").alias("tstamp"),
        # boost: scoring-opic score^power (OPICScoringFilter.java:120-125) or
        # scoring-link normalize.score * db score when the frontier carries
        # the webgraph score (LinkAnalysisScoringFilter.java:66-71)
        (
            (F.lit(float(cfg.link_analyze_normalize_score))
             * F.col("score").cast("double"))
            if cfg.scoring_link
            else F.pow(F.col("score").cast("double"),
                       F.lit(cfg.indexer_score_power))
        ).alias("boost"),
        # index-more fields (plugin/index-more MoreIndexingFilter: date,
        # contentLength; content-type is constant text/html in this corpus)
        # cache policy field (BasicIndexingFilter.java:99-103: added when
        # the caching.forbidden parse meta is set and not 'none')
        (F.when(F.col("cache") != "none", F.col("cache")) if have_cache
         else F.lit(None).cast("string")).alias("cache"),
        F.col("content_length").alias("content_length"),
        http_date_format_udf(F.col("fetch_ts")).alias("date"),
        # index-more type field (MoreIndexingFilter.addType:198-257):
        # multi-valued [full mime (+ primary, sub parts)]
        _type_col(cfg, have_ct, doc_url).alias("type"),
        # tld plugin: the host's domain suffix (TLDIndexingFilter.java:50-53)
        # over doc_url like url/host/domain above — the filter reads the
        # document's url field, which is repr-url-based after
        # BasicIndexingFilter, so a cross-domain redirect must not leave
        # tld describing the ORIGINAL url while host describes the repr
        suffix_udf(doc_url).alias("tld"),
        _metatags_col(cfg, want_meta).alias("metatags"),
        _static_fields_col(cfg).alias("static_fields"),
        _headings_col(cfg, need_meta).alias("headings"),
        _reltag_col(cfg, need_meta).alias("tag"),
        _subcollection_col(cfg).alias("subcollection"),
        _lang_col(cfg, need_meta).alias("lang"),
        _cc_col(cfg, need_meta).alias("cc"),
        # index-urlmeta (URLMetaIndexingFilter.java:84-100): one field per
        # configured tag found in the datum metadata — expressed as a map
        # column keyed by tag, like the metatags composition above
        _urlmeta_col(cfg, "metadata" in db.columns).alias("urlmeta"),
        # index.db.md (MetadataIndexer.java:56-63): datum metadata keys
        # copied verbatim (no prefixing, unlike the parse-metatags combo)
        _db_md_col(cfg, "metadata" in db.columns).alias("db_md"),
        # index-more resetTitle (MoreIndexingFilter.java:269-303): filename
        # from a non-standard Content-Disposition header. The reference
        # doc.add()s it as a SECOND title value and first-value readers
        # still see the basic title, so the single-valued column model
        # keeps `title` intact and lands the filename in its own column.
        # Only sources that carry response headers (e.g. ARC imports)
        # produce the input column.
        *([disposition_title_col(F.col("content_disposition"))
           .alias("disposition_title")] if have_dispo else []),
    )


def disposition_title_col(dispo):
    """Filename extraction from Content-Disposition
    (MoreIndexingFilter.resetTitle:269-303). Pattern order matters
    (:283-287): the quoted form first — with the reference's GREEDY `.+`
    inside the quotes — then the bare-token form. regexp_extract runs the
    same Java regex the reference compiles."""
    quoted = F.regexp_extract(dispo, r"\bfilename=['\"](.+)['\"]", 1)
    bare = F.regexp_extract(dispo, r"\bfilename=(\S+)\b", 1)
    return F.when(quoted != "", quoted).when(bare != "", bare)


def _db_md_col(cfg: CrawlConfig, have_meta: bool):
    if not cfg.index_db_md or not have_meta:
        return F.lit(None).cast("map<string,string>")
    keys = list(cfg.index_db_md)
    return F.map_filter(
        F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
        lambda k, _: k.isin(*keys),
    )


def _type_col(cfg: CrawlConfig, have_ct: bool, doc_url):
    """index-more `type` field (MoreIndexingFilter.addType:198-257): the
    cleaned content type (MimeUtil.cleanMimeType: strip ';params', trim,
    lowercase), falling back to the url-extension map when no content type
    was resolved upstream; mapMimeTypes rewrites the full mime; parts
    (primary, sub) appended when indexMimeTypeParts. Multi-valued -> array."""
    from nutch_spark.functions.content import EXTENSION_TYPES

    path = F.substring_index(F.substring_index(doc_url, "?", 1), "#", 1)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    ext_map = F.create_map(
        *[F.lit(x) for kv in EXTENSION_TYPES.items() for x in kv])
    from_url = F.when(ext != "", F.element_at(ext_map, ext))
    if have_ct:
        cleaned = F.lower(F.trim(F.substring_index(F.col("content_type"), ";", 1)))
        ct = F.coalesce(F.nullif(cleaned, F.lit("")), from_url)
    else:
        ct = from_url
    if cfg.more_map_mime_types:
        mm = F.create_map(
            *[F.lit(x) for kv in cfg.more_map_mime_types for x in kv])
        ct = F.coalesce(F.element_at(mm, ct), ct)
    if cfg.more_index_mime_type_parts:
        arr = F.array_distinct(F.array(
            ct,
            F.substring_index(ct, "/", 1),
            F.when(F.contains(ct, F.lit("/")), F.substring_index(ct, "/", -1)),
        ))
        arr = F.filter(arr, lambda x: x.isNotNull())
    else:
        arr = F.array(ct)
    return F.when(ct.isNotNull(), arr)


def _urlmeta_col(cfg: CrawlConfig, have_meta: bool):
    """urlmeta.tags datum-metadata fields (URLMetaIndexingFilter.java:84-100:
    doc.add(metatag, datum.getMetaData().get(metatag)) per configured tag)."""
    if not cfg.urlmeta_tags or not have_meta:
        return F.lit(None).cast("map<string,string>")
    tags = list(cfg.urlmeta_tags)
    return F.map_filter(
        F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
        lambda k, _: k.isin(*tags),
    )


def _metatags_col(cfg: CrawlConfig, want_meta: bool):
    """parse-metatags + index-metadata composition: general meta tags ->
    `metatag.<lowername>` (MetaTagsParser.java:79-93, filtered by
    metatags.names), then only index.parse.md-listed keys reach the doc
    (MetadataIndexer.java:48-54)."""
    if not want_meta:
        return F.lit(None).cast("map<string,string>")
    meta = F.coalesce(F.col("meta"), F.create_map().cast("map<string,string>"))
    names = tuple(n.lower() for n in cfg.metatags_names)
    if "*" not in names:
        meta = F.map_filter(meta, lambda k, _: F.lower(k).isin(*names))
    prefixed = F.transform_keys(meta, lambda k, _: F.concat(F.lit("metatag."), F.lower(k)))
    wanted = tuple(cfg.index_parse_md)
    return F.map_filter(prefixed, lambda k, _: k.isin(*wanted))


def _static_fields_col(cfg: CrawlConfig):
    fields = parse_static_fields(cfg.index_static)
    if not fields:
        return F.lit(None).cast("map<string,string>")
    kv = [F.lit(x) for pair in fields.items() for x in pair]
    return F.create_map(*kv)


def _headings_col(cfg: CrawlConfig, need_meta: bool):
    """headings plugin (HeadingsParseFilter.java:47-59): parse-meta
    `heading.<tag>` entries -> bare `<tag>` keys, configured tags only."""
    if not cfg.headings or not need_meta:
        return F.lit(None).cast("map<string,string>")
    meta = F.coalesce(F.col("meta"), F.create_map().cast("map<string,string>"))
    picked = F.map_filter(
        meta, lambda k, _: k.isin(*[f"heading.{h}" for h in cfg.headings])
    )
    return F.transform_keys(picked, lambda k, _: F.substring(k, 9, 1 << 20))


def _reltag_col(cfg: CrawlConfig, need_meta: bool):
    """microformats-reltag (RelTagIndexingFilter.java:52-56): multi-valued
    `tag` field from the tab-joined rel-tag parse meta."""
    if not cfg.index_reltag or not need_meta:
        return F.lit(None).cast("array<string>")
    return F.split(F.col("meta").getItem("rel-tag"), "\t")


def _subcollection_col(cfg: CrawlConfig):
    """subcollection plugin (Subcollection.java:148-171 filter +
    SubcollectionIndexingFilter.java:79-89): per collection, blacklist
    substring match rejects, else whitelist substring match admits; the
    field collects the names of admitting collections. Pure Catalyst —
    `instr` per configured substring, no UDF."""
    if not cfg.subcollections:
        return F.lit(None).cast("array<string>")

    def member(white: tuple, black: tuple):
        hit = lambda s: F.instr(F.col("url"), s) > 0  # noqa: E731
        blacklisted = F.lit(False)
        for s in black:
            blacklisted = blacklisted | hit(s)
        whitelisted = F.lit(False)
        for s in white:
            whitelisted = whitelisted | hit(s)
        return ~blacklisted & whitelisted

    names = F.array(*[
        F.when(member(white, black), F.lit(name))
        for name, white, black in cfg.subcollections
    ])
    return F.filter(names, lambda x: x.isNotNull())


def _lang_col(cfg: CrawlConfig, need_meta: bool):
    """language-identifier (plugin/language-identifier
    HTMLLanguageParser.java:93-111 + LanguageIndexingFilter.java:55-80):
    lang.extraction.policy orders the detect (meta declarations: language,
    dc.language, content-language) and identify (n-gram analysis, capped by
    lang.analyze.max.length, gated by lang.identification.only.certain)
    stages; a policy naming only one stage runs only it. The indexing
    filter falls back to 'unknown' when neither stage yields a language."""
    if not cfg.index_lang:
        return F.lit(None).cast("string")
    from nutch_spark.functions.text import detect_language

    identified = detect_language(
        F.col("text"),
        only_certain=cfg.lang_identification_only_certain,
        max_length=cfg.lang_analyze_max_length,
    )
    # the n-gram identifier's 'und' is its null (LanguageIdentifier returns
    # null on no evidence; the 'unknown' default belongs to the indexer)
    identified = F.when(identified != "und", identified)
    declared = F.lit(None).cast("string")
    if need_meta:
        from nutch_spark.functions.text import parse_declared_language

        # detectLanguage (HTMLLanguageParser.java:166-180) for the
        # parse-html pipeline: the DOM-walk declarations go through
        # parseLanguage with priority lang attribute > dc.language meta >
        # http-equiv content-language (LanguageParser:245-258), then the
        # raw Content-Language response header (:177-179) — our simulated
        # fetch surfaces it as the content-language name-meta.
        meta = F.col("meta")
        # one transform = one shared 533-entry map literal in the plan
        # (two separate parse_declared_language calls would inline it twice)
        parsed_decl = F.filter(
            F.transform(
                F.array(meta.getItem("dc.language"),
                        meta.getItem("http-equiv.content-language")),
                lambda c: parse_declared_language(c),
            ),
            lambda x: x.isNotNull(),
        )
        declared = F.coalesce(
            meta.getItem("lang."),  # parsed kernel-side (extract_lang_attr)
            F.get(parsed_decl, 0),
            meta.getItem("content-language"),
        )
    policy = tuple(cfg.lang_extraction_policy)
    stages = [declared if s == "detect" else identified
              for s in policy if s in ("detect", "identify")]
    if not stages:  # no policy -> filter adds nothing (reference warns)
        return F.lit(None).cast("string")
    return F.coalesce(*stages, F.lit("unknown"))


def _cc_col(cfg: CrawlConfig, need_meta: bool):
    """creativecommons (CCIndexingFilter.java:55-110): multi-valued `cc`
    field — license=<url>, the /- path components after "licenses", then
    meta=<location>, then the work type. Pure Catalyst over the parse-meta
    entries."""
    if not cfg.index_cc or not need_meta:
        return F.lit(None).cast("array<string>")
    url = F.col("meta").getItem("license-url")
    loc = F.col("meta").getItem("license-location")
    wtype = F.col("meta").getItem("work-type")
    path = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    toks = F.filter(F.split(path, "[/-]"), lambda x: x != F.lit(""))
    feats = F.slice(toks, 2, 1 << 20)  # drop the leading "licenses" token
    arr = lambda c: F.array(c)  # noqa: E731
    empty = F.array().cast("array<string>")
    cc = F.concat(
        F.when(url.isNotNull(), F.concat(arr(F.concat(F.lit("license="), url)), feats))
        .otherwise(empty),
        F.when(loc.isNotNull(), arr(F.concat(F.lit("meta="), loc))).otherwise(empty),
        F.when(wtype.isNotNull(), arr(wtype)).otherwise(empty),
    )
    return F.when(F.size(cc) > 0, cc)


def clean_index(index: DataFrame, frontier: DataFrame) -> DataFrame:
    """SolrClean (indexer/solr/SolrClean.java:42-120, `bin/nutch
    solrclean`): scan the crawldb for STATUS_DB_GONE entries and delete
    those documents from the index by id (= url).

    The reference streams deleteById batches at a Solr server; against the
    index-table stand-in the same operation is a left-anti join on url.
    No broadcast hint on purpose: an explicit hint is honored
    unconditionally, and at 10^10 frontier rows the GONE slice can be
    10^8+ urls — let AQE pick broadcast when the filtered slice measures
    under the threshold and fall back to a url-hash shuffle join (which
    co-locates with a url-bucketed index table) when it doesn't."""
    gone = frontier.filter(
        F.col("status") == schemas.STATUS_DB_GONE
    ).select("url")
    return index.join(gone, "url", "left_anti")


def dedup_index(index: DataFrame) -> DataFrame:
    """Keep one doc per digest: highest boost, then shortest/lexical URL
    (SolrDeleteDuplicates semantics). min_by hash-aggregate over the
    composite order (-boost, len(url), url) — duplicates collapse in the
    map-side partial instead of sorting whole partitions (PLANS §6.22)."""
    cols = index.columns
    # emulate the old window's desc(boost) NULL/NaN placement inside a MIN:
    # desc put NaN first (it compares greater than any double), numbers
    # next (descending), NULLs last — so the min key ranks NaN=0,
    # number=1 (by -boost), NULL=2
    b = F.col("boost")
    order = F.struct(
        F.when(b.isNull(), F.lit(2))
        .when(F.isnan(b), F.lit(0)).otherwise(F.lit(1)).alias("o0"),
        F.when(b.isNull() | F.isnan(b), F.lit(0.0))
        .otherwise(-b).alias("o1"),
        F.length("url").alias("o2"),
        F.col("url").alias("o3"),
    )
    return (
        index.filter(F.col("digest").isNotNull())
        .groupBy("digest")
        .agg(F.min_by(F.struct(*cols), order).alias("_keep"))
        .select(*[F.col(f"_keep.{c}").alias(c) for c in cols])
    )

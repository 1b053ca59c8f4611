"""E-commerce item extraction — the fork's 15 per-site ItemParser plugins
re-expressed as config-driven extraction over the documents table.

Reference: plugin/parse-html/src/java/org/apache/nutch/parse/*ItemParser.java
(accept-regex per platform, e.g. JingdongItemParser.java:28-33), extraction
rules DOMContentUtils.java:455-2134, URL-rule item ids
parse-url/.../TaobaoItemIndexProcessor.java:66-72, price-image OCR
DOMContentUtils.java:2140-2195 (modeled as a media_ref-keyed lookup table).

Spark realization (north_star: "pandas/Arrow UDF extractors"): the span
selection itself is native Catalyst (array functions over the spans column —
faster than any UDF); the per-platform dispatch is a broadcast rules table.
Item id extraction uses parse_url (JVM) for query-param platforms and
regexp_extract for path platforms.

Per-platform rules against the synthetic corpus layout (corpus.py renders
item pages as: [category-path text, name text, photo media, price text |
price-image media]):
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nutch_spark.functions.urls import host_col

# platform -> (host, item-id extraction kind, pattern) — one rule per fork
# ItemParser plugin, mirroring each accept pattern's URL shape on the
# simulated hosts (citations per platform):
PLATFORM_RULES: dict[str, dict] = {
    # parse-url/.../TaobaoItemIndexProcessor.java:66-72 (query-param id)
    "taobao": {"host": "item.taobao-sim.com", "id_from": "query", "param": "id"},
    # JingdongItemParser.java:28-33 (^http://www.360buy.com/product/(\d+).html)
    "jingdong": {"host": "www.jd-sim.com", "id_from": "path", "re": r"/product/(\d+)\.html"},
    # AmazonItemParser.java:28-33 (/dp/ paths)
    "amazon": {"host": "www.amazon-sim.com", "id_from": "path", "re": r"/dp/(\d+)"},
    # SuningItemParser.java:28-33 (emall/prd_*.html)
    "suning": {"host": "www.suning-sim.com", "id_from": "path", "re": r"/item/(\d+)\.html"},
    # DangdangItemParser.java:28-33 (product.aspx?product_id=)
    "dangdang": {"host": "product.dangdang-sim.com", "id_from": "path", "re": r"/(\d+)\.html"},
    # Coo8ItemParser.java:28-33 (^http://www.coo8.com/product/(\S)*\.html)
    "coo8": {"host": "www.coo8-sim.com", "id_from": "path", "re": r"/product/(\d+)\.html"},
    # EfeihuItemParser.java:29-34 (^http://www.efeihu.com/Product/(\S)*.html)
    "efeihu": {"host": "www.efeihu-sim.com", "id_from": "path", "re": r"/Product/(\d+)\.html"},
    # Five1BuyItemParser.java:29-34 (^http://item.51buy.com/item-(\S)*.html)
    "five1buy": {"host": "item.51buy-sim.com", "id_from": "path", "re": r"/item-(\d+)\.html"},
    # GomeItemParser.java:29-34 (^http://www.gome.com.cn/ec/homeus/jump/product/...)
    "gome": {"host": "www.gome-sim.com.cn", "id_from": "path", "re": r"/jump/product/(\d+)\.html"},
    # LusenItemParser.java:29-34 (^http://www.lusen.com/Product/ProductInfo.aspx?...)
    "lusen": {"host": "www.lusen-sim.com", "id_from": "query", "param": "id"},
    # New7ItemParser.java:29-34 (^http://www.new7.com/product/(\S)*.html)
    "new7": {"host": "www.new7-sim.com", "id_from": "path", "re": r"/product/(\d+)\.html"},
    # NewEggItemParser.java:28-33 (^http://www.newegg.com.cn/Product/(\S)*.htm)
    "newegg": {"host": "www.newegg-sim.com.cn", "id_from": "path", "re": r"/Product/(\d+)\.htm"},
    # No1ShopItemParser.java:29-34 (^http://www.yihaodian.com/product/(\S)*)
    "no1shop": {"host": "www.yihaodian-sim.com", "id_from": "path", "re": r"/product/(\d+)"},
    # OukuItemParser.java:29-34 (^http://www.ouku.com/goods(\S)*)
    "ouku": {"host": "www.ouku-sim.com", "id_from": "path", "re": r"/goods(\d+)"},
    # RedBabyItemParser.java:29-34 (^http://www.redbaby.com.cn/(\S)+/(\S)*.html)
    "redbaby": {"host": "www.redbaby-sim.com.cn", "id_from": "path", "re": r"/(\d+)\.html"},
}

_PRICE_RE = r"price: (\d+\.\d+)"


def extract_items(documents: DataFrame, price_images: DataFrame | None = None) -> DataFrame:
    """documents(doc_id, spans) -> items(doc_id, platform, item_id, name,
    category, price, photo_ref)."""
    host = host_col(F.col("doc_id"))

    platform = F.lit(None).cast("string")
    for pf, rule in PLATFORM_RULES.items():
        platform = F.when(host == rule["host"], F.lit(pf)).otherwise(platform)

    item_id = F.lit(None).cast("string")
    for pf, rule in PLATFORM_RULES.items():
        if rule["id_from"] == "query":
            expr = F.parse_url(F.col("doc_id"), F.lit("QUERY"), F.lit(rule["param"]))
        else:
            expr = F.nullif(F.regexp_extract(F.col("doc_id"), rule["re"], 1), F.lit(""))
        item_id = F.when(F.col("platform") == pf, expr).otherwise(item_id)

    texts = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
    medias = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))

    df = (
        documents.withColumn("platform", platform)
        .filter(F.col("platform").isNotNull())
        .withColumn("item_id", item_id)
        .withColumn("_texts", texts)
        .withColumn("_medias", medias)
        .withColumn("category", F.split(F.get(F.col("_texts"), 0)["text"], " > "))
        .withColumn("name", F.get(F.col("_texts"), 1)["text"])
        .withColumn(
            "photo_ref",
            F.get(
                F.filter(F.col("_medias"), lambda s: s["media_ref"].contains("/photo/")), 0
            )["media_ref"],
        )
        .withColumn(
            "price_text",
            F.get(
                F.filter(
                    F.col("_texts"),
                    lambda s: s["text"].rlike(_PRICE_RE),
                ),
                0,
            )["text"],
        )
        .withColumn("price", F.regexp_extract(F.col("price_text"), _PRICE_RE, 1).cast("double"))
        .withColumn(
            "price_image_ref",
            F.get(
                F.filter(F.col("_medias"), lambda s: s["media_ref"].contains("/price/")), 0
            )["media_ref"],
        )
    )

    if price_images is not None:
        # OCR analogue: resolve price from the price-image lookup (broadcast)
        df = df.join(
            F.broadcast(price_images.select(
                F.col("media_ref").alias("price_image_ref"),
                F.col("price").alias("ocr_price"),
            )),
            "price_image_ref",
            "left",
        ).withColumn("price", F.coalesce(F.col("price"), F.col("ocr_price")))

    return df.select(
        "doc_id", "platform", "item_id", "name", "category",
        F.round(F.col("price"), 2).alias("price"), "photo_ref",
    )

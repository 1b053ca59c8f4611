"""Shipped URL-filter rule sets + the conf-format loader.

The fork's whole crawl scope is defined by its e-commerce whitelist
(conf/regex-urlfilter.txt:26-139 in the reference): first matching +/- rule
decides, no match rejects (RegexURLFilterBase semantics — the mechanism
lives in functions.urls.RegexUrlFilter). The rule text below is that config
data ported verbatim (including its quirks — e.g. the unescaped '?' in the
dangdang product rule and the truncated coo8 character class are preserved
as-is, because they define the fork's actual accept behavior).
"""

from __future__ import annotations

ECOMMERCE_FILTER_RULES_TEXT = r"""
# conf/regex-urlfilter.txt:26-139 (fork whitelist), ported verbatim
-^(file|ftp|mailto):
-\.(gif|GIF|jpg|JPG|png|PNG|ico|ICO|css|CSS|sit|SIT|eps|EPS|wmf|WMF|zip|ZIP|ppt|PPT|mpg|MPG|xls|XLS|gz|GZ|rpm|RPM|tgz|TGZ|mov|MOV|exe|EXE|jpeg|JPEG|bmp|BMP|js|JS)$

# tmall
+^http://3c.tmall.com/$
+^http://detail.tmall.com/[\s\S]*$
+^http://list.tmall.com/[\s\S]*$
+^http://list.tmall.com/search_product.htm[\s\S]*$
+^http://jump.taobao.com/[\s\S]*$
-^http://zhaoshang.tmall.com/[\s\S]*$
-^http://fw.tmall.com/[\s\S]*$
-^http://service.tmall.com/[\s\S]*$
-^http://pass.tmall.com/[\s\S]*$

# jingdong
+^http://www.360buy.com/$
+^http://www.360buy.com/baby.html$
+^http://www.360buy.com/beauty.html$
+^http://www.360buy.com/products/737-1276-000.html$
+^http://www.360buy.com/products/737-964-000.html$
+^http://www.360buy.com/products/1320-1586-000.html$
+^http://www.360buy.com/products/1320-1587-000.html$
+^http://www.360buy.com/products/1320-1588-000.html$
+^http://www.360buy.com/products/1318-1469-000.html$
+^http://www.360buy.com/products/1318-1467-000.html$
+^http://www.360buy.com/product/([0-9]+).html$

# amazon
+^http://www.amazon.cn/[\s\S]*$
+^http://www.amazon.cn/[\s\S]+/b/[\s\S]+$
+^http://www.amazon.cn/[\s\S]+/dp/[\s\S]+$
+^http://www.amazon.cn/gp/product/[\s\S]+$

# coo8
+^http://www.coo8.com/[\s\S]+
+^http://www.coo8.com/products/[\s\S]+.html$
+^http://www.coo8.com/product/\s\S]+.html$

# dangdang
+^http://[\s\S]+.dangdang.com/[\s\S]+$
+^http://category.dangdang.com/[\s\S]+$
+^http://categoryb.dangdang.com/[\s\S]+$
+^http://product.dangdang.com/product.aspx?product_id=[\s\S]+$

# efeihu
+^http://www.efeihu.com/Pages/ProductShow/ProductSecond.aspx[\s\S]+$
+^http://www.efeihu.com/Products/[\s\S]+.html[\s\S]*$
+^http://www.efeihu.com/Product/[\s\S]+.html[\s\S]*$

# 51buy
+^http://www.51buy.com/personal_beauty.html[\s\S]*$
+^http://list.51buy.com/[\s\S]+.html[\s\S]*$
+^http://item.51buy.com/item-[\s\S]+.html[\s\S]*

# gome
+^http://www.gome.com.cn/ec/homeus/toysgifts.html[\s\S]*$
+^http://www.gome.com.cn/ec/homeus/jump/category/cat[\s\S]+.html[\s\S]*$
+^http://www.gome.com.cn/ec/homeus/jump/product/[\s\S]+.html[\s\S]*$

# lusen
+^http://www.lusen.com/Product/ProductCategoryList.aspx\?[\s\S]*

# new egg
+^http://www.newegg.com.cn/Baby.htm$
+^http://www.newegg.com.cn/Health.htm$
+^http://www.newegg.com.cn/Food.htm$
+^http://www.newegg.com.cn/Category/[\s\S]+.htm[\s\S]*$
+^http://www.newegg.com.cn/SubCategory/[\s\S]+.htm[\s\S]*$
+^http://www.newegg.com.cn/Product/[\s\S]+.htm[\s\S]*$

# no.1 shop
+^http://www.yihaodian.com/channel/[\s\S]+$
+^http://channel.yihaodian.com/[\s\S]*$
+^http://www.yihaodian.com/ctg/s2/[\s\S]+$
+^http://www.yihaodian.com/product/[\s\S]+$

# suning
+^http://www.suning.com/emall/cd_[\s\S]+.html[\s\S]*$
+^http://search.suning.com/emall/pcd.do[\s\S]+$
+^http://search.suning.com/emall/strd.do[\s\S]+$
+^http://www.suning.com/emall/prd_[\s\S]+_.html[\s\S]*$

# skip others
-.
"""


def parse_filter_rules(text: str) -> list[tuple[str, str]]:
    """Parse the conf/regex-urlfilter.txt line format: non-blank, non-'#'
    lines are '+'/'-' followed by a regex (RegexURLFilterBase.readRules)."""
    rules: list[tuple[str, str]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        sign, pattern = line[0], line[1:]
        if sign not in "+-" or not pattern:
            continue
        rules.append((sign, pattern))
    return rules


def ecommerce_filter_rules() -> list[tuple[str, str]]:
    """The fork's whitelist as a RegexUrlFilter-ready rule list."""
    return parse_filter_rules(ECOMMERCE_FILTER_RULES_TEXT)

"""Frontier sources: RSS / Atom / sitemap / sitemapindex / CSV / URL lists.

Reference behaviors reproduced (SURVEY.md §2.1 S1-S5):
  * RSS: one frontier row per <item>, URL from <link>, the item's whole
    node tree flattened into feed meta
    (/root/reference/RISJbot/spiders/newsrssfeedspider.py:9-29; tree→dict
    at utils.py:81-98 — namespaces dropped, text stripped).
  * Atom: every <entry><link href=...>
    (/root/reference/RISJbot/spiders/newsatomfeedspider.py:8-22).
  * Sitemap: <urlset> rows carry loc + lastmod + news:* meta; gzipped
    bodies unzipped; <sitemapindex> children are re-queued — the
    reference recurses via Scrapy callbacks
    (/root/reference/RISJbot/spiders/newssitemapspider.py:19-101), we run
    a bounded-depth driver loop over a DataFrame of unexpanded sitemap
    URLs (iterative expand, no recursion).
  * alternate-language links: xhtml:link rel=alternate hreflang rows
    (newssitemapspider.py:94-100).

Parsing is stdlib ElementTree inside a pandas UDF (the container has no
lxml; synthetic feeds are well-formed XML). Namespace tags are stripped
like the reference's etree_to_recursive_dict.
"""

from __future__ import annotations

import gzip
import json
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _localname(tag: str) -> str:
    return tag.split("}", 1)[1] if "}" in tag else tag


def _node_to_flat_dict(elem) -> dict:
    """One level of children → {localname: text} (+ news:* nested one
    level, + alternate{lang} link hrefs) — the scalar leaves the loader
    reads (/root/reference/RISJbot/loaders.py:348-381)."""
    d: dict = {}
    for child in elem:
        name = _localname(child.tag)
        if name == "link" and "href" in child.attrib:
            # only rel='alternate' WITH an hreflang is an alternate
            # (newssitemapspider.py:94-100); rel='canonical'/'self'
            # links must not be enqueued as frontier rows (and a missing
            # hreflang used to produce the bogus key 'alternateNone')
            if child.get("rel") == "alternate" and child.get("hreflang"):
                d[f"alternate{child.get('hreflang')}"] = child.get("href")
            continue
        sub = {}
        for g in child:
            gname = _localname(g.tag)
            if g.text and g.text.strip():
                sub[gname] = g.text.strip()
        if sub:
            d[name] = sub
        elif child.text and child.text.strip():
            d[name] = child.text.strip()
    return d


def parse_feed(body: bytes, kind_hint: str | None = None) -> list[dict]:
    """feed body → rows {url, kind, meta(dict)}. kind is detected from the
    root tag; sitemapindex children come back as kind='sitemapindex-child'
    for the driver loop to re-queue."""
    if body[:2] == b"\x1f\x8b":  # gzipped sitemap (S3 path)
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError):
            # truncated/corrupt gzip body: skip this feed like any
            # malformed XML — one bad sitemap must not fail the stage
            return []
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []
    rtag = _localname(root.tag)
    rows: list[dict] = []

    if rtag == "rss":
        for item in root.iter():
            if _localname(item.tag) != "item":
                continue
            d = _node_to_flat_dict(item)
            link = d.get("link")
            if link:
                rows.append({"url": link, "kind": "rss", "meta": {"RSSFeed": d}})
    elif rtag == "feed":  # Atom
        for entry in root.iter():
            if _localname(entry.tag) != "entry":
                continue
            for child in entry:
                # strip BEFORE the emptiness check (matching the
                # text.strip() guards on the rss/sitemap paths) — a
                # whitespace-only href must not become an empty
                # frontier URL
                url = (child.get("href") or "").strip() \
                    if _localname(child.tag) == "link" else ""
                if url:
                    rows.append({"url": url, "kind": "atom", "meta": {}})
    elif rtag == "sitemapindex":
        for sm in root:
            d = _node_to_flat_dict(sm)
            loc = d.get("loc")
            if loc:
                rows.append({"url": loc, "kind": "sitemapindex-child", "meta": {}})
    elif rtag == "urlset":
        for u in root:
            d = _node_to_flat_dict(u)
            loc = d.get("loc")
            if not loc:
                continue
            rows.append({"url": loc, "kind": "sitemap", "meta": {"NewsSitemap": d}})
            for k, v in d.items():  # alternate-language links
                if k.startswith("alternate") and isinstance(v, str):
                    rows.append({"url": v, "kind": "sitemap",
                                 "meta": {"NewsSitemap": d}})
    return rows


_FEED_ROW = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("meta_json", T.StringType()),
])


@F.pandas_udf(T.ArrayType(_FEED_ROW))
def parse_feed_udf(body: pd.Series) -> pd.Series:
    out = []
    for b in body:
        rows = parse_feed(b) if b is not None else []
        out.append([
            (r["url"].strip(), r["kind"], json.dumps(r["meta"], sort_keys=True))
            for r in rows
        ])
    return pd.Series(out)


def expand_feeds(feeds: DataFrame) -> DataFrame:
    """feeds(feed_url, body) → exploded frontier rows
    (url, kind, meta_json, feed_url)."""
    return (
        feeds.withColumn("entry", F.explode(parse_feed_udf(F.col("body"))))
        .select(
            F.col("entry.url").alias("url"),
            F.col("entry.kind").alias("kind"),
            F.col("entry.meta_json").alias("meta_json"),
            "feed_url",
        )
    )


def expand_sitemaps(feeds: DataFrame, bodies: DataFrame, max_depth: int = 5) -> DataFrame:
    """Bounded-depth sitemapindex expansion (S3): keep exploding while
    child-sitemap rows remain, joining each child URL back to its body in
    `bodies(feed_url, body)`. Driver loop, one explode per level — the
    Spark shape of the reference's recursive callbacks."""
    result = None
    pending = feeds
    cached = []
    # CUMULATIVE already-expanded set, not per-level distinct: a cycle
    # (index A lists B, B lists A) re-expands each node at alternating
    # depths under per-level dedup, duplicating every leaf under it —
    # the anti-join makes each sitemap URL expand exactly once
    expanded = feeds.select("feed_url").distinct().localCheckpoint(eager=True)
    for _ in range(max_depth):
        rows = expand_feeds(pending).cache()
        cached.append(rows)
        leaves = rows.filter(F.col("kind") != "sitemapindex-child")
        # materialize this level's leaves so earlier caches can release
        # (the loop used to pin one cached DataFrame per level for the
        # session's lifetime)
        leaves = leaves.localCheckpoint(eager=True)
        result = leaves if result is None else result.unionByName(leaves)
        children = (rows.filter(F.col("kind") == "sitemapindex-child")
                    .select(F.col("url").alias("feed_url")).distinct()
                    .join(expanded, "feed_url", "left_anti")
                    .localCheckpoint(eager=True))
        if children.isEmpty():
            break
        expanded = expanded.unionByName(children)
        pending = children.join(bodies, "feed_url", "inner")
    for c in cached:
        c.unpersist()
    return result


def seeds_from_csv(spark, path: str, url_field: str = "url") -> DataFrame:
    """S4 — CSV feed source (newscsvfeedspider.py:9-29)."""
    return (
        spark.read.option("header", True).csv(path)
        .select(F.trim(F.col(url_field)).alias("url"))
        .filter(F.col("url").isNotNull() & (F.col("url") != ""))
    )


def seeds_from_textfile(spark, path: str) -> DataFrame:
    """S5 — newline-delimited URL list (newsspecifiedspider.py:14-36)."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.col("url") != "")
    )


def sitemaps_from_robots(robots: DataFrame) -> DataFrame:
    """S3 robots-discovery path: hosts' robots.txt `Sitemap:` lines become
    sitemap seeds (the reference gets this from
    scrapy.utils.sitemap.sitemap_urls_from_robots via
    /root/reference/RISJbot/spiders/newssitemapspider.py:36-39).

    DELIBERATELY scrapy-exact, NOT parse_robots-consistent: scrapy's
    sitemap_urls_from_robots matches `line.lstrip().lower()
    .startswith('sitemap:')` and takes everything after the first colon
    — no '#' comment stripping, no tolerance for a space before the
    colon — so a line `Sitemap: https://x/s.xml # idx` yields the
    trailing comment as part of the URL in the reference too. The
    RFC-9309 parser (politeness.parse_robots) is stricter by design;
    this path reproduces the reference's seed list byte-for-byte."""
    sm = F.expr(
        r"""filter(transform(split(robots_txt, '\r?\n'),
                   l -> CASE WHEN lower(trim(l)) LIKE 'sitemap:%'
                             THEN trim(substring(trim(l), 9)) END),
                   x -> x IS NOT NULL)"""
    )
    return (
        robots.select("host", F.explode(sm).alias("url"))
        .withColumn("kind", F.lit("sitemap"))
    )


def recent_sitemap_filter(sitemap_urls: DataFrame, days: int,
                          today) -> DataFrame:
    """L2 — date-based sitemap pruning: keep only sitemap URLs whose
    embedded yyyymmdd date falls within the last `days` days of `today`
    (the reference generates a regex of recent dates,
    /root/reference/RISJbot/spiders/uk/reuters.py:11-19,40; `today` is
    passed explicitly — determinism). At the table level the same
    predicate becomes partition pruning on days(warc_ts)."""
    from datetime import timedelta

    dates = [(today - timedelta(days=n)).strftime("%Y%m%d")
             for n in range(days + 1)]
    pattern = "(" + "|".join(dates) + r")\.xml$"
    return sitemap_urls.filter(F.col("url").rlike(pattern))

"""Fixed StructType schemas for every engine table (SURVEY.md §1).

The reference is schema-dynamic (dict-like Scrapy items); we impose one
columnar schema per table with nullable columns standing in for "field may
be absent" (/root/reference/RISJbot/items.py:11-40 → `ARTICLE_SCHEMA`)."""

from __future__ import annotations

from pyspark.sql import types as T

# Python str.split()'s exact whitespace set, spelled as a literal class
# valid in BOTH Java regex (Spark) and RE2 (DuckDB oracles): ASCII \s +
# VT/FF + FS/GS/RS/US + NEL + \p{Z} (all separators incl. NBSP,
# U+2028/29, U+3000). Neither engine's bare \s is usable cross-engine:
# Java \s includes \x0B, RE2 \s does not — every tokenize/normalize
# surface shared with an oracle must use this class on both sides.
# Lives here (a leaf module) so ORACLE_SQL consumers don't drag in the
# pandas/extraction stack.
PY_WS_RE = r"[\t\n\x0B\f\r\x1C-\x1F\x85\p{Z}]+"

# The authoritative input shape (BASELINE.json input_hint): Common-Crawl
# style pages.
PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

# Frontier rows (SURVEY.md §1.2): one row per candidate URL per round.

# Seen-set / fetch-history state (replaces the reference's sqlite
# `records(key, url, fetches, time)` table,
# /root/reference/RISJbot/spmiddlewares/refetchcontrol.py:110-115).
SEEN_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("fetches", T.IntegerType()),
    T.StructField("last_fetch", T.TimestampType()),
])

# NewsItem output (items.py:11-40 + pipeline fields). Timestamps stay the
# reference's ISO-8601 strings at this layer (byte-identity surface); the
# articles *table* adds typed companions.
ARTICLE_STRUCT = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("originalurl", T.StringType()),
    T.StructField("fetchtime", T.StringType()),
    T.StructField("modtime", T.StringType()),
    T.StructField("firstpubtime", T.StringType()),
    T.StructField("section", T.StringType()),
    T.StructField("headline", T.StringType()),
    T.StructField("summary", T.StringType()),
    T.StructField("bylines", T.ArrayType(T.StringType())),
    T.StructField("bodytext", T.StringType()),
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("previousfetches", T.IntegerType()),
    T.StructField("notes", T.ArrayType(T.StringType())),
    T.StructField("language", T.StringType()),
    T.StructField("articleid", T.StringType()),
    # comment blobs/text (items.py:36-37; populated by the reference's
    # live comment-API chase, liverpoolecho.py:154-165 — out of scope
    # S8 here, but the columns exist so loader rules can fill them and
    # reference users keep their schema)
    T.StructField("rawcomments", T.ArrayType(T.StringType())),
    T.StructField("comments", T.ArrayType(T.StringType())),
    T.StructField("wordcount", T.IntegerType()),
    T.StructField("sentiment", T.DoubleType()),
    T.StructField("subjectivity", T.DoubleType()),
    T.StructField("namedpeople", T.ArrayType(T.StringType())),
    T.StructField("kincaidgradelevel", T.DoubleType()),
    T.StructField("fleschreadingease", T.DoubleType()),
    T.StructField("status", T.StringType()),       # ok | fake404 | empty
    T.StructField("jsonld_failed", T.IntegerType()),
    # S6 outlinks (pre-prune, offsite-filtered) — engine plumbing, not a
    # NewsItem field; feeds the next round's frontier when link-following
    T.StructField("links", T.ArrayType(T.StringType())),
])

# Per-partition, per-round lineage metrics (north_rule: frontier-in,
# fetched, deduped, extracted counts per Iceberg commit).

ROBOTS_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("robots_txt", T.StringType()),
])



# RFC-1123 Date-header render format shared by the crawl engine and
# the one-shot extract CLI (Spark pattern; EEE is render-only)
HTTP_DATE_FMT = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"

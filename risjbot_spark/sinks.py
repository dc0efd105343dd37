"""Output sinks: the articles snapshot table is canonical (S9/S10); this
module adds the RISJbot-compatible JSONLines export
(/root/reference/RISJbot/settings.py:77-86: one UTF-8 JSONL file set per
run, FEED_STORE_EMPTY semantics) and the rawpagegzipb64 re-encoding
(loaders.py:105-109: gzip → base64 → utf-8 str) that the reference embeds
in every item unless StripRawPage removes it
(pipelines/striprawpage.py:12-31).
"""

from __future__ import annotations

import base64
import gzip

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# NewsItem export order (items.py:11-40); absent fields are omitted per
# row, matching Scrapy's item exporter.
_EXPORT_FIELDS = (
    "source", "url", "originalurl", "fetchtime", "modtime", "firstpubtime",
    "section", "headline", "summary", "bylines", "bodytext", "keywords",
    "rawpagegzipb64", "previousfetches", "notes", "language", "articleid",
    "rawcomments", "comments",
    "wordcount", "sentiment", "subjectivity", "namedpeople",
    "kincaidgradelevel", "fleschreadingease",
)


@pandas_udf(T.StringType())
def gzip_b64_udf(body: pd.Series) -> pd.Series:
    """X5 — gzip+base64 of the raw page (loaders.py:105-109). gzip has no
    SQL builtin; F.base64 covers only half, so this stays a pandas UDF.
    mtime=0 pins the gzip header → deterministic output."""
    out = []
    for b in body:
        if b is None:
            out.append(None)
        else:
            out.append(base64.b64encode(
                gzip.compress(bytes(b), mtime=0)).decode("utf-8"))
    return pd.Series(out)


def to_jsonl_compat(
    articles: DataFrame,
    pages: DataFrame | None = None,
    strip_raw_page: bool = True,
) -> DataFrame:
    """articles → single-column DataFrame of RISJbot-shaped JSON lines.

    strip_raw_page=True mirrors the StripRawPage pipeline (enabled in the
    reference's deployment, settings.py:228); False re-attaches
    rawpagegzipb64 by joining the pages table on canonical URL."""
    df = articles
    if not strip_raw_page:
        if pages is None:
            raise ValueError("pages table required to emit rawpagegzipb64")
        # join on the CANONICAL page url: articles carry url_canon, and a
        # raw-url join silently nulled the raw page for every host whose
        # canonicalization touches the URL (query strip, domain rewrite).
        # When several raw pages canonicalize to one URL the survivor is
        # picked by a total order (newest warc_ts, then raw url, then
        # content hash) — dropDuplicates kept an arbitrary row, making
        # repeated exports differ byte-for-byte
        from .urlnorm import with_canonical

        extra = [c for c in ("warc_ts",) if c in pages.columns]
        ord_cols = ([F.col("warc_ts")] if extra else []) + \
            [F.col("url"), F.md5(F.col("html"))]
        pg = (with_canonical(pages.select("url", "html", *extra))
              .select(F.col("url_canon").alias("_pg_url"), "html",
                      F.struct(*ord_cols).alias("_ord"))
              .groupBy("_pg_url")
              .agg(F.max_by("html", "_ord").alias("html")))
        df = df.join(pg, df.url_canon == F.col("_pg_url"), "left") \
               .withColumn("rawpagegzipb64", gzip_b64_udf(F.col("html"))) \
               .drop("_pg_url", "html")
    cols = [c for c in _EXPORT_FIELDS if c in df.columns]
    # to_json omits null fields per row — Scrapy exporters likewise skip
    # unset item fields; ignoreNullFields is the default but made explicit.
    return df.select(
        F.to_json(F.struct(*cols),
                  {"ignoreNullFields": "true"}).alias("value")
    )


def write_jsonl(articles: DataFrame, path: str, **kwargs) -> None:
    """UTF-8 JSONLines to a directory (one file per partition — the
    distributed analogue of one-file-per-spider-per-run)."""
    to_jsonl_compat(articles, **kwargs).write.mode("overwrite").text(path)

"""extract_article — the engine's per-row extraction semantics.

This single function reproduces the reference's whole response path in
its exact stage order (SURVEY.md §3, settings-driven middleware order at
/root/reference/RISJbot/settings.py:113-126):

  1. NUL strip                (dlmiddlewares/stripnull.py:31-44)
  2. fake-404 detection       (spmiddlewares/fake404.py:26-65)
  3. JSON-LD capture          (spmiddlewares/extractjsonld.py:38-61)
     — MUST precede script-pruning (settings.py:119-120)
  4. global DOM prune         (spmiddlewares/unwantedcontent.py:45-62,
                               xpaths at settings.py:140-143)
  5. per-site prune + loader batteries in spider order
     (e.g. spiders/uk/guardian.py:11-60)
  6. readability fallback, lazily (loaders.py:399-422)
  7. NLP pipelines            (pipelines/*.py)

It is pure Python over the stdlib DOM so it runs identically inside the
vectorized pandas UDF (risjbot_spark.udfs) and standalone as the pytest
oracle — byte-identity of `bodytext`/`headline` per url is by
construction, then locked by fixtures (SURVEY.md §5).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..html import Node, parse_html, remove_nodes, remove_nodes_batch, xpath
from . import nlp, readability
from .loader import NewsItemLoader
from .metadata import extract_jsonld_blobs, newsarticle_from_jsonld
from .sites import GENERIC, SiteProfile, profile_for

# Global prune list (settings.py:140-143)
UNWANTED_XPATHS = ("//figure", "//script", "//style", "//form")

# Fake-404 detection signatures (settings.py:149-154)
FAKE404_SIGS: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"https?://(www\.)?foxnews\.com/"),
     '//h1[contains(., "Something has gone wrong")]'),
    (re.compile(r"https?://(www\.)?nbcnews\.com/"),
     '//h2[contains(., "This live stream has ended")]'),
)


@dataclass
class ExtractResult:
    item: dict | None          # None when the page was dropped
    status: str                # 'ok' | 'fake404' | 'empty'
    jsonld_failed: int = 0
    links: list[str] | None = None  # S6 outlinks (pre-prune, offsite-filtered)


def is_fake404(html: bytes | str, url: str) -> bool:
    """F3 as a standalone predicate: the Fake404 signature check alone
    (spmiddlewares/fake404.py raises BEFORE the spider callback, so
    side-effecting per-page stages like the comment chase must never
    run on such pages). Parses the page, so reserve it for small host
    subsets; the full extraction applies the same check fused."""
    sigs = [s for rx, s in FAKE404_SIGS if rx.match(url)]
    if not sigs:
        return False
    root = parse_html(html)
    return any(xpath(root, s) for s in sigs)


def _extract_links(root: Node, base_url: str, profile: SiteProfile) -> list[str]:
    """S6 link extraction: all hrefs, absolutized, per-page deduped (the
    reference's `seen = set()`, newssplashcrawlspider.py:57-64), offsite
    links dropped per the profile's allowed_domains (F2,
    offsitedownloadershim.py:9-39). Runs on the RAW DOM — Scrapy's
    LinkExtractor parses the raw body, not the pruned selector."""
    from urllib.parse import urljoin, urlparse

    seen: set[str] = set()
    links: list[str] = []
    for href in xpath(root, "//a/@href"):
        absu = urljoin(base_url, href.strip())
        if not absu.startswith("http") or absu in seen:
            continue
        seen.add(absu)
        if profile.allowed_domains:
            # hostname, not netloc: Scrapy's OffsiteMiddleware matches
            # the port-free, userinfo-free hostname — netloc would drop
            # on-site links like http://host:8080/x
            host = (urlparse(absu).hostname or "").lower()
            if not any(host == d or host.endswith("." + d)
                       for d in profile.allowed_domains):
                continue
        links.append(absu)
    return links


def _apply_rules(loader: NewsItemLoader, root: Node, rules) -> None:
    for fld, expr, post in rules:
        vals = [v for v in xpath(root, expr) if isinstance(v, str)]
        if post is not None:
            vals = list(post(vals))
        if vals:
            loader.add_value(fld, vals)


def _add_fromresponse(loader: NewsItemLoader, url: str, fetchtime) -> None:
    """loaders.py:140-152 — url + HTTP Date header → fetchtime. The raw
    page body is carried as the pages table's `html` binary column instead
    of rawpagegzipb64 (re-encoded only by the compat JSONL writer)."""
    loader.add_value("url", url)
    if fetchtime is not None:
        loader.add_value("fetchtime", str(fetchtime))


def _add_htmlmeta(loader: NewsItemLoader, root: Node) -> None:
    """loaders.py:154-166."""
    _apply_rules(loader, root, (
        ("bylines", 'head/meta[@name="author" or @property="author"]/@content', None),
        ("keywords", 'head/meta[@name="news_keywords"]/@content', None),
        ("keywords", 'head/meta[@name="keywords"]/@content', None),
        ("language", "/html/@lang", None),
    ))


def _add_schemaorg(loader: NewsItemLoader, root: Node, jsonld_blobs: list) -> None:
    """loaders.py:168-256 — JSON-LD NewsArticle merge, then the xpath
    battery over microdata/RDFa-lite attributes."""
    data = newsarticle_from_jsonld(jsonld_blobs)
    loader.add_value("firstpubtime", data.get("datePublished"))
    loader.add_value("modtime", data.get("dateModified"))
    loader.add_value("keywords", data.get("keywords"))
    loader.add_value("headline", data.get("headline"))
    body = data.get("articleBody")
    if isinstance(body, list):
        # array-valued articleBody: the reference passes it through
        # unconditionally and bodytext_in's Join(' ') flattens it — a
        # str-only gate dropped the highest-priority body try entirely
        body = [b for b in body if isinstance(b, str)]
    if body:
        loader.add_value("bodytext", body)
    loader.add_value("section", data.get("articleSection"))
    try:
        loader.add_value("bylines", data["author"]["name"])
    except (ValueError, KeyError, TypeError):
        a = data.get("author")
        if isinstance(a, str):
            a = [a]
        if a:
            loader.add_value("bylines", [x for x in a if isinstance(x, str)])
    try:
        loader.add_value("source", data["publisher"]["name"])
    except (ValueError, KeyError, TypeError):
        pub = data.get("publisher")
        if isinstance(pub, str):
            loader.add_value("source", pub)

    _apply_rules(loader, root, (
        ("firstpubtime",
         '//*[@itemprop="datePublished" or @property="datePublished"]/@content', None),
        ("modtime",
         '//*[@itemprop="dateModified" or @property="dateModified"]/@content', None),
        ("keywords",
         '//*[@itemprop="keywords" or @property="keywords"]/@content', None),
        ("headline",
         '//*[@itemprop="headline" or @property="headline"]//text()', None),
        ("section",
         '//*[@itemprop="articleSection" or @property="articleSection"]/@content', None),
        ("bodytext",
         '//*[@itemprop="articleBody" or @property="articleBody" or '
         '@itemprop="reviewBody" or @property="reviewBody"]//text()', None),
    ))


def _add_opengraph(loader: NewsItemLoader, root: Node) -> None:
    """loaders.py:265-296."""
    _apply_rules(loader, root, (
        ("source", 'head/meta[@property="og:site_name"]/@content', None),
        ("headline", 'head/meta[@property="og:title"]/@content', None),
        ("summary", 'head/meta[@property="og:description"]/@content', None),
        ("modtime", 'head/meta[@property="article:modified_time"]/@content', None),
        ("firstpubtime", 'head/meta[@property="article:published_time"]/@content', None),
        ("section", 'head/meta[@property="article:section"]/@content', None),
        ("bylines", 'head/meta[@property="article:author"]/@content', None),
        ("keywords", 'head/meta[@property="article:tag"]/@content', None),
    ))


def _add_dublincore(loader: NewsItemLoader, root: Node) -> None:
    """loaders.py:298-327."""
    _apply_rules(loader, root, (
        ("headline", 'head/meta[@name="dc.title" or @name="DC.title"]/@content', None),
        ("summary", 'head/meta[@name="dcterms.abstract" or @name="DCTERMS.abstract"]/@content', None),
        ("summary", 'head/meta[@name="dc.description" or @name="DC.description"]/@content', None),
        ("modtime", 'head/meta[@name="dcterms.modified" or @name="DCTERMS.modified"]/@content', None),
        ("firstpubtime", 'head/meta[@name="dcterms.created" or @name="DCTERMS.created"]/@content', None),
        ("source", 'head/meta[@name="dc.publisher" or @name="DC.publisher"]/@content', None),
    ))


def _add_scrapymeta(loader: NewsItemLoader, meta: dict | None) -> None:
    """loaders.py:336-397 — frontier-source metadata (RSS/sitemap feeds,
    original URL, previous-fetch count)."""
    if not meta:
        return
    if meta.get("originalurl"):
        loader.add_value("originalurl", meta["originalurl"])
    rss = meta.get("RSSFeed")
    if rss:
        loader.add_value("headline", rss.get("title"))
        loader.add_value("summary", rss.get("description"))
        loader.add_value("section", rss.get("section"))
        loader.add_value("firstpubtime", rss.get("pubDate"))
    sm = meta.get("NewsSitemap")
    if sm:
        loader.add_value("modtime", sm.get("lastmod"))
        news = sm.get("news")
        if isinstance(news, dict):
            loader.add_value("keywords", news.get("keywords"))
            loader.add_value("firstpubtime", news.get("publication_date"))
            loader.add_value("headline", news.get("title"))
    if meta.get("refetchcontrol_previous") is not None:
        loader.add_value("previousfetches", int(meta["refetchcontrol_previous"]))


def _add_readability(loader: NewsItemLoader, root: Node,
                     html_text: str | None = None) -> None:
    """loaders.py:399-422 — only when headline/bodytext still missing
    (the lazy short-circuit at :403-406 is load-bearing). Prefers the
    real readability-lxml seam when that package is importable
    (reference-identical values); heuristic otherwise."""
    need_title = not loader.get_output_value("headline")
    need_body = not loader.get_output_value("bodytext")
    if not need_title and not need_body:
        return
    use_real = readability.use_real() and html_text is not None
    if use_real:
        # ONE Document parse covers both fields (reference builds
        # readified_doc once, loaders.py:408)
        title, texts = readability.extract_from_html(
            html_text, want_title=need_title, want_body=need_body)
    else:
        title = readability.short_title(root) if need_title else None
        texts = readability.body_candidate_texts(root) if need_body else []
    if need_title and title:
        loader.add_value("headline", title)
    if need_body and texts:
        loader.add_value("bodytext", texts)


def _run_nlp(item: dict) -> dict:
    """Item pipelines in declared order: Sentiment(100) → WordCount(200)
    → NamedPeople / ReadingAge (settings-optional) — pipelines/*.py."""
    body = item.get("bodytext")
    if body:
        pol, subj = nlp.sentiment(body)
        item["sentiment"] = pol
        item["subjectivity"] = subj
        item["wordcount"] = nlp.wordcount(body)
        item["namedpeople"] = nlp.named_people(body)
        scores = nlp.reading_scores(body)
        if scores is not None:
            item["fleschreadingease"], item["kincaidgradelevel"] = scores
    return item


def extract_article(
    html: bytes | str,
    url: str,
    fetchtime=None,
    meta: dict | None = None,
    profile: SiteProfile | None = None,
    run_nlp: bool = True,
) -> ExtractResult:
    """Full page → NewsItem dict. The one DOM parse is reused by every
    battery (the reference's parse-once constraint, SURVEY.md §4)."""
    root = parse_html(html)  # stripnull fused here

    for regex, sig_xpath in FAKE404_SIGS:
        if regex.match(url) and xpath(root, sig_xpath):
            return ExtractResult(None, "fake404")

    if profile is None:
        profile = profile_for(url)
    links = _extract_links(root, url, profile)  # before any pruning

    jsonld_blobs, jsonld_failed = extract_jsonld_blobs(root)

    # batched: one shared doc index for the content-free prunes (exact
    # sequential semantics — see remove_nodes_batch)
    remove_nodes_batch(root, (*UNWANTED_XPATHS, *profile.prune))

    from .dates import parse_datetime as _pd

    rel_base = _pd(str(fetchtime)) if fetchtime is not None else None
    loader = NewsItemLoader(relative_base=rel_base)
    if profile.source:
        loader.add_value("source", profile.source)
    _apply_rules(loader, root, profile.pre_rules)

    _add_fromresponse(loader, url, fetchtime)
    _add_htmlmeta(loader, root)
    if profile.use_schemaorg:
        _add_schemaorg(loader, root, jsonld_blobs)
    if profile.use_opengraph:
        _add_opengraph(loader, root)
    if profile.use_dublincore:
        _add_dublincore(loader, root)
    _add_scrapymeta(loader, meta)

    _apply_rules(loader, root, profile.post_rules)
    for expr, fld, value in profile.conditional_values:
        if xpath(root, expr):
            loader.add_value(fld, value)

    for note in profile.notes_const:
        loader.add_value("notes", note)
    for expr, note in profile.notes_conditional:
        if xpath(root, expr):
            loader.add_value("notes", note)

    if profile.use_readability:
        html_text = (html if isinstance(html, str)
                     else bytes(html).decode("utf-8", "replace"))
        _add_readability(loader, root, html_text=html_text)

    item = loader.load_item()
    if not item.get("bodytext") and not item.get("headline"):
        return ExtractResult(item or None, "empty", jsonld_failed, links)
    if run_nlp:
        item = _run_nlp(item)
    return ExtractResult(item, "ok", jsonld_failed, links)

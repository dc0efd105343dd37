"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Everything is a pure function of the row id (no RNG state), so generation
is distributed-safe and order-independent: `spark.range(n).mapInPandas(...)`
produces identical rows at any partitioning — the property that lets the
same corpus back unit tests (pure Python), correctness runs, and the
local[8]-vs-local[32] scaling bench.

Shape per BASELINE.json input_hint: (url, warc_ts, html binary, text, lang).
Host distribution is Zipf-skewed — one hot host ≈ 40-50% of rows — to
exercise the politeness scheduler's skew handling (north_rule).
The `text` column carries the expected extracted bodytext (computed with
the same semantics module the UDF uses; pipeline-identity surface)."""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta, timezone

from .extract import extract_article

EPOCH = datetime(2017, 3, 1, tzinfo=timezone.utc)

# (host, weight, lang) — hot-host skew on theguardian.com; www.cnn.com
# exercises EquivalentDomains; dailymail URLs carry tracking junk.
HOSTS: tuple[tuple[str, int, str], ...] = (
    ("www.theguardian.com", 45, "en"),
    ("www.bbc.co.uk", 12, "en"),
    ("edition.cnn.com", 8, "en"),
    ("www.cnn.com", 5, "en"),
    ("www.nytimes.com", 8, "en"),
    ("www.dailymail.co.uk", 6, "en"),
    ("www.washingtonpost.com", 5, "en"),
    ("www.foxnews.com", 4, "en"),
    ("www.nbcnews.com", 2, "en"),
    ("www.example.com", 2, "en"),
    ("de.beispiel.example", 2, "de"),
    ("fr.exemple.example", 1, "fr"),
)
_CUM: list[tuple[int, str, str]] = []
_total = 0
for _h, _w, _lang in HOSTS:
    _total += _w
    _CUM.append((_total, _h, _lang))

SECTIONS = ("politics", "business", "world", "sport", "science", "culture")

_WORDS = (
    "government economy market report minister election crisis growth "
    "policy study climate technology health science leaders agreement "
    "industry strike vote budget trade deal court ruling investigation"
).split()

_NAMES = ("Jane Doe", "John Smith", "Maria Garcia", "Wei Chen", "Amir Khan",
          "Anna Kowalska", "Liam Murphy", "Sofia Rossi")

_SENT_WORDS = ("good", "bad", "strong", "fear", "win", "loss", "happy", "crisis")


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _pick(seed: str, seq):
    return seq[_h64(seed) % len(seq)]


def host_lang_for(i: int) -> tuple[str, str]:
    r = _h64(f"host:{i}") % _total
    for cum, h, lang in _CUM:
        if r < cum:
            return h, lang
    return _CUM[-1][1], _CUM[-1][2]


def url_for(i: int) -> str:
    host, _ = host_lang_for(i)
    section = _pick(f"sec:{i}", SECTIONS)
    ts = warc_ts_for(i)
    slug = f"story-{i}"
    url = f"https://{host}/{section}/{ts.year}/{ts.month:02d}/{slug}"
    if host == "www.dailymail.co.uk":
        url += f"?ITO={i % 97}"  # tracking junk the canonicalizer strips
    return url


def warc_ts_for(i: int) -> datetime:
    return EPOCH + timedelta(seconds=_h64(f"ts:{i}") % (30 * 86400))


def bodytext_sentences(i: int, n_sent: int = 6) -> list[str]:
    sents = []
    for k in range(n_sent):
        words = [_pick(f"w:{i}:{k}:{j}", _WORDS) for j in range(9)]
        words[2] = _pick(f"s:{i}:{k}", _SENT_WORDS)
        name = _pick(f"n:{i}:{k}", _NAMES)
        sents.append(
            f"The {words[0]} {words[1]} was {words[2]} as {name} said the "
            f"{words[3]} {words[4]} would {words[5]} the {words[6]} "
            f"{words[7]} {words[8]}."
        )
    return sents


def _iso(i: int, offs: int = 0) -> str:
    return (warc_ts_for(i) - timedelta(hours=offs)).strftime("%Y-%m-%dT%H:%M:%SZ")


PATHWAYS = ("jsonld", "microdata", "opengraph", "dublincore", "readability",
            "conflict", "fake404", "nulbytes", "badjsonld")


def pathway_for(i: int, host: str) -> str:
    if host in ("www.foxnews.com", "www.nbcnews.com") and i % 11 == 0:
        return "fake404"
    # all non-fake404 pathways, weighted: the 6 main templates dominate,
    # nulbytes/badjsonld appear at ~1/16 each so the StripNull parse path
    # and the JSON-LD failure counter are actually exercised (a plain %6
    # left both branches dead and FIXTURES.md's claims untrue)
    h = _h64(f"pw:{i}") % 16
    if h == 14:
        return "nulbytes"
    if h == 15:
        return "badjsonld"
    return PATHWAYS[h % 6]


def build_html(i: int) -> tuple[str, str, str]:
    """→ (html, lang, pathway). Deterministic template per pathway."""
    host, lang = host_lang_for(i)
    pw = pathway_for(i, host)
    section = _pick(f"sec:{i}", SECTIONS)
    headline = f"Headline {i}: {_pick(f'h:{i}', _WORDS)} {_pick(f'h2:{i}', _WORDS)}"
    summary = f"Summary of story {i}."
    author = _pick(f"a:{i}", _NAMES)
    keywords = f"{_pick(f'k1:{i}', _WORDS)},{_pick(f'k2:{i}', _WORDS)}"
    sents = bodytext_sentences(i)
    paras = "".join(f"<p>{s}</p>" for s in sents)
    junk = ("<figure><figcaption>figure junk</figcaption></figure>"
            "<script>var junk=1;</script><form>form junk</form>")

    head_bits = [f"<title>{headline} | Site</title>"]
    body_bits = []

    if pw == "fake404":
        sig = ("Something has gone wrong" if host == "www.foxnews.com"
               else "This live stream has ended")
        tag = "h1" if host == "www.foxnews.com" else "h2"
        html = (f'<html lang="{lang}"><head><title>404</title></head>'
                f"<body><{tag}>{sig}</{tag}><p>missing page</p></body></html>")
        return html, lang, pw

    if pw in ("jsonld", "conflict", "badjsonld"):
        ld = {
            "@context": "https://schema.org",
            "@type": "NewsArticle",
            "headline": headline,
            "datePublished": _iso(i, 30),
            "dateModified": _iso(i, 2),
            "keywords": keywords,
            "articleSection": section,
            "author": {"@type": "Person", "name": author},
            "publisher": {"@type": "Organization", "name": f"Publisher {host}"},
        }
        head_bits.append(
            f'<script type="application/ld+json">{json.dumps(ld)}</script>')
        if pw == "badjsonld":
            head_bits.append('<script type="application/ld+json">{bad json,</script>')
        body_bits.append(f'<div itemprop="articleBody">{paras}{junk}</div>')
        if pw == "conflict":
            head_bits.append(f'<meta property="og:title" content="OG WRONG {i}">')
            head_bits.append(f'<meta property="article:section" content="ogsection">')
    elif pw == "microdata":
        head_bits.append(f'<meta itemprop="datePublished" content="{_iso(i, 30)}">')
        head_bits.append(f'<meta itemprop="dateModified" content="{_iso(i, 2)}">')
        head_bits.append(f'<meta itemprop="keywords" content="{keywords}">')
        body_bits.append(f'<h1 itemprop="headline">{headline}</h1>')
        body_bits.append(f'<div itemprop="articleBody">{paras}{junk}</div>')
    elif pw == "opengraph":
        head_bits += [
            f'<meta property="og:site_name" content="Site {host}">',
            f'<meta property="og:title" content="{headline}">',
            f'<meta property="og:description" content="{summary}">',
            # millisecond-ISO edge case (FIXTURES §8): _iso ends in 'Z', so
            # splice '.123' BEFORE it — appending made 'Z.123Z', which no
            # parser accepts and firstpubtime silently nulled
            f'<meta property="article:published_time" '
            f'content="{_iso(i, 30)[:-1]}.123Z">',
            f'<meta property="article:modified_time" content="{_iso(i, 2)}">',
            f'<meta property="article:section" content="{section}">',
            f'<meta property="article:author" content="By {author}">',
        ]
        body_bits.append(f'<div itemprop="articleBody">{paras}</div>')
    elif pw == "dublincore":
        head_bits += [
            f'<meta name="dc.title" content="{headline}">',
            f'<meta name="dcterms.abstract" content="{summary}">',
            f'<meta name="dcterms.created" content="{_iso(i, 30)}">',
            f'<meta name="dc.publisher" content="Publisher {host}">',
        ]
        body_bits.append(f'<div itemprop="articleBody">{paras}</div>')
    else:  # readability — no tagged pathways at all
        body_bits.append(f"<article>{paras}</article>")

    head_bits.append(f'<meta name="author" content="{author}">')
    head_bits.append(f'<meta name="keywords" content="{keywords}">')
    body = "".join(body_bits)
    # deterministic outlinks: 3 same-corpus stories + 1 offsite link, so the
    # link-following source (S6) and offsite filter (F2) have real work
    links = "".join(
        f'<a href="{url_for(_h64(f"lnk:{i}:{j}") % max(i, 1))}">more</a>'
        for j in range(3)
    ) + '<a href="https://offsite.invalid/x">offsite</a>'
    html = (f'<html lang="{lang}"><head>{"".join(head_bits)}</head>'
            f"<body><article>{body}</article>"
            f'<nav class="related">{links}</nav>'
            f'<div class="submeta">submeta junk</div><aside>aside junk</aside>'
            f"</body></html>")
    if pw == "nulbytes":
        html = html.replace("</p><p>", "</p>\x00<p>")
    return html, lang, pw


def page_row(i: int) -> dict:
    url = url_for(i)
    html, lang, pw = build_html(i)
    res = extract_article(html.encode(), url, run_nlp=False)
    text = (res.item or {}).get("bodytext")
    return {
        "url": url,
        "warc_ts": warc_ts_for(i),
        "html": html.encode(),
        "text": text,
        "lang": lang,
    }


# ---------------------------------------------------------------------------
# Spark-side distributed generation
# ---------------------------------------------------------------------------

def pages_df(spark, n_rows: int, partitions: int = 32):
    """Distributed deterministic pages table: spark.range → mapInPandas."""
    import pandas as pd

    from .schema import PAGES_SCHEMA

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([page_row(int(i)) for i in pdf["id"]])

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def seed_urls(n_rows: int, every: int = 3) -> list[dict]:
    """Seed list = deterministic subset of page URLs (+ priorities to
    exercise W1 ordering: a few rows at 100/10/5, FIXTURES.md §2)."""
    seeds = []
    for i in range(0, n_rows, every):
        pri = 100 if i % 50 == 0 else (10 if i % 17 == 0 else (5 if i % 13 == 0 else 0))
        seeds.append({"url": url_for(i), "source_kind": "specified", "priority": pri})
    return seeds


def robots_rows() -> list[dict]:
    """Per-host robots.txt (FIXTURES.md §4): one host disallows a section,
    crawl-delays vary, one host lists a sitemap."""
    rows = []
    for host, _, _ in HOSTS:
        lines = ["User-agent: *"]
        if host == "www.nytimes.com":
            lines.append("Disallow: /sport/")
        if host == "www.theguardian.com":
            lines.append("Crawl-delay: 1")
        if host == "www.bbc.co.uk":
            lines.append(f"Sitemap: https://{host}/sitemaps/news.xml")
        lines.append("Disallow: /private/")
        rows.append({"host": host, "robots_txt": "\n".join(lines)})
    return rows


# ---------------------------------------------------------------------------
# testdata-derived corpus: htmlize the driver's `documents` table
# ---------------------------------------------------------------------------

def docs_to_pages(spark, sf_dir: str, partitions: int = 32):
    """documents(doc_id, text, lang, ...) → a pages table per input_hint,
    deterministically wrapping each document's text in a JSON-LD NewsArticle
    page. Lets the crawl engine run end-to-end on the driver's testdata."""
    import pandas as pd

    from .schema import PAGES_SCHEMA

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                rows.append(doc_page_row(int(doc_id), text or "", lang or "en"))
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return docs.repartition(partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def doc_page_url(doc_id: int, lang: str) -> str:
    return f"https://docs.{lang}.example.com/{doc_id % 10}/doc-{doc_id}"


def doc_page_row(doc_id: int, text: str, lang: str) -> dict:
    url = doc_page_url(doc_id, lang)
    ld = {
        "@context": "https://schema.org",
        "@type": "NewsArticle",
        "headline": f"Document {doc_id}",
        "datePublished": _iso(doc_id, 30),
        "articleSection": "docs",
        "author": {"@type": "Person", "name": "Corpus Author"},
        "publisher": {"@type": "Organization", "name": "Docs Corpus"},
    }
    html = (
        f'<html lang="{lang}"><head><title>Document {doc_id}</title>'
        f'<script type="application/ld+json">{json.dumps(ld)}</script>'
        f'</head><body><article><div itemprop="articleBody">'
        f"<p>{text}</p>"
        f"<figure><figcaption>junk</figcaption></figure>"
        f"</div></article></body></html>"
    )
    res = extract_article(html.encode(), url, run_nlp=False)
    return {
        "url": url,
        "warc_ts": warc_ts_for(doc_id),
        "html": html.encode(),
        "text": (res.item or {}).get("bodytext"),
        "lang": lang,
    }

"""Per-site extraction profiles (the reference's spider roster, data-driven).

The reference encodes each outlet's quirks in a Scrapy spider subclass
(prune lists, extra xpaths, byline/date fixups). Here each outlet is a
declarative :class:`SiteProfile` consumed by the single extraction UDF —
one vectorized code path, N data rows, instead of N code paths. Citations
point at the spider each profile reproduces.

The reference's ``eval``-based callback dispatch
(/root/reference/RISJbot/spmiddlewares/refetchcontrol.py:212-225) is
replaced by this host-keyed registry — the portability wart called out in
SURVEY.md §3 — so profile resolution is a broadcast-friendly pure lookup.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

from .cleaners import split_multiple_byline_string

# An xpath instruction: (field, xpath, post) where post is an optional
# callable applied to the extracted string list before add_value.
XpathRule = tuple


@dataclass(frozen=True)
class SiteProfile:
    name: str = "generic"
    source: str | None = None            # constant source override
    prune: tuple[str, ...] = ()          # per-site DOM deletions
    pre_rules: tuple[XpathRule, ...] = ()   # before the standard batteries
    post_rules: tuple[XpathRule, ...] = ()  # after the standard batteries
    use_dublincore: bool = False
    use_opengraph: bool = True           # reuters skips OG (reuters.py:63)
    use_schemaorg: bool = True           # yahoo skips schema.org (yahoo.py)
    use_readability: bool = True
    notes_const: tuple[str, ...] = ()    # unconditional notes (reuters.py:76)
    # (xpath, note) — note added when xpath matches (telegraph paywall,
    # /root/reference/RISJbot/spiders/uk/telegraph.py:46-47)
    notes_conditional: tuple[tuple[str, str], ...] = ()
    # (xpath, field, value) — constant added to a field when the xpath
    # matches (BBC Newsbeat section,
    # /root/reference/RISJbot/spiders/uk/bbc.py:61-62); applied after
    # post_rules, matching the reference's post-battery call position
    conditional_values: tuple[tuple[str, str, str], ...] = ()
    # offsite filter (F2): drop followed links whose host isn't suffixed by
    # one of these (/root/reference/RISJbot/spiders/uk/independent.py:13-14)
    allowed_domains: tuple[str, ...] = ()


# --- fixup helpers (cited per site) ----------------------------------------

def _bbc_strip_title_dross(vals: list[str]) -> list[str]:
    """BBC titles carry ' - BBC News' style suffixes
    (/root/reference/RISJbot/spiders/uk/bbc.py:36)."""
    if not vals:
        return vals
    return [re.sub(r" - BBC (News(beat)?|Sport)$", "", vals[0])]


_DM_DROSS = re.compile(
    r" for (Dailymail.com|The Daily Mail|Daily Mail Australia|MailOnline)"
)


def _dailymail_bylines(vals: list[str]) -> list[str]:
    """MapCompose(split_multiple_byline_string, dross-sub)
    (/root/reference/RISJbot/spiders/uk/dailymail.py:45-53)."""
    out = []
    for v in vals:
        for tok in split_multiple_byline_string(v):
            out.append(_DM_DROSS.sub("", tok))
    return out


_WAPO_TZ = re.compile(
    r"^([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}[+-])([0-9])([0-9]{2})$"
)


def _wapo_fix_iso_date(vals: list[str]) -> list[str]:
    """WaPo emits '<datetime>-500' instead of '-05:00'
    (/root/reference/RISJbot/spiders/us/washingtonpost.py:59-63)."""
    return [_WAPO_TZ.sub(r"\g<1>0\g<2>:\g<3>", v) for v in vals]


def _uniquify(vals: list[str]) -> list[str]:
    """WaPo bylines are duplicated in markup; uniquised with set()
    (/root/reference/RISJbot/spiders/us/washingtonpost.py:40-42). Sorted
    for determinism (Python set order is insertion-stable only per-run)."""
    return sorted(set(vals))


def _strip_first(vals: list[str]) -> list[str]:
    """TakeFirst + strip (guardian section rule,
    /root/reference/RISJbot/spiders/uk/guardian.py:44)."""
    return [vals[0].strip()] if vals else vals


# --- the registry -----------------------------------------------------------

GENERIC = SiteProfile()

REGISTRY: dict[str, SiteProfile] = {
    # /root/reference/RISJbot/spiders/uk/guardian.py:11-60
    "theguardian.com": SiteProfile(
        name="guardian",
        source="The Guardian",
        prune=('//div[contains(@class, "submeta")]', "//aside"),
        post_rules=(
            ("section", '//a[@data-link-name="article section"]/text()', _strip_first),
            ("bodytext",
             '//article//div[contains(@class, "content__main-column")]'
             '/*[not(contains(@class, "meta"))]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/bbc.py:11-72
    "bbc.co.uk": SiteProfile(
        name="bbc",
        source="BBC News",
        prune=('//*[@class="off-screen"]',),
        pre_rules=(
            ("headline", "head/title/text()", _bbc_strip_title_dross),
        ),
        post_rules=(
            ("bodytext", '//div[contains(@class, "main_article_text")]//text()', None),
            ("bodytext", '//div[contains(@class, "map-body")]//text()', None),
            ("bodytext", '//div[contains(@class, "story-body")]//text()', None),
            ("summary", '//div[contains(@class, "vxp-media__summary")]//text()', None),
            ("bodytext", '//div[contains(@class, "vxp-media__summary")]//text()', None),
            ("bylines", '//span[contains(@class, "byline__name")]/text()', None),
            ("bylines", '//p[contains(@class, "byline")]/text()', None),
            # Sport: byline selected by layout class (bbc.py:69)
            ("bylines",
             '//*[contains(@class, "story__byline")]'
             '//p[contains(@class, "gel-long-primer") and '
             'not(contains(@class, "gel-long-primer-bold"))]/text()', None),
        ),
        conditional_values=(
            # Newsbeat CMS ships no standard metadata (bbc.py:58-62)
            ('//div[contains(@class, "newsbeatlogo")]', "section", "Newsbeat"),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/cnn.py:9-40
    "edition.cnn.com": SiteProfile(
        name="cnn",
        prune=(
            '//div[contains(@class, "read-more-button")]',
            '//div[contains(@class, "el__embedded")]',
            '//div[contains(@class, "owl-carousel")]',
        ),
        post_rules=(
            ("headline", '//article//meta[@itemprop="alternativeHeadline"]/@content', None),
            ("headline", '//h1[contains(@class, "headline")]/text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/nytimes.py:10-50
    "nytimes.com": SiteProfile(
        name="nytimes",
        source="New York Times",
        prune=(
            '//footer[contains(@class, "story-footer")]',
            '//*[contains(@class, "nocontent")]',
            '//*[contains(@class, "visually-hidden")]',
            '//*[contains(@class, "newsletter-signup")]',
        ),
        pre_rules=(
            ("url", 'head/link[@rel="canonical"]/@href', None),
        ),
        post_rules=(
            ("headline", '//*[contains(@class, "Post__headline")]//text()', None),
            ("section", '//*[contains(@class, "Post__kicker")]//text()', None),
            ("bodytext",
             '//*[contains(@class, "story-body") or contains(@class, "Post__body")]//text()',
             None),
            ("bodytext", '//div[contains(@class, "body--story")]//p//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/dailymail.py:12-77
    "dailymail.co.uk": SiteProfile(
        name="dailymail",
        prune=(
            "//script",
            '//*[@style="display:none"]',
            '//div[contains(@class, "related-carousel")]',
        ),
        pre_rules=(
            ("url", 'head/link[@rel="canonical"]/@href', None),
            ("bylines", 'head/meta[@property="article:author"]/@content', _dailymail_bylines),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/washingtonpost.py:11-63
    "washingtonpost.com": SiteProfile(
        name="washingtonpost",
        pre_rules=(
            ("firstpubtime",
             '//*[@itemprop="datePublished" or @property="datePublished"]/@content',
             _wapo_fix_iso_date),
            ("bylines", '//*[@itemprop="author"]//*[@itemprop="name"]//text()', _uniquify),
            ("section", '//*[contains(@class, "headline-kicker")]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/foxnews.py:9-46
    "foxnews.com": SiteProfile(
        name="foxnews",
        use_dublincore=True,
        pre_rules=(
            ("bodytext", '//*[contains(@class, "article-text")]//text()', None),
            ("section", '//*[contains(@class, "section-title")]//text()', None),
            ("section", 'head/meta[@name="prism-section"]/@content', None),
            # bylines not in metadata nor class-labelled (foxnews.py:35)
            ("bylines",
             '//div[contains(@class, "article-info")]'
             '//p[contains(., "By")]/span//text()', None),
        ),
    ),
}


def _title_case(vals: list[str]) -> list[str]:
    """Sun bylines are str.title()'d
    (/root/reference/RISJbot/spiders/uk/sun.py:40)."""
    return [v.title() for v in vals]


def _metro_bylines(vals: list[str]) -> list[str]:
    """' For Metro.co.uk' dross strip
    (/root/reference/RISJbot/spiders/uk/metro.py:46)."""
    return [re.sub(r" For Metro\.co\.uk", "", v, flags=re.IGNORECASE) for v in vals]


def _usatoday_section(vals: list[str]) -> list[str]:
    """'news,world' → 'News'
    (/root/reference/RISJbot/spiders/us/usatoday.py:36-43)."""
    if not vals:
        return vals
    return [vals[0].split(",")[0].title()]


def _abc_strip_timestamp(vals: list[str]) -> list[str]:
    """'Politics — Mar 1, ...' → date part
    (/root/reference/RISJbot/spiders/us/abc.py _strip_timestamp)."""
    return [re.sub(r".* — ", "", v, count=1) for v in vals]


REGISTRY_EXTRA: dict[str, SiteProfile] = {
    # /root/reference/RISJbot/spiders/uk/telegraph.py:9-48
    "telegraph.co.uk": SiteProfile(
        name="telegraph",
        pre_rules=(
            ("section", '//a[contains(@class, "header-breadcrumbs__link")]//text()',
             _strip_first),
            ("bylines", '//main//*[@itemprop="author"]//*[@itemprop="name"]//text()',
             None),
        ),
        notes_conditional=(
            ('//div[contains(@class, "premium-paywall")]', "Premium paywall"),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/mirror.py:9-41
    "mirror.co.uk": SiteProfile(
        name="mirror",
        prune=("//form", '//aside[contains(@class, "read-more-links")]'),
        post_rules=(
            ("bodytext", '//*[contains(@class, "article-body")]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/sun.py:9-55
    "thesun.co.uk": SiteProfile(
        name="sun",
        prune=(
            '//div[contains(@class, "social--fb-page-button")]',
            '//div[contains(@class, "rail--trending")]',
        ),
        pre_rules=(
            ("summary", 'head/meta[@name="description"]/@content', None),
            ("bylines", '//span[contains(@class, "article__author-name")]//text()',
             _title_case),
        ),
        post_rules=(
            ("bodytext",
             '//article//div[contains(@class, "article__content")]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/metro.py:10-49
    "metro.co.uk": SiteProfile(
        name="metro",
        pre_rules=(
            ("bodytext", '//div[contains(@class, "article-body")]//text()', None),
        ),
        post_rules=(
            ("bylines", '//span[contains(@class, "byline")]//a[@rel="author"]//text()',
             _metro_bylines),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/independent.py:9-50 — the parent::
    # axis prune ("More about" pipes list) is approximated by pruning the
    # list container by class (same nodes on real pages).
    "independent.co.uk": SiteProfile(
        name="independent",
        allowed_domains=("independent.co.uk",),
        prune=(
            '//*[contains(@class, "type-gallery")]',
            '//*[contains(@class, "inline-pipes-list")]',
        ),
        pre_rules=(
            ("bylines",
             '//article//*[@itemprop="author"]//*[@itemprop="name"]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/reuters.py:20-76
    "reuters.com": SiteProfile(
        name="reuters",
        source="Reuters [UK]",
        use_opengraph=False,   # add_opengraph commented out (reuters.py:63)
        prune=('//div[contains(@class, "related-content")]',),
        post_rules=(
            ("bodytext", '//span[@id="article-text"]/*[not(@class="author")]//text()',
             None),
            ("summary", '//meta[@name="description"]/@content', None),
        ),
        notes_const=("fetchtime delayed by slow feed",),
    ),
    # /root/reference/RISJbot/spiders/us/usatoday.py:10-69
    "usatoday.com": SiteProfile(
        name="usatoday",
        allowed_domains=("usatoday.com",),
        prune=(
            '//*[contains(@class, "inline-share-tools")]',
            '//*[contains(@class, "article-print-url")]',
            "//aside",
        ),
        pre_rules=(
            ("bylines", 'head/meta[@name="cXenseParse:author"]/@content', None),
            ("section", 'head/meta[@itemprop="articleSection"]/@content',
             _usatoday_section),
            ("summary", '//p[contains(@class, "vgm-video-description")]//text()', None),
            # ms-precision dates: the ms-strip is already inside
            # parse_datetime (the same rewrite, usatoday.py:fix_usatoday_date)
        ),
    ),
    # /root/reference/RISJbot/spiders/us/cbs.py
    "cbsnews.com": SiteProfile(
        name="cbs",
        post_rules=(
            ("bodytext", '//div[contains(@class, "post")]//text()', None),
            ("bodytext", '//div[@itemid="#article-entry"]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/nbc.py
    "nbcnews.com": SiteProfile(
        name="nbc",
        post_rules=(
            ("bodytext", '//div[contains(@class, "article-body")]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/abc.py
    "abcnews.go.com": SiteProfile(
        name="abc",
        post_rules=(
            ("section", "//article/@data-section", None),
            ("modtime", 'head/meta[@name="Last-Modified"]/@content', None),
            ("firstpubtime",
             '//div[contains(@class, "article-meta")]'
             '//span[contains(@class, "timestamp")]/text()', _abc_strip_timestamp),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/yahoo.py
    "yahoo.com": SiteProfile(
        name="yahoo",
        source="Yahoo! News [US]",
        use_schemaorg=False,   # yahoo's parse skips add_schemaorg
        post_rules=(
            ("bodytext", '//div[contains(@class, "canvas-body")]/p/text()', None),
            ("firstpubtime", '//div[contains(@class, "auth-attr")]//time/@datetime',
             None),
            ("bylines",
             '//div[contains(@class, "auth-attr")]'
             '//div[contains(@class, "author-name")]//text()', None),
        ),
    ),
}
REGISTRY.update(REGISTRY_EXTRA)


def _unix_ts_iso(vals: list[str]) -> list[str]:
    """X9 — unix-timestamp attributes → naive-UTC isoformat string (the
    reference calls datetime.fromtimestamp(int(ts)).isoformat(); we pin
    UTC for executor determinism —
    /root/reference/RISJbot/spiders/base/businessinsiderspider.py:60-62,
    buzzfeednewscrawlspider.py:47-50)."""
    from datetime import datetime, timezone

    out = []
    for v in vals:
        try:
            out.append(datetime.fromtimestamp(
                int(v), tz=timezone.utc).replace(tzinfo=None).isoformat())
        except (ValueError, TypeError):
            continue
    return out


REGISTRY_WAVE3: dict[str, SiteProfile] = {
    # /root/reference/RISJbot/spiders/de/bild.py:11-67
    "bild.de": SiteProfile(
        name="bild",
        allowed_domains=("www.bild.de",),
        prune=(
            '//noscript[contains(@class, "warning")]',
            '//strong[contains(., "Ihre neuesten Erkenntnisse lesen Sie mit BILDplus.")]',
            '//aside[contains(@class, "related-topics")]',
            '//div[contains(@class, "tsr-info") and contains(., "Lesen Sie auch")]',
        ),
        pre_rules=(
            ("section", '//div[@id="breadcrumb"]//a[@rel="home"]//text()', None),
        ),
        post_rules=(
            ("bodytext", '//div[contains(@class, "txt")]//text()', None),
            ("bodytext", '//div[contains(@class, "article-body")]//text()', None),
            ("firstpubtime",
             '//time[contains(@class, "authors__pubdate")]/@datetime', None),
            ("firstpubtime",
             '//div[contains(@class, "content")]//time[contains(@class, "date")]/@datetime',
             None),
        ),
    ),
    # /root/reference/RISJbot/spiders/base/businessinsiderspider.py:12-67
    # (the IR=C URL normalization lives in urlnorm.canonicalize_*)
    "businessinsider.com": SiteProfile(
        name="businessinsider",
        prune=(
            '//div[@id="see-also-links"]',
            '//div[contains(@class, "popular-video")]',
            '//span[contains(@class, "caption-source")]',
        ),
        post_rules=(
            ("bodytext", '//div[contains(@class, "post-content")]//text()', None),
            ("bylines", '//a[@rel="author"]//text()', None),
            ("modtime", '//span[@data-bi-format="date"]/@rel', _unix_ts_iso),
            ("section", '//h2[contains(@class, "vert-name")]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/base/huffpospider.py
    "huffpost.com": SiteProfile(
        name="huffpo",
        pre_rules=(
            ("bylines",
             '//*[contains(@class, "author-card__details__name")]//text()', None),
            ("bodytext", '//div[contains(@class, "entry__body")]//text()', None),
            ("bodytext", '//div[@id="mainentrycontent"]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/base/buzzfeedspider.py +
    # buzzfeednewscrawlspider.py (link rules at :32-35)
    "buzzfeed.com": SiteProfile(
        name="buzzfeed",
        allowed_domains=("buzzfeed.com",),
        prune=('//*[contains(@class, "print") or contains(@class, "hidden")]',),
        pre_rules=(
            ("url", 'head/link[@rel="canonical"]/@href', None),
        ),
        post_rules=(
            ("bodytext",
             '//div[@data-print="body"]/*[not(contains(@class, "user-bio") or '
             'contains(@class, "_shares") or contains(@class, "inline-promo"))]//text()',
             None),
            ("bodytext", '//div[contains(@class, "_item_text")]//text()', None),
            ("bodytext",
             '//article//*[contains(@class, "subbuzz-text") or '
             'contains(@class, "subbuzz__title")]//text()', None),
            ("modtime", "//time/@data-unix", _unix_ts_iso),
        ),
    ),
    # /root/reference/RISJbot/spiders/base/vicespider.py — the Splash/JS
    # fetch path is out of scope (S7); extraction battery is standard.
    "vice.com": SiteProfile(
        name="vice",
        allowed_domains=("vice.com",),
        post_rules=(
            # vicespider.py:44 uses positional `(//article)[1]`; vice
            # pages carry one article, so the unpositioned form extracts
            # identically (mini-xpath has no positional predicate)
            ("bodytext",
             '//article//div[contains(@class, "article__body") and '
             'contains(@class, "bod-")]//text()', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/liverpoolecho.py:60-190 — the
    # live comment-API chase (S8) is out of scope; articleid + body/byline
    # selectors reproduced.
    "liverpoolecho.co.uk": SiteProfile(
        name="liverpoolecho",
        pre_rules=(
            ("articleid", '//meta[@property="article:id"]/@content', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/us/prnewswire.py:15-50 — sitemap
    # source; summary/bylines xpaths run BEFORE the standard batteries
    # (they precede add_fromresponse in the reference, so TakeFirst lets
    # them win), firstpubtime after.
    "prnewswire.com": SiteProfile(
        name="prnewswire",
        source="PR Newswire",
        pre_rules=(
            ("summary", '//meta[@name="description"]/@content', None),
            ("bylines", '//meta[@name="author"]/@content', None),
        ),
        post_rules=(
            ("firstpubtime", '//meta[@name="date"]/@content', None),
        ),
    ),
    # /root/reference/RISJbot/spiders/uk/prnewswireuk.py:9-55 — RSS
    # source; adds keywords meta + explicit bodytext/headline xpaths.
    "prnewswire.co.uk": SiteProfile(
        name="prnewswireuk",
        source="PR Newswire [UK]",
        pre_rules=(
            ("summary", '//meta[@name="description"]/@content', None),
            ("bylines", '//meta[@name="author"]/@content', None),
            ("keywords", '//meta[@name="keywords"]/@content', None),
        ),
        post_rules=(
            ("firstpubtime", '//meta[@name="date"]/@content', None),
            ("bodytext", '//div[contains(@class, "news-col")]//text()', None),
            ("headline", "//h1/text()", None),
        ),
    ),
}
REGISTRY.update(REGISTRY_WAVE3)
# de/fr editions share the base parser (businessinsiderde.py / -fr.py)
REGISTRY["businessinsider.de"] = REGISTRY["businessinsider.com"]
REGISTRY["businessinsider.fr"] = REGISTRY["businessinsider.com"]
REGISTRY["huffingtonpost.co.uk"] = REGISTRY["huffpost.com"]
REGISTRY["huffingtonpost.fr"] = REGISTRY["huffpost.com"]


def host_of(url: str) -> str:
    # hostname, not netloc: a ':443' port (or userinfo) in netloc breaks
    # the suffix walk and silently demotes the URL to the GENERIC profile
    try:
        return (urlparse(url).hostname or "").lower()
    except ValueError:
        return ""


def profile_for(url: str) -> SiteProfile:
    """Longest-suffix host match: www.theguardian.com → theguardian.com."""
    host = host_of(url)
    while host:
        p = REGISTRY.get(host)
        if p is not None:
            return p
        _, _, host = host.partition(".")
    return GENERIC

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
    use_readability: bool = True


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
        ),
    ),
}


def host_of(url: str) -> str:
    try:
        return urlparse(url).netloc.lower()
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

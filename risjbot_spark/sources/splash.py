"""S7 — Splash JS-rendering indirection as a fetcher adapter.

The reference's NewsSplashCrawlSpider
(/root/reference/RISJbot/spiders/newssplashcrawlspider.py:10-66) routes
EVERY request — seeds and followed links alike — through a Splash
instance's ``render.html`` endpoint so JS-heavy pages arrive rendered;
the page keeps its logical URL (meta['originalurl']) while the bytes
come from Splash. SPLASH_URL is mandatory there; optional HTTP basic
auth comes from SPLASH_HTTP_USER/PASS (":26-31").

Spark-first shape: the engine's fetch seam is an injectable
``fetcher(url) -> (status, body, date_header)`` callable
(CrawlEngine(fetcher=...) → the paced mapInPandas fetch stage), so JS
rendering is a WRAPPER around any HTTP callable rather than a spider
subclass — every other stage (canonicalization, seen gate, politeness,
extraction) is untouched, exactly like the reference where only the
Request type changes. This container has no network or Splash service,
so the HTTP callable itself stays injectable; the adapter logic (URL
construction, auth, error mapping) is real and tested.
"""

from __future__ import annotations

from urllib.parse import quote, urlparse


def splash_render_url(splash_url: str, target_url: str,
                      endpoint: str = "render.html",
                      wait: float | None = None) -> str:
    """The Splash HTTP-API URL that renders ``target_url``
    (SplashRequest's default GET form: <splash>/render.html?url=...)."""
    base = splash_url.rstrip("/")
    u = f"{base}/{endpoint}?url={quote(target_url, safe='')}"
    if wait is not None:
        u += f"&wait={wait}"
    return u


def splash_fetcher(http, splash_url: str, endpoint: str = "render.html",
                   http_user: str | None = None,
                   http_pass: str | None = None,
                   wait: float | None = None):
    """Wrap ``http`` so every engine fetch renders through Splash.

    ``http(url, auth=None) -> (status, body, date_header)`` is the raw
    transport (injectable — a requests-based callable in deployment, a
    fake in tests); the returned callable satisfies the engine's
    ``fetcher(url)`` contract. SPLASH_URL is mandatory, mirroring the
    reference's from_crawler guard (newssplashcrawlspider.py:22-24)."""
    if not splash_url:
        raise ValueError("SPLASH_URL must be configured")
    if urlparse(splash_url).hostname is None:
        raise ValueError(f"invalid SPLASH_URL: {splash_url!r}")
    auth = (http_user, http_pass) if http_user else None

    def fetch(url: str):
        render = splash_render_url(splash_url, url, endpoint=endpoint,
                                   wait=wait)
        return http(render, auth=auth)

    return fetch

"""URL canonicalization — JVM-side expressions, no Python in the hot path.

Replicates, as pure Catalyst expression chains (whole-stage-codegen
eligible):
  * EquivalentDomains netloc rewriting
    (/root/reference/RISJbot/spmiddlewares/equivalentdomains.py:33-52,
    mapping at settings.py:176) — the canonicalize-before-seen-check
    ordering is load-bearing (settings.py:121-124): stored keys must be
    canonical.
  * Tracking-query stripping (split('?')[0],
    /root/reference/RISJbot/spiders/uk/dailymail.py:16-20)
  * Stable 64-bit keying via xxhash64 — replaces the sha1 request
    fingerprint (refetchcontrol.py:329-336); semantics preserved
    (canonical URL → stable key), hash family swapped for a JVM builtin.

A matching pure-Python `canonicalize_py` backs the in-memory oracle used
by the frontier property tests.
"""

from __future__ import annotations

from urllib.parse import urlparse, urlunparse

from pyspark.sql import Column
from pyspark.sql import functions as F

# settings.py:176 — extend per deployment.
EQUIVALENT_DOMAINS: dict[str, str] = {"www.cnn.com": "edition.cnn.com"}

# Hosts whose URLs carry tracking query junk that must be stripped before
# keying (dailymail.py:16-20 does split('?')[0] on every feed URL).
STRIP_QUERY_HOSTS: tuple[str, ...] = ("dailymail.co.uk",)

# Hosts that must carry IR=C to defeat edition redirects — the reference
# rewrites every request URL (businessinsiderspider.py:13-29), so the
# canonical (seen-keyed) form includes it.
FORCE_IRC_HOSTS: tuple[str, ...] = (
    "businessinsider.com", "businessinsider.de", "businessinsider.fr",
)


def host_expr(url: Column) -> Column:
    """Host (netloc) of a URL as a Catalyst expression."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def _suffix_pred(host: Column, domains) -> Column:
    """host ∈ domain or a true subdomain of it — the dot boundary matters:
    a bare endswith let 'thedailymail.co.uk' match 'dailymail.co.uk' and
    applied per-host rewrites to foreign registrable domains."""
    pred = F.lit(False)
    for h in domains:
        pred = pred | (host == F.lit(h)) | host.endswith(F.lit("." + h))
    return pred


def canonicalize_expr(url: Column) -> Column:
    """url → canonical url, entirely JVM-side.

    Order matters and mirrors the reference pipeline: strip fragment →
    strip tracking query (per-host) → rewrite equivalent domains.
    """
    import re as _re

    # strip fragment always (Scrapy request fingerprints ignore fragments)
    u = F.split(url, "#", 2).getItem(0)
    host = host_expr(u)

    # per-host query stripping
    u = F.when(_suffix_pred(host, STRIP_QUERY_HOSTS),
               F.split(u, r"\?", 2).getItem(0)).otherwise(u)

    # equivalent-domain rewrite when the netloc is EXACTLY the mapped
    # domain (the reference middleware matches netloc equality); dots
    # escaped, and the lookahead accepts end-of-url/query as well as '/'
    # — the old '/'-suffixed unescaped pattern missed bare home URLs and
    # false-matched hosts where '.' aligned with any character
    for old, new in EQUIVALENT_DOMAINS.items():
        # (?i): hosts are case-insensitive — the Python twin matches
        # netloc.lower(), so 'WWW.cnn.com' must rewrite here too or the
        # twins assign different seen-set keys to one page. The scheme
        # is emitted as a lowercase literal because the twin's
        # urlunparse() lowercases it on rewrite (two patterns, one per
        # scheme, so no captured-case leaks through).
        esc = _re.escape(old)
        u = F.regexp_replace(
            u, rf"(?i)^https://{esc}(?=/|\?|$)", f"https://{new}")
        u = F.regexp_replace(
            u, rf"(?i)^http://{esc}(?=/|\?|$)", f"http://{new}")

    # force IR=C for edition-redirect hosts (F6)
    needs_irc = _suffix_pred(host, FORCE_IRC_HOSTS) & ~u.contains("IR=C")
    u = F.when(
        needs_irc & u.contains("?"), F.concat(u, F.lit("&IR=C"))
    ).when(needs_irc, F.concat(u, F.lit("?IR=C"))).otherwise(u)
    return u


def url_hash_expr(url_canon: Column) -> Column:
    return F.xxhash64(url_canon)


def with_canonical(df, url_col: str = "url"):
    """Add url_canon / url_hash / host columns to a frontier DataFrame."""
    df = df.withColumn("url_canon", canonicalize_expr(F.col(url_col)))
    return (
        df.withColumn("url_hash", url_hash_expr(F.col("url_canon")))
          .withColumn("host", host_expr(F.col("url_canon")))
    )


# ---------------------------------------------------------------------------
# pure-Python twin (oracle / tests)
# ---------------------------------------------------------------------------

def _suffix_match_py(host: str, domains) -> bool:
    return any(host == h or host.endswith("." + h) for h in domains)


def canonicalize_py(url: str) -> str:
    url = url.split("#", 1)[0]
    parts = urlparse(url)
    # hostname, not netloc: matches Spark's parse_url(HOST), which strips
    # port and userinfo — the twins must key rules identically
    host = (parts.hostname or "").lower()
    if _suffix_match_py(host, STRIP_QUERY_HOSTS):
        url = url.split("?", 1)[0]
        parts = urlparse(url)
    # http(s) only, like the Spark expression's ^(https?://) anchor
    if (parts.scheme.lower() in ("http", "https")
            and parts.netloc.lower() in EQUIVALENT_DOMAINS):
        parts = parts._replace(netloc=EQUIVALENT_DOMAINS[parts.netloc.lower()])
        url = urlunparse(parts)
    if _suffix_match_py(host, FORCE_IRC_HOSTS) and "IR=C" not in url:
        url += "&IR=C" if "?" in url else "?IR=C"
    return url


def host_py(url: str) -> str:
    """Python twin of host_expr: port- and userinfo-free hostname."""
    return (urlparse(url).hostname or "").lower()

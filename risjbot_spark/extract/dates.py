"""Deterministic date parsing with the reference's quirks.

Mirrors the behavior of ``wrapped_parse`` in the reference
(/root/reference/RISJbot/loaders.py:54-68): millisecond-precision ISO
strings are stripped to seconds before parsing, unparseable input yields
``None``, and results are timezone-aware.

The reference delegates to the ``dateparser`` package (not in this
container); we cover its deterministic subset — ISO-8601, RFC-2822 HTTP
dates, common editorial formats, German/French month-name dates (the
de/fr editions' spiders, e.g. spiders/de/bild.py, spiders/fr/huffpofr.py,
routinely surface localized textual dates), and relative phrases
("2 hours ago", "vor 3 Stunden", "il y a 5 minutes") anchored to an
explicit ``relative_base`` — the page's fetch time, which is what
dateparser's wall-clock "now" amounts to at crawl time, but passed as a
literal so results are reproducible across executors (dateparser would
also attach the *local* zone, nondeterministic on a cluster).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from email.utils import parsedate_to_datetime

# Same millisecond-strip rewrite the reference applies before parsing:
# 2017-02-27T18:02:16.787Z -> 2017-02-27T18:02:16Z
_MS_RE = re.compile(
    r"^([0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})\.[0-9]+"
)

# "Mon, 27 Feb 2017 18:02:16 GMT" / "27 Feb 2017 18:02:16 +0000"
_RFC2822_RE = re.compile(
    r"^(?:[A-Z][a-z]{2},\s+)?\d{1,2}\s+[A-Z][a-z]{2}\s+\d{4}\s+\d{2}:\d{2}"
)

_PLAIN_FORMATS = (
    "%b %d, %Y, %I:%M %p",
    "%B %d, %Y, %I:%M %p",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d",
    "%B %d, %Y %H:%M",
    "%B %d, %Y",
    "%b %d, %Y",
    "%d %B %Y %H:%M",
    "%d %B %Y",
    "%d %b %Y",
    # slash dates: MDY FIRST — dateparser's default DATE_ORDER is 'MDY',
    # so the reference reads '03/04/2017' as March 4; DMY stays as the
    # fallback for day>12 forms ('27/02/2017') which MDY rejects,
    # matching dateparser's give-the-parseable-order behavior
    "%m/%d/%Y %H:%M",
    "%m/%d/%Y",
    "%d/%m/%Y %H:%M",
    "%d/%m/%Y",
)


# German/French month names (full + common abbreviations) → English.
# Longest-first matching so "Juli"/"Juni" beat "Jul"/"Jun" etc.
_MONTH_MAP = {
    # German
    "januar": "January", "februar": "February", "märz": "March",
    "maerz": "March", "april": "April", "mai": "May", "juni": "June",
    "juli": "July", "august": "August", "september": "September",
    "oktober": "October", "november": "November", "dezember": "December",
    "jan": "Jan", "feb": "Feb", "mär": "Mar", "okt": "Oct", "dez": "Dec",
    # French
    "janvier": "January", "février": "February", "fevrier": "February",
    "mars": "March", "avril": "April", "juin": "June", "juillet": "July",
    "août": "August", "aout": "August", "septembre": "September",
    "octobre": "October", "novembre": "November", "décembre": "December",
    "decembre": "December",
    "janv": "Jan", "févr": "Feb", "juil": "Jul", "sept": "Sep",
    "déc": "Dec",
}
_MONTH_RE = re.compile(
    # \b BEFORE the optional dot, which is then consumed — with \.?\b the
    # engine backtracks to the empty alternative and leaves "Dez." as
    # "Dec." behind, which strptime %b rejects
    r"\b(" + "|".join(sorted(map(re.escape, _MONTH_MAP),
                             key=len, reverse=True)) + r")\b\.?",
    re.IGNORECASE,
)

# relative phrases: "(in) N unit(s) ago" / "vor N Stunden" / "il y a N
# heures"; a/an/eine(r|m)/un(e) count as 1
_REL_UNIT_SECS = {
    # English
    "second": 1, "seconds": 1, "sec": 1, "secs": 1,
    "minute": 60, "minutes": 60, "min": 60, "mins": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
    # German
    "sekunde": 1, "sekunden": 1, "minuten": 60, "stunde": 3600,
    "stunden": 3600, "tag": 86400, "tagen": 86400, "tage": 86400,
    "woche": 604800, "wochen": 604800,
    # French
    "seconde": 1, "secondes": 1, "heure": 3600, "heures": 3600,
    "jour": 86400, "jours": 86400, "semaine": 604800, "semaines": 604800,
}
# month/year units are CALENDAR shifts, not fixed seconds — dateparser
# (via dateutil.relativedelta) subtracts whole months with day clamping
# ("3 months ago" from May 31 → Feb 28), and years are 12 such months
_REL_UNIT_MONTHS = {
    "month": 1, "months": 1, "monat": 1, "monate": 1, "monaten": 1,
    "mois": 1,
    "year": 12, "years": 12, "jahr": 12, "jahre": 12, "jahren": 12,
    "an": 12, "ans": 12, "année": 12, "années": 12, "annee": 12,
    "annees": 12,
}
_REL_RE = re.compile(
    r"^(?:(vor|il\s+y\s+a)\s+)?"
    r"(\d{1,4}|an|a|eine[rm]?|eine|une|un)\s+"
    r"([a-zäöüé]+?)\s*(ago)?$",
    re.IGNORECASE,
)

# bare named-day words → whole days before the base, time-of-day kept
# (dateparser's RELATIVE_BASE semantics: "yesterday" = now - 1 day)
_NAMED_DAYS = {
    "today": 0, "tonight": 0, "heute": 0, "aujourd'hui": 0,
    "aujourd’hui": 0,
    "yesterday": 1, "gestern": 1, "hier": 1,
    "vorgestern": 2, "avant-hier": 2,
}


def _parse_relative(s: str) -> tuple[str, int] | None:
    """('secs'|'months', n) before the base for a relative phrase, else
    None. For counted units the marker ('ago' / 'vor' / 'il y a') is
    REQUIRED — a bare '3 days' is not a relative date (dateparser
    likewise needs the preposition); named days are markers themselves."""
    low = s.strip().lower()
    if low in _NAMED_DAYS:
        return "secs", _NAMED_DAYS[low] * 86400
    m = _REL_RE.match(low)
    if not m:
        return None
    marker_pre, n_str, unit, marker_post = m.groups()
    if not marker_pre and not marker_post:
        return None
    n = 1 if not n_str.isdigit() else int(n_str)
    secs = _REL_UNIT_SECS.get(unit)
    if secs is not None:
        return "secs", n * secs
    months = _REL_UNIT_MONTHS.get(unit)
    if months is not None:
        return "months", n * months
    return None


def _shift_months_back(dt: datetime, months: int) -> datetime:
    """Calendar-aware month subtraction with day clamping — the
    dateutil.relativedelta semantics dateparser applies."""
    import calendar

    y, m = dt.year, dt.month - months
    y += (m - 1) // 12
    m = (m - 1) % 12 + 1
    return dt.replace(year=y, month=m,
                      day=min(dt.day, calendar.monthrange(y, m)[1]))


def _localized_to_english(s: str) -> str | None:
    """Rewrite German/French textual dates into strptime-able English:
    month-name translation, German day-dot ('27. Februar' → '27'),
    French 'à 18h02' → '18:02'. Returns None when no month matched (the
    string is not a localized date — don't touch it)."""
    out, n = _MONTH_RE.subn(lambda m: _MONTH_MAP[m.group(1).lower()], s)
    if n == 0:
        return None
    out = re.sub(r"\b(\d{1,2})\.\s*", r"\1 ", out)      # german day dot
    out = re.sub(r"\bà\s+", "", out)                     # french "à 18h02"
    out = re.sub(r"\b(\d{1,2})h(\d{2})\b", r"\1:\2", out)
    out = re.sub(r"\s+", " ", out).strip(" ,")
    return out


def to_str(s) -> str | None:
    if isinstance(s, bytes):
        return s.decode("utf-8")
    return s


def parse_datetime(s, relative_base: datetime | None = None) -> datetime | None:
    """Parse a date/time string; ``None`` on failure (never raises).

    ``relative_base`` anchors relative phrases ("2 hours ago", "vor 3
    Stunden"); without it they parse to None — the caller (the
    extraction loader) passes the page's fetch time, keeping results a
    pure function of the row."""
    s = to_str(s)
    if not isinstance(s, str):
        return None
    s = _MS_RE.sub(r"\1", s).strip()
    if not s:
        return None

    iso = s[:-1] + "+00:00" if s.endswith("Z") else s
    try:
        dt = datetime.fromisoformat(iso)
        return _aware(dt)
    except ValueError:
        pass

    # RFC 2822 ("Mon, 27 Feb 2017 18:02:16 GMT" — every HTTP Date header)
    # is shape-gated so it runs FIRST for those strings (skipping 15
    # doomed strptime attempts) but never swallows AM/PM editorial
    # timestamps, which parsedate_to_datetime silently mis-parses.
    if _RFC2822_RE.match(s):
        try:
            dt = parsedate_to_datetime(s)
            if dt is not None:
                return _aware(dt)
        except (TypeError, ValueError):
            pass

    for fmt in _PLAIN_FORMATS:
        try:
            return _aware(datetime.strptime(s, fmt))
        except ValueError:
            continue

    # German/French textual dates ("27. Februar 2017", "12 février 2017
    # à 18h02") normalize to English and retry the editorial formats
    loc = _localized_to_english(s)
    if loc is not None:
        for fmt in _PLAIN_FORMATS:
            try:
                return _aware(datetime.strptime(loc, fmt))
            except ValueError:
                continue

    # relative phrases, anchored to the caller-supplied base
    if relative_base is not None:
        rel = _parse_relative(s)
        if rel is not None:
            kind, n = rel
            base = _aware(relative_base)
            if kind == "months":
                return _shift_months_back(base, n)
            return base - timedelta(seconds=n)

    try:  # RFC-ish strings that failed the shape gate
        dt = parsedate_to_datetime(s)
        if dt is not None:
            return _aware(dt)
    except (TypeError, ValueError):
        pass
    return None


def _aware(dt: datetime) -> datetime:
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt


def isoformat(dt: datetime) -> str:
    """Output formatting used for the time fields — ``datetime.isoformat()``
    exactly, matching the reference's output processors
    (/root/reference/RISJbot/loaders.py:78-82)."""
    return dt.isoformat()

"""Deterministic date parsing with the reference's quirks.

Mirrors the behavior of ``wrapped_parse`` in the reference
(/root/reference/RISJbot/loaders.py:54-68): millisecond-precision ISO
strings are stripped to seconds before parsing, unparseable input yields
``None``, and results are timezone-aware.

The reference delegates to the ``dateparser`` package (not in this
container); we cover its deterministic subset — ISO-8601, RFC-2822 HTTP
dates, and common editorial formats — and pin naive datetimes to UTC so
results are reproducible across executors (dateparser would attach the
*local* zone, which is nondeterministic on a cluster).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
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
    "%d/%m/%Y %H:%M",
    "%d/%m/%Y",
)


def to_str(s) -> str | None:
    if isinstance(s, bytes):
        return s.decode("utf-8")
    return s


def parse_datetime(s) -> datetime | None:
    """Parse a date/time string; ``None`` on failure (never raises)."""
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

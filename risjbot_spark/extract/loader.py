"""NewsItem field-accumulation with the reference loader's precedence rules.

The correctness-critical invariant (SURVEY.md §2.5 W2) is *TakeFirst over
add-order*: each field keeps an ordered candidate list and exports the
first non-empty value, so the battery call order (spider override →
response → htmlmeta → schema.org → opengraph → scrapymeta → readability
fallback) defines precedence. Field-specific input/output processor
chains mirror /root/reference/RISJbot/loaders.py:71-131.
"""

from __future__ import annotations

from datetime import datetime

from . import cleaners
from .dates import isoformat, parse_datetime

# Fields whose output processor is Identity (multi-valued export).
_IDENTITY_OUT = {"notes", "rawcomments", "comments"}
_TIME_FIELDS = {"fetchtime", "modtime", "firstpubtime"}

NEWSITEM_FIELDS = [
    "source", "url", "originalurl", "fetchtime", "modtime", "firstpubtime",
    "section", "headline", "summary", "bylines", "bodytext", "keywords",
    "previousfetches", "notes", "language", "articleid", "rawcomments",
    "comments",
]


class NewsItemLoader:
    """Dict-backed stand-in for the reference's NewsLoader.

    ``relative_base`` anchors relative date phrases in time fields
    (loaders.py wrapped_parse → dateparser, whose implicit base is
    wall-clock "now" ≈ the fetch time); passing the fetch time keeps
    extraction a pure function of the row."""

    def __init__(self, relative_base=None):
        self._values: dict[str, list] = {}
        self._relative_base = relative_base

    # -- input side ------------------------------------------------------
    def add_value(self, field: str, value) -> None:
        """Apply the field's input processor and append the result(s)."""
        if value is None:
            return
        values = value if isinstance(value, (list, tuple)) else [value]
        if not values:
            return
        bucket = self._values.setdefault(field, [])

        if field in _TIME_FIELDS:
            # MapCompose(wrapped_parse): parse each; drop failures.
            for v in values:
                dt = parse_datetime(v, relative_base=self._relative_base)
                if dt is not None:
                    bucket.append(dt)
        elif field in ("headline", "summary"):
            # MapCompose(strip, replace_escape_chars, replace_entities)
            for v in values:
                if isinstance(v, str):
                    bucket.append(cleaners.clean_string(v))
        elif field == "bodytext":
            # Compose(Join(' '), escape chars, entities): the whole add call
            # becomes ONE candidate string (a "body try").
            parts = [v for v in values if isinstance(v, str)]
            bucket.append(cleaners.compose_bodytext(parts))
        elif field == "keywords":
            parts = [v for v in values if isinstance(v, str)]
            bucket.append(cleaners.pack_keywords(parts))
        elif field == "bylines":
            parts = [v for v in values if isinstance(v, str)]
            bucket.append(cleaners.pack_bylines(parts))
        else:
            bucket.extend(values)

    # -- output side -----------------------------------------------------
    def get_output_value(self, field: str):
        values = self._values.get(field, [])
        if field in _IDENTITY_OUT:
            return list(values)
        first = cleaners.take_first(values)
        if first is None:
            return None
        if field in _TIME_FIELDS:
            return isoformat(first) if isinstance(first, datetime) else None
        if field in ("keywords", "bylines"):
            return cleaners.unpack_csv(first)
        return first

    def load_item(self) -> dict:
        item = {}
        for field in self._values:
            v = self.get_output_value(field)
            if v is not None and v != [] and v != "":
                item[field] = v
        return item

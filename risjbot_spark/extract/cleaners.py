"""String-cleaning primitives with the reference loader's exact semantics.

These replicate the processor chains declared on the reference's item
loader (/root/reference/RISJbot/loaders.py:32-126): escape-char
replacement, HTML-entity decoding, the byline fluff filters, and the
comma pack/unpack used for keywords/bylines. Byte-identical output of
``compose_bodytext`` is the engine's per-row invariant.
"""

from __future__ import annotations

import re
from collections.abc import Iterable
from html.entities import name2codepoint

# w3lib.html.replace_escape_chars default escape set
_ESCAPE_CHARS = ("\n", "\t", "\r")


def replace_escape_chars(text: str, replace_by: str = " ") -> str:
    for ch in _ESCAPE_CHARS:
        text = text.replace(ch, replace_by)
    return text


# w3lib.html.replace_entities twin (remove_illegal=True, the reference
# loader's default, loaders.py:86/101) — NOT html.unescape, whose HTML5
# table and keep-unknown behavior diverge: w3lib resolves named entities
# against the HTML4 name2codepoint table (so '&lpar;' is NOT an entity),
# REMOVES unresolvable '&Name;' sequences when they end in ';', maps the
# 0x80-0x9f numeric range through cp1252 (the classic smart-quote fix),
# and converts named entities even without a trailing semicolon.
_ENT_RE = re.compile(
    r"&((?P<named>[a-z\d]+)|#(?P<dec>\d+)|#x(?P<hex>[a-f\d]+))(?P<semi>;?)",
    re.IGNORECASE,
)


def replace_entities(text: str) -> str:
    def convert(m: re.Match) -> str:
        g = m.groupdict()
        number = None
        if g["dec"]:
            number = int(g["dec"], 10)
        elif g["hex"]:
            number = int(g["hex"], 16)
        elif g["named"]:
            name = g["named"]
            number = (name2codepoint.get(name)
                      or name2codepoint.get(name.lower()))
        if number is not None:
            try:
                if 0x80 <= number <= 0x9F:
                    return bytes((number,)).decode("cp1252")
                return chr(number)
            except (ValueError, UnicodeDecodeError):
                pass
        return "" if g["semi"] else m.group(0)

    return _ENT_RE.sub(convert, text)


def clean_string(s: str) -> str:
    """headline/summary input chain: strip → escape chars → entities
    (loaders.py:84-89)."""
    return replace_entities(replace_escape_chars(s.strip(), " "))


def compose_bodytext(parts: Iterable[str]) -> str:
    """One bodytext *try*: Join(' ') over the extracted text nodes, then
    escape-char cleanup and entity decoding (loaders.py:97-103). Each
    separate extraction attempt produces one composed string; TakeFirst
    picks the first non-empty try."""
    joined = " ".join(parts)
    return replace_entities(replace_escape_chars(joined, " "))


def remove_byline_fluff(strl: Iterable[str]) -> Iterable[str]:
    """Drop URL-ish entries and leading "By " prefixes (loaders.py:32-38)."""
    for s in strl:
        if s.startswith("http"):
            continue
        s = re.sub(r".*[Bb]y ", r"", s).strip()
        if s:
            yield s


def strip_all(strl: Iterable[str]) -> Iterable[str]:
    for s in strl:
        yield s.strip()


def split_and(strl: Iterable[str]) -> Iterable[str]:
    for s in strl:
        yield from s.split(" and ")


def split_multiple_byline_string(s: str) -> Iterable[str]:
    """Site-variant byline splitter that also drops correspondent/reporter
    title tokens (/root/reference/RISJbot/utils.py:43-49)."""
    for y in s.split(" and "):
        for tok in y.split(","):
            if re.search(r"(correspondent|reporter)", tok, flags=re.IGNORECASE):
                continue
            yield tok


def take_first(values: Iterable):
    """Scrapy TakeFirst: first value that is neither None nor ''."""
    for v in values:
        if v is not None and v != "":
            return v
    return None


def pack_keywords(values: Iterable[str]) -> str:
    """keywords input chain: strip each, join ',' (loaders.py:118)."""
    return ",".join(strip_all(values))


def pack_bylines(values: Iterable[str]) -> str:
    """bylines input chain: strip → fluff removal → ' and ' split → join ','
    (loaders.py:119-122)."""
    return ",".join(split_and(remove_byline_fluff(strip_all(values))))


def unpack_csv(value: str) -> list[str]:
    """keywords/bylines output: TakeFirst'd string split on ','
    (loaders.py:123-126)."""
    return value.split(",")

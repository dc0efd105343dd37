"""JSON-LD harvesting and schema.org NewsArticle merging.

Replicates the behavior of the reference's ExtractJSONLD middleware
(/root/reference/RISJbot/spmiddlewares/extractjsonld.py:38-61) and its
extruct-backed NewsArticle merger
(/root/reference/RISJbot/metadata.py:45-79): JSON-LD <script> blocks are
captured *before* any script-pruning, malformed blocks are skipped, and
NewsArticle blocks (schema.org @context) are dict-merged in document
order — later blocks override earlier keys.
"""

from __future__ import annotations

import json
import re

from ..html import Node, xpath

_SCHEMA_CTX_RE = re.compile(r"https?://schema.org/?")
# extruct's HTML_OR_JS_COMMENTLINE: a leading comment line before the
# JSON payload (seen on pages that wrap JSON-LD in <!-- -->)
_COMMENTLINE_RE = re.compile(r"^\s*(//.*|<!--.*-->)")


def extract_jsonld_blobs(root: Node) -> tuple[list, int]:
    """All parseable JSON-LD blocks in document order, plus failure count.

    Must run before DOM pruning removes <script> nodes — the stage-order
    constraint the reference encodes via middleware priorities
    (/root/reference/RISJbot/settings.py:119-120).
    """
    blobs: list = []
    failed = 0
    for text in xpath(root, '//script[@type="application/ld+json"]/text()'):
        # extruct JsonLdExtractor semantics (the reference's parser,
        # metadata.py:35-43): strict=False tolerates literal control
        # characters inside strings (newlines in articleBody are common
        # in the wild), and a failed parse retries once with a leading
        # HTML/JS comment line stripped
        try:
            parsed = json.loads(text, strict=False)
        except json.JSONDecodeError:
            try:
                parsed = json.loads(
                    _COMMENTLINE_RE.sub("", text), strict=False)
            except json.JSONDecodeError:
                failed += 1
                continue
        # top-level arrays flatten into individual blocks — the
        # reference's JsonLdExtractor does the same, and the NewsArticle
        # merge below only understands dicts (an array-wrapped block
        # would silently contribute nothing)
        if isinstance(parsed, list):
            blobs.extend(parsed)
        else:
            blobs.append(parsed)
    return blobs, failed


def newsarticle_from_jsonld(blobs: list) -> dict:
    """Merge NewsArticle-typed blocks (first-method semantics match the
    reference: every matching block merges, later keys win)."""
    outd: dict = {}
    for d in blobs:
        try:
            if _SCHEMA_CTX_RE.match(d["@context"]) and d["@type"] == "NewsArticle":
                outd.update(d)
        except (KeyError, TypeError):
            continue
    return outd

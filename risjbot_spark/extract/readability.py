"""Readability-style fallback extraction (deterministic stand-in).

The reference falls back to the ``readability-lxml`` package when the
tagged metadata pathways yield no headline/bodytext
(/root/reference/RISJbot/loaders.py:399-422). That package is not in
this container, so we implement a deterministic text-density heuristic
with the same *interface and invocation contract*: it is only invoked
when headline/bodytext are still missing (the lazy-evaluation
short-circuit at loaders.py:403-406 is preserved by the caller), and its
outputs feed the same loader chains.

ADAPTER SEAM: when readability-lxml IS importable, the `*_from_html`
functions reproduce the reference verbatim — Document(html).short_title()
for the headline and lxml's //body//text() over Document.summary() for
the body (loaders.py:408-422) — and the caller prefers them; the
heuristic stays as the in-container fallback and test oracle.
"""

from __future__ import annotations

import re

from ..html import Node, xpath


def _try_readability():
    try:
        import lxml.html  # noqa: F401  (Document.summary() needs it)
        import readability

        readability.Document  # probe the attr the seam uses
        return readability
    except Exception:
        return None


_readability = _try_readability()
HAS_READABILITY_LXML = _readability is not None

# driver-decided pinning — same contract as extract.nlp.pin_backend:
# the per-process probe must not differ silently between driver and
# executors, so the extraction UDF pins the driver's decision
_PINNED: bool | None = None


def pin_backend(flag: bool | None) -> None:
    global _PINNED
    _PINNED = flag


def use_real() -> bool:
    if _PINNED is None:
        return HAS_READABILITY_LXML
    if _PINNED and not HAS_READABILITY_LXML:
        raise RuntimeError(
            "readability-lxml was pinned available by the driver but is "
            "not importable in this worker — install it on every executor "
            "(or pin it off)")
    return _PINNED


def extract_from_html(html_text: str, want_title: bool = True,
                      want_body: bool = True):
    """Reference path, ONE Document per page (the reference builds
    readified_doc once and reuses it, loaders.py:408-422): →
    (short_title | None, body text list). The readability parse is the
    expensive step; parsing twice doubled the hottest fallback path."""
    if not use_real():
        return None, []
    try:
        doc = _readability.Document(html_text)
    except Exception:
        return None, []
    title = None
    if want_title:
        try:
            title = doc.short_title() or None
        except Exception:
            title = None
    texts: list[str] = []
    if want_body:
        try:
            import lxml.html

            reparsed = lxml.html.fromstring(doc.summary())
            texts = list(reparsed.xpath("//body//text()"))
        except Exception:
            texts = []
    return title, texts


def short_title_from_html(html_text: str) -> str | None:
    """Reference path: Document(response.text).short_title()."""
    return extract_from_html(html_text, want_body=False)[0]


def body_texts_from_html(html_text: str) -> list[str]:
    """Reference path: //body//text() over Document.summary()
    (loaders.py:417-422)."""
    return extract_from_html(html_text, want_title=False)[1]

_TITLE_SEPS = re.compile(r"\s+[|\-–—»::]\s+|\s+::\s+|\s+/\s+")

# Containers considered as article-body candidates, and tags whose text
# counts toward a candidate's score.
_CANDIDATE_TAGS = ("article", "main", "section", "div", "body")
_TEXT_TAGS = {"p", "h2", "h3", "li", "blockquote", "pre"}


def short_title(root: Node) -> str | None:
    """Title with site chaff stripped: split on common separators and keep
    the longest multi-word segment (readability's shorten_title analogue)."""
    titles = xpath(root, "head/title/text()")
    if not titles:
        return None
    title = titles[0].strip()
    parts = [p.strip() for p in _TITLE_SEPS.split(title) if p.strip()]
    if len(parts) <= 1:
        return title or None
    multi = [p for p in parts if len(p.split()) > 1]
    pool = multi or parts
    return max(pool, key=len)


def _paragraph_len(node: Node) -> int:
    """Sum of text chars in the candidate's OUTERMOST text-tags: a text
    tag nested in another (p inside blockquote/li) is skipped, since its
    ancestor's text_content() already covers it — double-counting let
    quote/list-heavy junk containers outscore the real body."""
    total = 0

    def walk(n: Node, inside_text_tag: bool) -> None:
        nonlocal total
        is_text = n.tag in _TEXT_TAGS
        if is_text and not inside_text_tag:
            total += len(n.text_content().strip())
        for c in n.children:
            walk(c, inside_text_tag or is_text)

    walk(node, False)
    return total


def body_candidate_texts(root: Node) -> list[str]:
    """Text nodes of the densest article-body candidate, document order."""
    best: Node | None = None
    best_score = 0
    for tag in _CANDIDATE_TAGS:
        for cand in xpath(root, f"//{tag}"):
            score = _paragraph_len(cand)
            if score > best_score:
                best, best_score = cand, score
    if best is None:
        return []
    return list(best.itertext())

"""Lenient HTML parser producing an lxml-like element tree.

Node model: ``text`` is the text immediately after the start tag; ``tail``
is the text after the end tag (lxml convention). This makes document-order
text collection and node-removal semantics match what the reference gets
from lxml (RISJbot prunes DOM nodes with ``getparent().remove(node)``,
which in lxml discards the node *and its tail* — we match that).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

def _first_wins_attrib(attrs) -> dict:
    """Duplicate attributes keep the FIRST occurrence — lxml/libxml2
    semantics; a dict comprehension kept the last and flipped extracted
    metadata on templated markup with repeated attrs."""
    out: dict = {}
    for k, v in attrs:
        if k not in out:
            out[k] = v if v is not None else ""
    return out


class Node:
    __slots__ = ("tag", "attrib", "children", "parent", "text", "tail",
                 "_tag_index")

    def __init__(self, tag: str, attrib: dict | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrib = attrib or {}
        self.children: list[Node] = []
        self.parent = parent
        self.text: str | None = None
        self.tail: str | None = None
        # root-only cache: tag → descendants in document order, built
        # lazily by the selector engine, invalidated by remove_nodes()
        self._tag_index: dict | None = None

    def get(self, key: str, default=None):
        return self.attrib.get(key, default)

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def remove(self, child: "Node") -> None:
        """Remove ``child`` (and its tail) from this node — lxml semantics."""
        self.children.remove(child)
        child.parent = None
        child.tail = None

    def iter(self, tag: str | None = None):
        """Depth-first pre-order iteration over self and descendants."""
        if tag is None or self.tag == tag:
            yield self
        for c in self.children:
            yield from c.iter(tag)

    def itertext(self):
        """All text content under this node, in document order."""
        if self.text:
            yield self.text
        for c in self.children:
            yield from c.itertext()
            if c.tail:
                yield c.tail

    def itertext_with_ids(self):
        """(identity, text) pairs for every text node in this subtree, in
        document order. The identity — (owner element id, slot) — lets
        node-SET consumers deduplicate when context nodes are nested
        (lxml's //x//text() returns each text node once; naive per-context
        itertext() emitted a nested match's text twice)."""
        if self.text:
            yield (id(self), "text"), self.text
        for c in self.children:
            yield from c.itertext_with_ids()
            if c.tail:
                yield (id(c), "tail"), c.tail

    def text_content(self) -> str:
        return "".join(self.itertext())

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} attrs={self.attrib}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        # convert_charrefs=True decodes entities in ordinary text (but not
        # inside script/style), mirroring how lxml exposes decoded text.
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self._stack = [self.root]

    # -- helpers ---------------------------------------------------------
    def _top(self) -> Node:
        return self._stack[-1]

    def _add_text(self, data: str) -> None:
        if not data:
            return
        top = self._top()
        if top.children:
            last = top.children[-1]
            last.tail = (last.tail or "") + data
        else:
            top.text = (top.text or "") + data

    # -- HTMLParser callbacks -------------------------------------------
    def handle_starttag(self, tag, attrs):
        node = Node(tag, _first_wins_attrib(attrs))
        self._top().append(node)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, _first_wins_attrib(attrs))
        self._top().append(node)

    def handle_endtag(self, tag):
        # Lenient close: pop to the nearest matching open tag; ignore strays.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        self._add_text(data)

    def handle_comment(self, data):
        pass  # comments contribute no text (matches xpath text() semantics)

    def handle_decl(self, decl):
        pass

    def unknown_decl(self, data):
        pass


def parse_html(data: bytes | str) -> Node:
    """Parse HTML leniently; returns the document element (usually <html>).

    NUL bytes are stripped before parsing — the reference does the same to
    protect its C-based parser (see the StripNull behavior described in
    /root/reference/RISJbot/dlmiddlewares/stripnull.py:31-44); we preserve
    the behavior so text extraction sees the full page.
    """
    if isinstance(data, bytes):
        data = data.replace(b"\x00", b"").decode("utf-8", errors="replace")
    else:
        data = data.replace("\x00", "")
    builder = _TreeBuilder()
    builder.feed(data)
    builder.close()
    doc = builder.root
    # Document element: first <html> child if present, else the synthetic
    # document node itself (callers treat it as the selector root).
    for c in doc.children:
        if c.tag == "html":
            return c
    return doc

"""DOM + mini-XPath engine tests (the selector surface the batteries use)."""

from risjbot_spark.html import parse_html, remove_nodes, xpath

PAGE = b"""<!DOCTYPE html><html lang="de"><head>
<title>T</title>
<meta name="author" content="A. Writer">
<meta property="og:title" content="OG Title">
<script type="application/ld+json">{"@type":"NewsArticle"}</script>
<script type="text/javascript">var x = '<p>not text</p>';</script>
</head><body>
<article>
 <div class="content__main-column">
  <p>one <b>two</b> three</p>
  <div class="meta">SKIP</div>
  <p>four</p>
 </div>
</article>
<figure><figcaption>cap</figcaption></figure>tailtext
<h1 itemprop="headline">Head <span>Line</span></h1>
</body></html>"""


def _root():
    return parse_html(PAGE)


def test_absolute_attr():
    assert xpath(_root(), "/html/@lang") == ["de"]


def test_relative_meta_or_predicate():
    r = _root()
    assert xpath(r, 'head/meta[@name="author" or @property="author"]/@content') == ["A. Writer"]
    assert xpath(r, 'head/meta[@property="og:title"]/@content') == ["OG Title"]


def test_script_cdata_not_entity_decoded():
    r = _root()
    assert xpath(r, '//script[@type="application/ld+json"]/text()') == ['{"@type":"NewsArticle"}']
    # script content is raw text — the embedded markup is not parsed
    js = xpath(r, '//script[@type="text/javascript"]/text()')
    assert js == ["var x = '<p>not text</p>';"]


def test_descendant_text_document_order():
    r = _root()
    texts = xpath(r, '//*[@itemprop="headline"]//text()')
    assert texts == ["Head ", "Line"]


def test_not_contains_predicate():
    r = _root()
    got = xpath(
        r,
        '//article//div[contains(@class, "content__main-column")]'
        '/*[not(contains(@class, "meta"))]//text()',
    )
    # the loader Join(' ')s these — raw text nodes carry lxml-style spacing
    assert " ".join(got).split() == ["one", "two", "three", "four"]


def test_contains_dot_string_value():
    r = _root()
    assert [n.tag for n in xpath(r, '//h1[contains(., "Head")]')] == ["h1"]
    assert xpath(r, '//h1[contains(., "NOPE")]') == []


def test_remove_drops_tail_like_lxml():
    r = _root()
    assert "tailtext" in "".join(xpath(r, "//body//text()"))
    remove_nodes(r, "//figure")
    body = "".join(xpath(r, "//body//text()"))
    assert "cap" not in body
    assert "tailtext" not in body  # lxml remove() drops the tail too


def test_nul_bytes_stripped():
    r = parse_html(b"<html><body><p>a\x00b</p></body></html>")
    assert xpath(r, "//p/text()") == ["ab"]


def test_lenient_unclosed_tags():
    r = parse_html(b"<html><body><p>one<p>two</body></html>")
    assert "one" in "".join(xpath(r, "//body//text()"))
    assert "two" in "".join(xpath(r, "//body//text()"))


def test_child_text_step():
    r = parse_html(b"<html><body><a>x<span>y</span>z</a></body></html>")
    assert xpath(r, "//a/text()") == ["x", "z"]
    assert xpath(r, "//a//text()") == ["x", "y", "z"]


def test_predicate_and_binds_tighter_than_or():
    # XPath precedence: a or (b and c), not (a or b) and c
    doc = parse_html(b'<html><body><div class="a">X</div>'
                     b'<div class="b">Y</div>'
                     b'<div class="b c">Z</div></body></html>')
    got = xpath(doc, '//div[contains(@class,"a") or '
                     'contains(@class,"b") and contains(@class,"c")]//text()')
    assert got == ["X", "Z"]


def test_descendant_attribute_axis():
    doc = parse_html(b'<html><body><a href="x">l</a>'
                     b'<p><a href="y">m</a></p></body></html>')
    assert xpath(doc, "//@href") == ["x", "y"]
    assert xpath(doc, "//p//@href") == ["y"]


def test_nested_descendant_text_emits_each_text_node_once():
    """lxml node-set semantics: //x//text() returns each text node once
    even when a matched container nests another match (bodytext byte
    identity broke with doubled text otherwise)."""
    doc = parse_html(
        b'<html><body><div class="story-body">'
        b'<div class="story-body__inner"><p>Hello</p></div>'
        b'</div></body></html>')
    assert xpath(doc, '//div[contains(@class, "story-body")]//text()') == ["Hello"]


def test_duplicate_attributes_first_wins():
    # lxml/libxml2 keep the first occurrence of a duplicated attribute
    doc = parse_html(
        b'<html><head><meta name="author" content="Jane" content="">'
        b'</head><body></body></html>')
    assert xpath(doc, 'head/meta[@name="author"]/@content') == ["Jane"]


def test_remove_nodes_batch_equals_sequential():
    """Batched pruning must be indistinguishable from sequential — incl.
    a content-reading predicate whose truth depends on earlier removals
    (the script text disappearing changes contains(., ...) matches)."""
    from risjbot_spark.html import parse_html, remove_nodes, remove_nodes_batch

    html = ("<html><body>"
            "<strong>x<script>Lesen Sie auch</script></strong>"
            "<strong>Lesen Sie auch really</strong>"
            "<div class='submeta'>junk</div>"
            "<aside>a</aside><form>f</form>"
            "<p>keep</p></body></html>")
    exprs = ("//script", "//form",
             '//strong[contains(., "Lesen Sie auch")]',
             "//div[contains(@class, \"submeta\")]", "//aside")

    r1 = parse_html(html)
    for e in exprs:
        remove_nodes(r1, e)
    r2 = parse_html(html)
    remove_nodes_batch(r2, exprs)
    assert r1.text_content() == r2.text_content()
    # the first strong survives both ways: its matching text lived in
    # the script, which was removed BEFORE the contains() expression ran
    assert "x" in r2.text_content() and "really" not in r2.text_content()


def test_child_axis_text_document_order():
    """REGRESSION: nested contexts on a child-axis text() step emitted a
    context's own text after its tail; lxml is document-ordered."""
    from risjbot_spark.html import parse_html, xpath

    root = parse_html("<html><body><div><div>A<div>B</div>T</div></div>"
                      "</body></html>")
    assert xpath(root, "//div/div/text()") == ["A", "B", "T"]
    # deeper nesting: tail of an element whose subtree still holds text
    root2 = parse_html(
        "<html><body><div><div>A<div>B<span>S</span></div>T</div></div>"
        "</body></html>")
    assert xpath(root2, "//div/div/text()") == ["A", "B", "T"]


def test_remove_nodes_batch_count_matches_sequential():
    """REGRESSION: victims inside an already-detached subtree inflated
    the batched count vs sequential removal."""
    from risjbot_spark.html import parse_html, remove_nodes, remove_nodes_batch

    html = "<html><body><aside><p>a</p><p>b</p></aside><p>keep</p></body></html>"
    r1 = parse_html(html)
    seq = sum(remove_nodes(r1, e) for e in ("//aside", "//aside//p"))
    r2 = parse_html(html)
    bat = remove_nodes_batch(r2, ("//aside", "//aside//p"))
    assert bat == seq == 1
    assert r1.text_content() == r2.text_content()

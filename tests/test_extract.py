"""Golden extraction-pathway tests (SURVEY.md §5.1): every metadata battery,
TakeFirst precedence conflicts, prune behavior, fake-404, NUL-robustness,
date edge cases, byline fluff — the fixtures lock the extraction semantics
that the Spark UDF shares byte-for-byte."""

from risjbot_spark.extract import extract_article
from risjbot_spark.extract.cleaners import (
    compose_bodytext,
    pack_bylines,
    take_first,
    unpack_csv,
)
from risjbot_spark.extract.dates import parse_datetime
from risjbot_spark.extract.loader import NewsItemLoader


def wrap(body: str, head: str = "", lang: str = "en") -> bytes:
    return f'<html lang="{lang}"><head>{head}</head><body>{body}</body></html>'.encode()


# ---------------------------------------------------------------------------
# metadata pathways
# ---------------------------------------------------------------------------

def test_htmlmeta_pathway():
    html = wrap(
        "<article><p itemprop='articleBody'>Body text here.</p></article>",
        head='<meta name="author" content="Jo Smith">'
             '<meta name="news_keywords" content="a,b">'
             '<meta name="keywords" content="c,d">',
    )
    item = extract_article(html, "https://example.com/x").item
    assert item["bylines"] == ["Jo Smith"]
    assert item["keywords"] == ["a", "b"]  # news_keywords wins (add order)
    assert item["language"] == "en"


def test_jsonld_beats_xpath_and_og():
    html = wrap(
        '<h1 itemprop="headline">Xpath Headline</h1>'
        '<p itemprop="articleBody">body</p>',
        head='<script type="application/ld+json">'
             '{"@context":"http://schema.org","@type":"NewsArticle",'
             '"headline":"JSONLD Headline"}</script>'
             '<meta property="og:title" content="OG Headline">',
    )
    item = extract_article(html, "https://example.com/x").item
    assert item["headline"] == "JSONLD Headline"


def test_malformed_jsonld_skipped():
    html = wrap(
        "<p itemprop='articleBody'>b</p>",
        head='<script type="application/ld+json">{broken</script>'
             '<script type="application/ld+json">'
             '{"@context":"https://schema.org/","@type":"NewsArticle",'
             '"headline":"Good"}</script>',
    )
    res = extract_article(html, "https://example.com/x")
    assert res.jsonld_failed == 1
    assert res.item["headline"] == "Good"


def test_jsonld_requires_newsarticle_type():
    html = wrap(
        "<p itemprop='articleBody'>b</p><h1 itemprop='headline'>Fallback H</h1>",
        head='<script type="application/ld+json">'
             '{"@context":"https://schema.org","@type":"WebSite",'
             '"headline":"NOT THIS"}</script>',
    )
    assert extract_article(html, "https://example.com/x").item["headline"] == "Fallback H"


def test_opengraph_pathway():
    html = wrap(
        "<p itemprop='articleBody'>b</p>",
        head='<meta property="og:site_name" content="Example News">'
             '<meta property="og:title" content="OG Head">'
             '<meta property="og:description" content="OG Sum">'
             '<meta property="article:published_time" content="2017-02-27T18:02:16.787Z">'
             '<meta property="article:section" content="World">'
             '<meta property="article:tag" content="x">',
    )
    item = extract_article(html, "https://example.com/x").item
    assert item["source"] == "Example News"
    assert item["headline"] == "OG Head"
    assert item["summary"] == "OG Sum"
    assert item["section"] == "World"
    # millisecond ISO handled via the ms-strip rewrite
    assert item["firstpubtime"] == "2017-02-27T18:02:16+00:00"


def test_dublincore_pathway():
    html = wrap(
        "<p itemprop='articleBody'>b</p>",
        head='<meta name="dc.title" content="DC Head">'
             '<meta name="dcterms.abstract" content="DC Sum">'
             '<meta name="DC.publisher" content="DC Pub">',
    )
    # dublincore battery is in the foxnews profile
    item = extract_article(html, "https://www.foxnews.com/x").item
    assert item["headline"] == "DC Head"
    assert item["summary"] == "DC Sum"
    assert item["source"] == "DC Pub"


def test_readability_fallback_and_short_circuit():
    html = wrap(
        "<article><p>Long fallback paragraph with plenty of text in it.</p>"
        "<p>Another paragraph to boost the candidate score here.</p></article>",
        head="<title>Story Title Words | SiteName</title>",
    )
    item = extract_article(html, "https://example.com/x").item
    assert item["headline"] == "Story Title Words"
    assert "fallback paragraph" in item["bodytext"]


def test_scrapymeta_rss_and_sitemap():
    html = wrap("<p itemprop='articleBody'>b</p>")
    meta = {
        "originalurl": "https://orig.example.com/a",
        "RSSFeed": {"title": "RSS Head", "description": "RSS Sum",
                    "pubDate": "Mon, 27 Feb 2017 18:02:16 GMT"},
        "NewsSitemap": {"lastmod": "2017-03-01T00:00:00Z",
                        "news": {"keywords": "k1,k2", "title": "SM Head",
                                 "publication_date": "2017-02-28"}},
        "refetchcontrol_previous": 3,
    }
    item = extract_article(html, "https://example.com/x", meta=meta).item
    assert item["originalurl"] == "https://orig.example.com/a"
    assert item["headline"] == "RSS Head"          # RSS added before sitemap
    assert item["summary"] == "RSS Sum"
    assert item["firstpubtime"] == "2017-02-27T18:02:16+00:00"
    assert item["modtime"] == "2017-03-01T00:00:00+00:00"
    assert item["keywords"] == ["k1", "k2"]
    assert item["previousfetches"] == 3


# ---------------------------------------------------------------------------
# pruning / filters
# ---------------------------------------------------------------------------

def test_global_prune_excludes_figure_script_style_form():
    html = wrap(
        "<div itemprop='articleBody'>keep "
        "<figure>FIGJUNK</figure><script>SCRIPTJUNK</script>"
        "<style>STYLEJUNK</style><form>FORMJUNK</form>"
        "<p>also keep</p></div>"
    )
    body = extract_article(html, "https://example.com/x").item["bodytext"]
    assert "keep" in body and "also keep" in body
    for junk in ("FIGJUNK", "SCRIPTJUNK", "STYLEJUNK", "FORMJUNK"):
        assert junk not in body


def test_guardian_site_prune_and_body():
    html = wrap(
        '<article><div class="content__main-column">'
        "<p>real text</p><div class='meta'>META</div></div></article>"
        '<div class="submeta">SUBMETA</div><aside>ASIDE</aside>'
    )
    item = extract_article(html, "https://www.theguardian.com/p/1").item
    assert item["source"] == "The Guardian"
    assert item["bodytext"] == "real text"


def test_fake404_dropped():
    html = wrap("<h1>Something has gone wrong</h1><p itemprop='articleBody'>x</p>")
    res = extract_article(html, "https://www.foxnews.com/x")
    assert res.status == "fake404"
    assert res.item is None
    # same page on a non-matching host is fine
    assert extract_article(html, "https://example.com/x").status == "ok"


def test_nul_studded_page_parses_fully():
    html = wrap("<p itemprop='articleBody'>before\x00after</p>")
    item = extract_article(html, "https://example.com/x").item
    assert item["bodytext"] == "beforeafter"


# ---------------------------------------------------------------------------
# date edge cases
# ---------------------------------------------------------------------------

def test_date_ms_strip():
    assert parse_datetime("2017-02-27T18:02:16.787Z").isoformat() == "2017-02-27T18:02:16+00:00"


def test_date_rfc2822():
    assert parse_datetime("Mon, 27 Feb 2017 18:02:16 GMT").isoformat() == "2017-02-27T18:02:16+00:00"


def test_date_unparseable_is_none():
    assert parse_datetime("not a date at all") is None
    assert parse_datetime(None) is None


def test_wapo_tz_fixup():
    html = wrap(
        "<p itemprop='articleBody'>b</p>"
        "<meta itemprop='datePublished' content='2017-03-27T12:01-500'>",
    )
    item = extract_article(html, "https://www.washingtonpost.com/x").item
    assert item["firstpubtime"] == "2017-03-27T12:01:00-05:00"


# ---------------------------------------------------------------------------
# byline fluff / packing
# ---------------------------------------------------------------------------

def test_byline_fluff_removal():
    assert pack_bylines(["By Jane Doe and John Smith"]) == "Jane Doe,John Smith"
    assert pack_bylines(["http://twitter.com/x", "Written by A B"]) == "A B"


def test_bbc_headline_dross():
    html = wrap(
        "<p itemprop='articleBody'>b</p>",
        head="<title>Politics story - BBC News</title>",
    )
    item = extract_article(html, "https://www.bbc.co.uk/news/uk-1").item
    assert item["headline"] == "Politics story"
    assert item["source"] == "BBC News"


def test_dailymail_byline_title_drop():
    html = wrap(
        "<p itemprop='articleBody'>b</p>",
        head='<meta property="article:author" '
             'content="John Smith, Chief Reporter for MailOnline and A B">',
    )
    item = extract_article(html, "https://www.dailymail.co.uk/news/article-1.html").item
    assert item["bylines"] == ["John Smith", "A B"]


# ---------------------------------------------------------------------------
# loader precedence / compose semantics
# ---------------------------------------------------------------------------

def test_take_first_skips_empty():
    assert take_first(["", None, "x", "y"]) == "x"


def test_bodytext_multi_try():
    l = NewsItemLoader()
    l.add_value("bodytext", [])          # try 1: empty join → ''
    l.add_value("bodytext", ["a", "b"])  # try 2
    l.add_value("bodytext", ["c"])       # try 3
    assert l.get_output_value("bodytext") == "a b"


def test_compose_bodytext_escapes_and_entities():
    assert compose_bodytext(["a\nb", "c&amp;d"]) == "a b c&d"


def test_unpack_csv():
    assert unpack_csv("a, b,c") == ["a", " b", "c"]


def test_comments_fields_flow_identity_multivalued():
    """rawcomments/comments are Identity-out multi-valued fields
    (loaders.py:130-131): every added value survives in order, no
    TakeFirst — and the article schema carries them end to end."""
    from risjbot_spark.extract.loader import NewsItemLoader
    from risjbot_spark.schema import ARTICLE_STRUCT

    l = NewsItemLoader()
    l.add_value("rawcomments", '{"comments": []}')
    l.add_value("rawcomments", '{"comments": ["a"]}')
    l.add_value("comments", ["first comment", "second comment"])
    item = l.load_item()
    assert item["rawcomments"] == ['{"comments": []}', '{"comments": ["a"]}']
    assert item["comments"] == ["first comment", "second comment"]
    names = [f.name for f in ARTICLE_STRUCT.fields]
    assert "rawcomments" in names and "comments" in names


def test_jsonld_array_articlebody_joined():
    """Array-valued JSON-LD articleBody joins with ' ' (the reference's
    bodytext_in Join) instead of being dropped for the fallback."""
    import json as _json

    ld = _json.dumps({"@context": "https://schema.org",
                      "@type": "NewsArticle",
                      "articleBody": ["Para one.", "Para two."]})
    html = (f'<html><head><script type="application/ld+json">{ld}</script>'
            '</head><body><p>fallback</p></body></html>').encode()
    item = extract_article(html, "https://example.org/a").item
    assert item["bodytext"] == "Para one. Para two."


def test_offsite_filter_ignores_port_and_userinfo():
    html = (b'<html><body>'
            b'<a href="http://www.independent.co.uk:8080/x">p</a>'
            b'<a href="http://user@independent.co.uk/y">u</a>'
            b'<a href="http://offsite.invalid/z">o</a>'
            b'<p itemprop="articleBody">t</p></body></html>')
    out = extract_article(html, "https://www.independent.co.uk/a")
    links = out.item.get("links") or out.links
    assert "http://www.independent.co.uk:8080/x" in links
    assert "http://user@independent.co.uk/y" in links
    assert all("offsite.invalid" not in l for l in links)


def test_jsonld_array_wrapped_block_flattened():
    """Top-level array-wrapped JSON-LD blocks flatten into individual
    blocks before the NewsArticle merge (JsonLdExtractor behavior)."""
    import json as _json

    ld = _json.dumps([{"@context": "https://schema.org",
                       "@type": "NewsArticle", "headline": "Wrapped"}])
    html = (f'<html><head><script type="application/ld+json">{ld}</script>'
            '</head><body><p itemprop="articleBody">b</p></body></html>').encode()
    assert extract_article(html, "https://example.org/a").item["headline"] == "Wrapped"


def test_wordcount_matches_python_split(spark):
    """A2 parity: len(str.split()) including Unicode whitespace (&nbsp;)
    and boundary-empty drops."""
    from pyspark.sql import functions as F

    from risjbot_spark.udfs import wordcount_expr

    samples = ["word1\xa0word2", "a b\n", "", "  x  ", "one", " \t "]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    got = [r.wc for r in df.select(wordcount_expr(F.col("t")).alias("wc")).collect()]
    assert got == [len(s.split()) for s in samples]


def test_parse_datetime_localized_months_and_relative():
    """X1 widening: German/French textual dates and relative phrases
    (dateparser's fuzzy territory, loaders.py:54-68) parse
    deterministically; relative phrases anchor to an explicit base and
    return None without one."""
    from datetime import datetime, timedelta, timezone

    from risjbot_spark.extract.dates import parse_datetime

    utc = timezone.utc
    base = datetime(2017, 4, 1, 12, 0, tzinfo=utc)
    fixed = {
        "27. Februar 2017": datetime(2017, 2, 27, tzinfo=utc),
        "27. Februar 2017 18:02": datetime(2017, 2, 27, 18, 2, tzinfo=utc),
        "1. Dez. 2017": datetime(2017, 12, 1, tzinfo=utc),
        "15. März 2018": datetime(2018, 3, 15, tzinfo=utc),
        "12 février 2017": datetime(2017, 2, 12, tzinfo=utc),
        "12 février 2017 à 18h02": datetime(2017, 2, 12, 18, 2, tzinfo=utc),
        "15 août 2018": datetime(2018, 8, 15, tzinfo=utc),
        "3 juillet 2017": datetime(2017, 7, 3, tzinfo=utc),
    }
    for s, want in fixed.items():
        assert parse_datetime(s) == want, s
        assert parse_datetime(s, relative_base=base) == want, s
    rel = {
        "2 hours ago": base - timedelta(hours=2),
        "an hour ago": base - timedelta(hours=1),
        "45 minutes ago": base - timedelta(minutes=45),
        "3 days ago": base - timedelta(days=3),
        "vor 3 Stunden": base - timedelta(hours=3),
        "vor einer Stunde": base - timedelta(hours=1),
        "vor 10 Minuten": base - timedelta(minutes=10),
        "il y a 5 minutes": base - timedelta(minutes=5),
        "il y a une heure": base - timedelta(hours=1),
        "il y a 2 jours": base - timedelta(days=2),
    }
    for s, want in rel.items():
        assert parse_datetime(s, relative_base=base) == want, s
        # without a base, relative phrases must NOT parse (determinism)
        assert parse_datetime(s) is None, s
    # the marker is required: a bare count is not a relative date
    assert parse_datetime("3 days", relative_base=base) is None
    # named days keep the base's time-of-day (dateparser RELATIVE_BASE)
    named = {
        "today": base, "Today": base, "heute": base, "aujourd'hui": base,
        "yesterday": base - timedelta(days=1),
        "gestern": base - timedelta(days=1),
        "hier": base - timedelta(days=1),
        "vorgestern": base - timedelta(days=2),
        "avant-hier": base - timedelta(days=2),
    }
    for s, want in named.items():
        assert parse_datetime(s, relative_base=base) == want, s
        assert parse_datetime(s) is None, s
    # month/year units are CALENDAR shifts with day clamping
    # (relativedelta semantics), not fixed-second offsets
    months = {
        "2 months ago": datetime(2017, 2, 1, 12, 0, tzinfo=utc),
        "vor 2 Monaten": datetime(2017, 2, 1, 12, 0, tzinfo=utc),
        "il y a 2 mois": datetime(2017, 2, 1, 12, 0, tzinfo=utc),
        "a year ago": datetime(2016, 4, 1, 12, 0, tzinfo=utc),
        "2 years ago": datetime(2015, 4, 1, 12, 0, tzinfo=utc),
        "vor einem Jahr": datetime(2016, 4, 1, 12, 0, tzinfo=utc),
        "il y a un an": datetime(2016, 4, 1, 12, 0, tzinfo=utc),
        "il y a 3 ans": datetime(2014, 4, 1, 12, 0, tzinfo=utc),
    }
    for s, want in months.items():
        assert parse_datetime(s, relative_base=base) == want, s
        assert parse_datetime(s) is None, s
    # clamping: 1 month before May 31 is April 30; 1 year before a leap
    # Feb 29 is Feb 28
    may31 = datetime(2017, 5, 31, 9, 30, tzinfo=utc)
    assert parse_datetime("a month ago", relative_base=may31) == \
        datetime(2017, 4, 30, 9, 30, tzinfo=utc)
    feb29 = datetime(2016, 2, 29, 8, 0, tzinfo=utc)
    assert parse_datetime("1 year ago", relative_base=feb29) == \
        datetime(2015, 2, 28, 8, 0, tzinfo=utc)
    # english paths unchanged
    assert parse_datetime("2017-02-27T18:02:16.787Z") == \
        datetime(2017, 2, 27, 18, 2, 16, tzinfo=utc)
    assert parse_datetime("Feb 27, 2017, 06:02 PM") == \
        datetime(2017, 2, 27, 18, 2, tzinfo=utc)


def test_loader_relative_dates_anchor_to_fetchtime():
    """The extraction loader parses relative mod/pub times against the
    page's fetch time (the reference's dateparser 'now' at crawl time)."""
    from datetime import datetime, timezone

    from risjbot_spark.extract.loader import NewsItemLoader

    base = datetime(2017, 4, 1, 12, 0, tzinfo=timezone.utc)
    l = NewsItemLoader(relative_base=base)
    l.add_value("modtime", "2 hours ago")
    item = l.load_item()
    assert item["modtime"] == "2017-04-01T10:00:00+00:00"
    l2 = NewsItemLoader()        # no anchor → relative dropped
    l2.add_value("modtime", "2 hours ago")
    assert "modtime" not in l2.load_item()


def test_nlp_adapter_seam_dispatch():
    """The real-library seam (VERDICT r1 #6): public NLP/readability
    functions dispatch to textblob/nltk/pronouncing/readability-lxml
    when importable, stand-ins otherwise. In this container the
    libraries are absent, so the flags must be honest and the public
    functions must equal their stand-ins."""
    from risjbot_spark.extract import nlp, readability

    text = "John Smith spoke. The war was bad but the response was good."
    if not nlp.HAS_TEXTBLOB:
        assert nlp.sentiment(text) == nlp.sentiment_standin(text)
    if not nlp.HAS_NLTK_TOKENIZE:
        assert nlp.word_tokenize(text) == nlp.word_tokenize_standin(text)
        assert nlp.sent_tokenize(text) == nlp.sent_tokenize_standin(text)
    if not nlp.HAS_NLTK_NER:
        assert nlp.named_people(text) == nlp.named_people_standin(text)
    if not nlp.HAS_CMU_DICT:
        assert nlp.count_syllables("hello") == \
            nlp.count_syllables_standin("hello")
    if not readability.HAS_READABILITY_LXML:
        assert readability.short_title_from_html("<html></html>") is None
        assert readability.body_texts_from_html("<html></html>") == []


def test_nlp_real_libraries_when_available():
    """Runs only where the real libraries exist (deployment containers):
    the seam must return their values, matching the reference pipelines."""
    import pytest as _pytest

    from risjbot_spark.extract import nlp

    if not (nlp.HAS_TEXTBLOB and nlp.HAS_NLTK_NER and nlp.HAS_CMU_DICT):
        _pytest.skip("real NLP libraries not installed in this container")
    text = "John Smith praised the excellent response."
    pol, subj = nlp.sentiment(text)
    assert -1.0 <= pol <= 1.0 and 0.0 <= subj <= 1.0
    assert "John Smith" in nlp.named_people(text)
    assert nlp.count_syllables("hello") == 2


def test_slash_dates_parse_mdy_first():
    """dateparser's default DATE_ORDER is MDY: '03/04/2017' is March 4;
    day>12 forms fall back to DMY (the only parseable order)."""
    from datetime import datetime, timezone

    assert parse_datetime("03/04/2017") == \
        datetime(2017, 3, 4, tzinfo=timezone.utc)
    assert parse_datetime("02/27/2017") == \
        datetime(2017, 2, 27, tzinfo=timezone.utc)
    assert parse_datetime("27/02/2017") == \
        datetime(2017, 2, 27, tzinfo=timezone.utc)


def test_non_string_jsonld_section_coerced_at_udf_boundary():
    """REGRESSION: a numeric JSON-LD articleSection reached the
    StringType column untouched and failed the whole Arrow batch."""
    import json as _json

    from risjbot_spark.udfs import _extract_one

    ld = {"@context": "https://schema.org", "@type": "NewsArticle",
          "headline": "H", "articleSection": 2017}
    html = ('<html><head><script type="application/ld+json">'
            + _json.dumps(ld) + "</script></head>"
            "<body><article><div itemprop=\"articleBody\"><p>Body text"
            "</p></div></article></body></html>")
    row = _extract_one(html.encode(), "https://x.example.com/a",
                       "Sat, 01 Apr 2017 12:00:00 GMT", None)
    assert row["section"] == "2017"
    assert row["status"] == "ok"


def test_profile_for_ignores_port():
    """REGRESSION: an explicit port in the URL demoted site profiles to
    GENERIC (netloc vs hostname)."""
    from risjbot_spark.extract.sites import profile_for

    assert profile_for("https://www.bbc.co.uk:443/news/x").name == \
        profile_for("https://www.bbc.co.uk/news/x").name != "generic"


def test_replace_entities_w3lib_semantics():
    """REGRESSION: html.unescape diverged from w3lib
    replace_entities(remove_illegal=True) — the reference loader's
    entity pass (loaders.py:86/101). Unresolvable '&Name;' is REMOVED,
    HTML5-only names are NOT entities, 0x80-0x9f remaps via cp1252."""
    from risjbot_spark.extract.cleaners import replace_entities

    assert replace_entities("Fish &amp; Chips") == "Fish & Chips"
    assert replace_entities("Fish &Chips; shop") == "Fish  shop"
    assert replace_entities("&lpar;x&rpar;") == "x"     # HTML5-only: removed
    assert replace_entities("&#146;s") == "’s"     # cp1252 remap
    assert replace_entities("&amp no-semi") == "& no-semi"
    assert replace_entities("&bogus no-semi") == "&bogus no-semi"


def test_jsonld_strict_false_and_comment_strip():
    """REGRESSION: extruct parses JSON-LD with strict=False (literal
    newlines inside strings) and retries with a leading comment line
    stripped; strict json.loads dropped those blocks entirely."""
    import json as _json

    from risjbot_spark.extract import extract_article

    body_with_newline = '{"@context": "https://schema.org", "@type": "NewsArticle", "headline": "H1", "articleBody": "line one\nline two"}'
    html = ('<html><head><script type="application/ld+json">'
            + body_with_newline + "</script></head>"
            '<body><article><div itemprop="articleBody"><p>fallback</p>'
            "</div></article></body></html>")
    res = extract_article(html.encode(), "https://x.example.com/a",
                          run_nlp=False)
    assert res.jsonld_failed == 0
    assert res.item["headline"] == "H1"
    # literal newline arrives, then the loader's escape-char pass spaces it
    assert res.item["bodytext"] == "line one line two"

    commented = ("<!-- json below -->\n"
                 + _json.dumps({"@context": "https://schema.org",
                                "@type": "NewsArticle", "headline": "H2"}))
    html2 = ('<html><head><script type="application/ld+json">'
             + commented + "</script></head><body><p>x</p></body></html>")
    res2 = extract_article(html2.encode(), "https://x.example.com/b",
                           run_nlp=False)
    assert res2.jsonld_failed == 0
    assert res2.item["headline"] == "H2"

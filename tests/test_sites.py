"""Per-site profile tests for the extended registry (SURVEY.md §2.8 X8/F8).
Each asserts the site-specific behavior the reference spider implements."""

from risjbot_spark.extract import extract_article, profile_for


def wrap(body: str, head: str = "") -> bytes:
    return f'<html lang="en"><head>{head}</head><body>{body}</body></html>'.encode()


BODY = "<p itemprop='articleBody'>base body text</p>"


def test_profile_resolution_suffix_match():
    assert profile_for("https://www.telegraph.co.uk/x").name == "telegraph"
    assert profile_for("https://uk.reuters.com/article/x").name == "reuters"
    assert profile_for("https://unknown.example.org/x").name == "generic"


def test_telegraph_paywall_note_and_section():
    html = wrap(
        f'<a class="header-breadcrumbs__link"> News </a>{BODY}'
        '<div class="premium-paywall">subscribe!</div>'
    )
    item = extract_article(html, "https://www.telegraph.co.uk/news/1").item
    assert item["section"] == "News"
    assert item["notes"] == ["Premium paywall"]
    # no paywall div → no note
    html2 = wrap(f'<a class="header-breadcrumbs__link">News</a>{BODY}')
    assert "notes" not in extract_article(html2, "https://www.telegraph.co.uk/news/1").item


def test_mirror_prunes_read_more():
    html = wrap(
        '<div class="article-body"><p>story text</p>'
        '<aside class="read-more-links">JUNK</aside></div>'
    )
    item = extract_article(html, "https://www.mirror.co.uk/news/1").item
    assert "story text" in item["bodytext"]
    assert "JUNK" not in item["bodytext"]


def test_sun_title_cased_bylines():
    html = wrap(
        f'<span class="article__author-name">john smith</span>{BODY}',
    )
    item = extract_article(html, "https://www.thesun.co.uk/news/1").item
    assert item["bylines"] == ["John Smith"]


def test_metro_byline_dross():
    html = wrap(
        '<div class="article-body"><p>text</p></div>'
        '<span class="byline"><a rel="author">Jo Bloggs For Metro.co.uk</a></span>'
    )
    item = extract_article(html, "https://metro.co.uk/2017/1").item
    assert item["bylines"] == ["Jo Bloggs"]
    assert item["bodytext"] == "text"


def test_reuters_skips_opengraph():
    html = wrap(
        BODY,
        head='<meta property="og:title" content="OG IGNORED">'
             '<title>Reuters Title | Reuters</title>',
    )
    item = extract_article(html, "https://uk.reuters.com/article/1").item
    assert item["source"] == "Reuters [UK]"
    assert item.get("headline") != "OG IGNORED"  # OG battery disabled
    assert item["notes"] == ["fetchtime delayed by slow feed"]


def test_reuters_body_excludes_author_span():
    html = wrap(
        '<span id="article-text"><p>real text</p>'
        '<p class="author">By Someone</p></span>'
    )
    item = extract_article(html, "https://uk.reuters.com/article/1").item
    assert item["bodytext"] == "real text"


def test_usatoday_section_split_title():
    html = wrap(
        BODY,
        head='<meta itemprop="articleSection" content="news,world">'
             '<meta name="cXenseParse:author" content="A Reporter">',
    )
    item = extract_article(html, "https://www.usatoday.com/story/1").item
    assert item["section"] == "News"
    assert item["bylines"] == ["A Reporter"]


def test_abc_timestamp_strip():
    html = wrap(
        f'{BODY}<div class="article-meta">'
        '<span class="timestamp">Politics — Mar 1, 2017, 2:04 PM</span></div>'
    )
    item = extract_article(html, "https://abcnews.go.com/Politics/story1").item
    assert item["firstpubtime"] == "2017-03-01T14:04:00+00:00"


def test_yahoo_skips_schemaorg():
    html = wrap(
        '<div class="canvas-body"><p>yahoo body</p></div>'
        '<h1 itemprop="headline">MICRODATA IGNORED</h1>',
        head='<meta property="og:title" content="OG Head">',
    )
    item = extract_article(html, "https://www.yahoo.com/news/1").item
    assert item["source"] == "Yahoo! News [US]"
    assert item["headline"] == "OG Head"      # OG still on, schema.org off
    assert item["bodytext"] == "yahoo body"


def test_cbs_nbc_body_xpaths():
    cbs = wrap('<div class="post"><p>cbs text</p></div>')
    assert extract_article(cbs, "https://www.cbsnews.com/news/1").item["bodytext"] == "cbs text"
    nbc = wrap('<div class="article-body"><p>nbc text</p></div>')
    assert extract_article(nbc, "https://www.nbcnews.com/news/1").item["bodytext"] == "nbc text"


def test_independent_allowed_domains():
    p = profile_for("https://www.independent.co.uk/news/1")
    assert p.allowed_domains == ("independent.co.uk",)


def test_bild_prune_and_breadcrumb():
    html = wrap(
        '<div id="breadcrumb"><a rel="home">Politik</a></div>'
        '<div class="article-body"><p>Deutscher Text hier.</p></div>'
        '<noscript class="warning">JS WARNUNG</noscript>'
        '<aside class="related-topics">MEHR</aside>'
    )
    item = extract_article(html, "https://www.bild.de/politik/a-1.bild.html").item
    assert item["section"] == "Politik"
    assert item["bodytext"] == "Deutscher Text hier."


def test_businessinsider_unix_ts_and_body():
    html = wrap(
        '<div class="post-content"><p>bi body</p></div>'
        '<a rel="author">BI Author</a>'
        '<span data-bi-format="date" rel="1488218536"></span>'
    )
    item = extract_article(html, "https://www.businessinsider.com/x?IR=C").item
    assert item["bodytext"] == "bi body"
    assert item["bylines"] == ["BI Author"]
    assert item["modtime"] == "2017-02-27T18:02:16+00:00"


def test_buzzfeed_body_excludes_promo():
    html = wrap(
        '<div data-print="body"><div class="text"><p>buzz text</p></div>'
        '<div class="inline-promo">PROMO</div></div>',
        head='<link rel="canonical" href="https://www.buzzfeed.com/canon/x">',
    )
    item = extract_article(html, "https://www.buzzfeed.com/a/x").item
    assert item["url"] == "https://www.buzzfeed.com/canon/x"
    assert "buzz text" in item["bodytext"]
    assert "PROMO" not in item["bodytext"]


def test_liverpoolecho_articleid():
    html = wrap(
        "<p itemprop='articleBody'>echo body</p>"
        '<meta property="article:id" content="19660932">'
    )
    item = extract_article(html, "https://www.liverpoolecho.co.uk/news/1").item
    assert item["articleid"] == "19660932"


def test_prnewswire_meta_bylines_and_date():
    # /root/reference/RISJbot/spiders/us/prnewswire.py:15-50
    html = wrap(
        BODY,
        head='<meta name="description" content="Release summary.">'
             '<meta name="author" content="PRN Editorial">'
             '<meta name="date" content="2017-03-20T10:00:00+00:00">',
    )
    item = extract_article(
        html, "https://www.prnewswire.com/news-releases/x-1.html").item
    assert item["source"] == "PR Newswire"
    assert item["summary"] == "Release summary."
    assert item["bylines"] == ["PRN Editorial"]
    assert item["firstpubtime"].startswith("2017-03-20T10:00:00")


def test_prnewswireuk_bodytext_headline_keywords():
    # /root/reference/RISJbot/spiders/uk/prnewswireuk.py:9-55
    html = wrap(
        '<h1>UK Release</h1>'
        '<div class="news-col"><p>uk release text</p></div>',
        head='<meta name="keywords" content="vr, investment">',
    )
    item = extract_article(
        html, "https://www.prnewswire.co.uk/news-releases/y-2.html").item
    assert item["source"] == "PR Newswire [UK]"
    assert item["headline"] == "UK Release"
    assert item["bodytext"] == "uk release text"
    # reference parity: keywords_in strips whole added strings then
    # Join(',')s; keywords_out splits on bare ',' — so the space after
    # the comma inside a single meta value survives (loaders.py:118-125)
    assert item["keywords"] == ["vr", " investment"]


def test_foxnews_unlabelled_bylines():
    # /root/reference/RISJbot/spiders/us/foxnews.py:35 — bylines live in
    # an unlabelled <p> containing "By" inside .article-info
    html = wrap(
        '<div class="article-text"><p>fox body</p></div>'
        '<div class="article-info"><p>By <span>Jane Reporter</span></p></div>'
    )
    item = extract_article(html, "https://www.foxnews.com/us/story.html").item
    assert item["bylines"] == ["Jane Reporter"]
    assert item["bodytext"] == "fox body"


def test_bbc_newsbeat_conditional_section_and_sport_byline():
    # /root/reference/RISJbot/spiders/uk/bbc.py:58-69 — Newsbeat pages
    # get section='Newsbeat' only when the logo div is present; Sport
    # bylines select on layout classes excluding the bold variant.
    newsbeat = wrap(
        '<div class="newsbeatlogo"></div>'
        '<div class="main_article_text"><p>beat text</p></div>'
    )
    item = extract_article(newsbeat, "https://www.bbc.co.uk/newsbeat/1").item
    assert item["section"] == "Newsbeat"
    assert item["bodytext"] == "beat text"
    plain = wrap('<div class="story-body"><p>sport text</p></div>'
                 '<div class="story__byline">'
                 '<p class="gel-long-primer">Sport Writer</p>'
                 '<p class="gel-long-primer gel-long-primer-bold">IGNORED</p>'
                 '</div>')
    item2 = extract_article(plain, "https://www.bbc.co.uk/sport/1").item
    assert "section" not in item2
    assert item2["bylines"] == ["Sport Writer"]


def test_vice_article_body():
    # /root/reference/RISJbot/spiders/base/vicespider.py:44
    html = wrap(
        '<article><div class="article__body bod-x"><p>vice text</p></div>'
        '</article>'
    )
    item = extract_article(html, "https://www.vice.com/en/article/1").item
    assert item["bodytext"] == "vice text"

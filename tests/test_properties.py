"""Property-based robustness tests (hypothesis): the extraction surface
must never raise on arbitrary web bytes — a crawler that crashes on one
malformed page out of 10^10 loses the partition."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from risjbot_spark.extract import extract_article
from risjbot_spark.extract.dates import parse_datetime
from risjbot_spark.extract.loader import NewsItemLoader
from risjbot_spark.extract.nlp import named_people, reading_scores, sentiment, wordcount
from risjbot_spark.frontier.politeness import parse_robots
from risjbot_spark.frontier.xxhash import xxhash64
from risjbot_spark.html import parse_html, xpath
from risjbot_spark.sources.feeds import parse_feed
from risjbot_spark.urlnorm import canonicalize_py

_HTMLISH = st.text(
    alphabet=string.ascii_letters + string.digits + "<>/=\"'& \n\t\x00;#?-.",
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_parse_html_never_raises(data):
    root = parse_html(data)
    list(root.itertext())


@settings(max_examples=150, deadline=None)
@given(_HTMLISH)
def test_extract_article_never_raises(markup):
    res = extract_article(markup.encode(), "https://h.example/x")
    assert res.status in ("ok", "empty", "fake404")


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_parse_datetime_never_raises(s):
    dt = parse_datetime(s)
    if dt is not None:
        assert dt.tzinfo is not None  # always tz-aware (determinism)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_nlp_never_raises(text):
    assert wordcount(text) >= 0
    pol, subj = sentiment(text)
    assert -1.0 <= pol <= 1.0 and 0.0 <= subj <= 1.0
    named_people(text)
    rs = reading_scores(text)
    if rs is not None:
        assert all(isinstance(x, float) for x in rs)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=string.printable, max_size=120))
def test_canonicalize_idempotent(path):
    url = "https://www.example.com/" + path.replace("\n", "").replace("\r", "")
    try:
        once = canonicalize_py(url)
    except ValueError:
        return  # urlsplit rejects some hostile bracket sequences — fine
    assert canonicalize_py(once) == once


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_parse_feed_never_raises(body):
    assert isinstance(parse_feed(body), list)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_parse_robots_never_raises(txt):
    rules = parse_robots(txt)
    assert isinstance(rules.allowed("/any/path"), bool)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=8))
def test_loader_takefirst_invariant(values):
    l = NewsItemLoader()
    for v in values:
        l.add_value("section", v)
    out = l.get_output_value("section")
    non_empty = [v for v in values if v]  # TakeFirst skips None and ''
    assert out == (non_empty[0] if non_empty else None)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=64))
def test_xxhash64_is_signed_64bit(data):
    h = xxhash64(data)
    assert -(1 << 63) <= h < (1 << 63)


@settings(max_examples=150, deadline=None)
@given(_HTMLISH)
def test_remove_nodes_batch_equals_sequential_fuzz(markup):
    """Batched pruning is OBSERVABLY identical to sequential pruning on
    arbitrary html-ish input for the real prune battery (incl. a
    content-reading predicate): same surviving text, same count."""
    from risjbot_spark.html import remove_nodes, remove_nodes_batch

    exprs = ("//figure", "//script", "//style", "//form",
             '//div[contains(@class, "submeta")]',
             '//strong[contains(., "Lesen")]', "//aside")
    r1 = parse_html(markup)
    seq = sum(remove_nodes(r1, e) for e in exprs)
    r2 = parse_html(markup)
    bat = remove_nodes_batch(r2, exprs)
    assert r1.text_content() == r2.text_content()
    assert seq == bat


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_replace_entities_never_raises(text):
    from risjbot_spark.extract.cleaners import replace_entities

    out = replace_entities(text)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_parse_datetime_with_relative_base_never_raises(s):
    from datetime import datetime, timezone

    base = datetime(2017, 4, 1, tzinfo=timezone.utc)
    dt = parse_datetime(s, relative_base=base)
    assert dt is None or dt.tzinfo is not None


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=120),
    unit=st.sampled_from(["months", "month", "Monaten", "mois",
                          "years", "Jahren", "ans", "années"]),
    base=st.datetimes(
        min_value=__import__("datetime").datetime(1990, 1, 1),
        max_value=__import__("datetime").datetime(2030, 12, 31)),
)
def test_relative_month_year_units_calendar_invariants(n, unit, base):
    """Month/year phrases: result is a valid datetime strictly before
    the base, time-of-day preserved, and month arithmetic is exact
    (the month index goes back exactly n*k months, day clamped)."""
    from datetime import timezone

    base = base.replace(tzinfo=timezone.utc)
    marker = ("vor " if unit[0].isupper()
              else "il y a " if unit in ("mois", "ans", "années") else "")
    phrase = (f"{marker}{n} {unit}" if marker
              else f"{n} {unit} ago")
    dt = parse_datetime(phrase, relative_base=base)
    assert dt is not None and dt < base
    assert (dt.hour, dt.minute, dt.second) == \
        (base.hour, base.minute, base.second)
    k = 12 if unit.lower().startswith(("year", "jahr", "an")) else 1
    months_back = n * k
    total = base.year * 12 + (base.month - 1) - months_back
    assert (dt.year, dt.month) == (total // 12, total % 12 + 1)
    assert dt.day <= base.day                  # clamping only shrinks


@settings(max_examples=100, deadline=None)
@given(_HTMLISH)
def test_chase_one_never_raises_and_status_in_enum(markup):
    """The comment chase degrades gracefully on arbitrary page bytes and
    a failing API — never an exception out of the task loop."""
    from risjbot_spark.comments import chase_one

    def api(method, url):
        raise RuntimeError("no network")

    raws, texts, note, status = chase_one(markup, api, "site-uuid")
    assert status in ("ok", "none", "dropped", "failed")

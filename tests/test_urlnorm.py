"""URL canonicalization parity: the JVM expression chain and the pure-
Python twin must agree byte-for-byte (the seen-key invariant)."""

import pytest
from pyspark.sql import functions as F

from risjbot_spark.urlnorm import canonicalize_expr, canonicalize_py, with_canonical

CASES = [
    "https://www.theguardian.com/politics/2017/03/story#frag",
    "https://www.dailymail.co.uk/news/article-1.html?ITO=149",
    "http://www.cnn.com/2017/03/politics/x/index.html",
    "https://edition.cnn.com/2017/03/politics/x/index.html",
    "https://www.businessinsider.com/story-2017",
    "https://www.businessinsider.com/story-2017?foo=1",
    "https://www.businessinsider.com/story-2017?IR=C&x=2",
    "https://www.businessinsider.de/geschichte",
    "https://example.com/plain",
]


def test_py_twin_matches_spark(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_expr(F.col("url")).alias("c")).collect()}
    for u in CASES:
        assert got[u] == canonicalize_py(u), u


def test_specific_rewrites():
    assert canonicalize_py("http://www.cnn.com/a/b") == "http://edition.cnn.com/a/b"
    assert canonicalize_py("https://www.dailymail.co.uk/a?junk=1") == \
        "https://www.dailymail.co.uk/a"
    assert canonicalize_py("https://www.businessinsider.com/x") == \
        "https://www.businessinsider.com/x?IR=C"
    assert canonicalize_py("https://www.businessinsider.com/x?IR=C") == \
        "https://www.businessinsider.com/x?IR=C"
    assert canonicalize_py("https://h/a#frag") == "https://h/a"


def test_idempotent():
    for u in CASES:
        once = canonicalize_py(u)
        assert canonicalize_py(once) == once

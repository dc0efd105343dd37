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


def test_py_twin_matches_spark_fuzz(spark):
    """Seeded fuzz over the rewrite-relevant host set × random URL-safe
    paths/queries/fragments: the JVM expression chain and the Python twin
    must agree byte-for-byte on every generated URL (the seen-key
    invariant does not tolerate a single divergence)."""
    import random

    rnd = random.Random(42)
    hosts = [
        "www.cnn.com", "edition.cnn.com", "www.dailymail.co.uk",
        "dailymail.co.uk", "www.businessinsider.com", "businessinsider.de",
        "www.businessinsider.fr", "example.org", "sub.a.example.com",
        "www.theguardian.com",
    ]
    chars = "abcdefXYZ0123456789-_.~"
    urls = []
    for _ in range(400):
        h = rnd.choice(hosts)
        segs = ["".join(rnd.choice(chars) for _ in range(rnd.randint(1, 10)))
                for _ in range(rnd.randint(0, 4))]
        q = ("" if rnd.random() < 0.4 else
             "?" + "&".join(f"k{j}={rnd.randint(0, 99)}"
                            for j in range(rnd.randint(1, 3))))
        frag = "" if rnd.random() < 0.5 else "#s" + rnd.choice(chars)
        scheme = "https" if rnd.random() < 0.7 else "http"
        urls.append(f"{scheme}://{h}/{'/'.join(segs)}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_expr(F.col("url")).alias("c")).collect()}
    for u in urls:
        assert got[u] == canonicalize_py(u), u


def test_domain_boundary_and_home_url_rewrites():
    # exact-suffix boundary: foreign registrable domains never rewritten
    assert canonicalize_py("https://thedailymail.co.uk/a?id=3") == \
        "https://thedailymail.co.uk/a?id=3"
    assert canonicalize_py("https://notbusinessinsider.com/x") == \
        "https://notbusinessinsider.com/x"
    # bare home URL (no path) still gets the equivalent-domain rewrite
    assert canonicalize_py("http://www.cnn.com") == "http://edition.cnn.com"
    # unescaped-dot false positive: wwwxcnn.com must NOT rewrite
    assert canonicalize_py("https://wwwxcnn.com/a") == "https://wwwxcnn.com/a"


def test_expr_twin_matches_on_boundary_cases(spark):
    cases = [
        "https://thedailymail.co.uk/a?id=3",
        "https://notbusinessinsider.com/x",
        "http://www.cnn.com",
        "https://wwwxcnn.com/a",
        "http://www.cnn.com?x=1",
    ]
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_expr(F.col("url")).alias("c")).collect()}
    for u in cases:
        assert got[u] == canonicalize_py(u), u


def test_domain_rewrite_case_insensitive_twins(spark):
    """REGRESSION: 'WWW.cnn.com' rewrote in the Python twin but not the
    Spark expression — one page, two seen-set keys."""
    from pyspark.sql import functions as F

    from risjbot_spark.urlnorm import canonicalize_expr, canonicalize_py

    urls = ["https://WWW.cnn.com/a", "HTTP://www.cnn.com/b",
            "https://www.CNN.com/c", "ftp://www.cnn.com/d"]
    got = {
        r.u: r.c for r in
        spark.createDataFrame([(u,) for u in urls], "u string")
        .select("u", canonicalize_expr(F.col("u")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == canonicalize_py(u), u
    assert got["https://WWW.cnn.com/a"] == "https://edition.cnn.com/a"
    assert got["ftp://www.cnn.com/d"] == "ftp://www.cnn.com/d"  # http(s) only

"""Cross-engine whitespace parity for every tokenize/normalize surface.

Java regex \\s is [ \\t\\n\\x0B\\f\\r] while DuckDB's RE2 \\s is
[ \\t\\n\\f\\r] (no VT), and Java's split() drops trailing empty tokens
while DuckDB's string_split_regex keeps them — so any surface written as
a bare \\s+ split agrees across engines only while the corpus is
ASCII-clean with no boundary whitespace. All doc-op surfaces now share
udfs.PY_WS_RE (Python's full White_Space set) plus an explicit
empty-token filter on both engines; this battery feeds texts with every
divergent character through the REAL queries()/ORACLE_SQL pairs and
asserts identical results, so the gate no longer depends on corpus
cleanliness.
"""

import duckdb
import pandas as pd
import pytest

from risjbot_spark import queries as Q

# every class member the generated corpus never exercises, in positions
# that trigger the known engine divergences: VT (Java-\s-only), trailing
# newline (Java drops the empty, DuckDB keeps it), leading NBSP, Zs/Zl/Zp
# separators, FS-US, NEL, whitespace-only and empty strings
BATTERY = [
    "plain words here",
    "a\x0bb c",            # VT mid-token: Java \s splits, RE2 \s doesn't
    "trailing newline\n",  # boundary empty: split() vs string_split_regex
    "\xa0leading nbsp",
    "multi line seps",
    "\x1cx\x1dy\x1ez\x1fw",
    "nel\x85joined",
    "ogham space math narrow nbsp",
    "ideographic　space",
    "   ",                 # whitespace-only
    "",                    # empty
    "tab\tand  runs \r\n of\fspace",
]


@pytest.fixture(scope="module")
def ws_sf(spark, tmp_path_factory):
    """A scratch sf dir whose documents table is the exotic battery."""
    sf = tmp_path_factory.mktemp("ws_sf")
    pdf = pd.DataFrame({
        "doc_id": range(len(BATTERY)),
        "text": BATTERY,
        "lang": ["en"] * len(BATTERY),
        "source": ["battery"] * len(BATTERY),
        "n_chars": [len(t) for t in BATTERY],
    })
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(sf / "documents.parquet"))
    return str(sf)


def _oracle(name: str, sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')")
    return con.execute(Q.ORACLE_SQL[name]).df()


@pytest.mark.parametrize("name", ["token_count", "quality_score",
                                  "doc_fingerprint", "wordcount"])
def test_doc_op_parity_on_exotic_whitespace(spark, ws_sf, name):
    got = Q.QUERIES[name](spark, ws_sf).toPandas()
    want = _oracle(name, ws_sf)
    assert list(got.columns) == list(want.columns)
    got = got.sort_values(got.columns[0]).reset_index(drop=True)
    want = want.sort_values(want.columns[0]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False)


def test_token_count_matches_python_split(spark, ws_sf):
    """The Spark-side token count equals len(str.split()) — the unified
    class really is Python semantics, not just engine-consistent."""
    got = {r["doc_id"]: r["n_ws_tokens"]
           for r in Q.QUERIES["token_count"](spark, ws_sf).collect()}
    for i, t in enumerate(BATTERY):
        assert got[i] == len(t.split()), repr(t)


def test_shingle_tokens_drop_boundary_empties(spark, ws_sf):
    """_toks() never emits empty tokens, so shingle windows can't slide
    over phantom boundary positions."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{ws_sf}/documents.parquet")
    toks = d.select(Q._toks().alias("toks"))
    n_empty = toks.select(
        F.size(F.filter("toks", lambda x: x == "")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert n_empty == 0

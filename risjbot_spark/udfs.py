"""Vectorized pandas/Arrow UDFs — the only Python in the dataflow.

Per BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python)". Each UDF receives Arrow batches and loops in C-speed pandas
apply over the *batch*, amortizing serialization; the DOM work itself is
irreducibly per-document (same as the reference's per-response parse).

The UDF bodies delegate to :mod:`risjbot_spark.extract` — the identical
code the pytest oracle runs, so Spark output is byte-identical to the
fixtures by construction (SURVEY.md §7 M0).
"""

from __future__ import annotations

import json
import logging

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .extract import extract_article
from .extract import nlp as _nlp
from .schema import ARTICLE_STRUCT, PY_WS_RE  # noqa: F401 — re-exported

_ARTICLE_FIELDS = [f.name for f in ARTICLE_STRUCT.fields]
# string-typed fields get a str() coercion at the row boundary: the
# loader's passthrough fields (section, articleid, ...) keep whatever
# type the page metadata carried (the reference's item is an untyped
# dict), and ONE numeric JSON-LD articleSection would otherwise fail the
# pandas→Arrow conversion for the WHOLE batch (ArrowTypeError)
_STR_FIELDS = frozenset(
    f.name for f in ARTICLE_STRUCT.fields
    if isinstance(f.dataType, T.StringType))


def _extract_one(html, url, fetchtime, meta_json) -> dict:
    meta = None
    if meta_json:
        try:
            meta = json.loads(meta_json)
        except (json.JSONDecodeError, TypeError):
            meta = None
    res = extract_article(html, url, fetchtime=fetchtime, meta=meta)
    row = dict.fromkeys(_ARTICLE_FIELDS)
    if res.item:
        for k, v in res.item.items():
            if k in row:
                if (k in _STR_FIELDS and v is not None
                        and not isinstance(v, str)):
                    v = str(v)
                row[k] = v
    row["status"] = res.status
    row["jsonld_failed"] = res.jsonld_failed
    row["links"] = res.links
    return row


# --- driver-decided library backends ----------------------------------------
# The HAS_* probes in extract.nlp / extract.readability run per Python
# PROCESS; a heterogeneous deployment would silently mix real-library and
# stand-in values across partitions. Every UDF below is built by a
# FACTORY on the driver: the driver's probe result rides the UDF closure
# (cloudpickle serializes locally-defined functions by value) and is
# pinned in each worker before the batch runs — pinned-available-but-
# missing raises instead of degrading (extract/nlp.py:_use).

def _driver_backend_flags() -> dict:
    from .extract import readability as _rd

    return {**_nlp.backend_flags(), "readability": _rd.HAS_READABILITY_LXML}


def _pin_worker(flags: dict) -> None:
    from .extract import readability as _rd

    # the two modules pin independently: a warm worker may have run a UDF
    # whose flags differ ONLY in 'readability', so each pin gets its own
    # changed-guard (a shared guard would skip the readability re-pin)
    nlp_flags = {k: v for k, v in flags.items() if k != "readability"}
    if _nlp._PINNED != nlp_flags:
        _nlp.pin_backend(nlp_flags)
    if _rd._PINNED != flags.get("readability"):
        _rd.pin_backend(flags.get("readability"))


def make_extract_article_udf(flags: dict | None = None):
    """(html, url, fetchtime, feed-meta JSON) → NewsItem struct.

    One lxml-style parse per row producing the FULL struct — never N UDFs
    × N parses (the reference's parse-once constraint, SURVEY.md §4)."""
    flags = dict(flags) if flags is not None else _driver_backend_flags()
    logging.getLogger(__name__).info("extract UDF NLP backends: %s", flags)

    @pandas_udf(ARTICLE_STRUCT)
    def extract_article_udf(html: pd.Series, url: pd.Series,
                            fetchtime: pd.Series,
                            meta_json: pd.Series) -> pd.DataFrame:
        _pin_worker(flags)
        rows = [
            _extract_one(h, u, ft, mj)
            for h, u, ft, mj in zip(html, url, fetchtime, meta_json)
        ]
        return pd.DataFrame(rows, columns=_ARTICLE_FIELDS)

    # The UDF is pure, but we declare it nondeterministic so Catalyst
    # never duplicates it: a filter on a struct field (status !=
    # 'fake404') pushed below a repartition Exchange re-evaluates the
    # WHOLE extraction on both sides of the exchange — measured 2× the
    # round cost at 24k pages.
    return extract_article_udf.asNondeterministic()


extract_article_udf = make_extract_article_udf()


# --- NLP UDFs usable standalone over any text column ------------------------

def make_sentiment_udf(flags: dict | None = None):
    flags = dict(flags) if flags is not None else _driver_backend_flags()

    @pandas_udf(T.StructType([
        T.StructField("sentiment", T.DoubleType()),
        T.StructField("subjectivity", T.DoubleType()),
    ]))
    def sentiment_udf(text: pd.Series) -> pd.DataFrame:
        _pin_worker(flags)
        vals = [_nlp.sentiment(t) if isinstance(t, str) else (None, None)
                for t in text]
        return pd.DataFrame(vals, columns=["sentiment", "subjectivity"])

    return sentiment_udf


def make_reading_scores_udf(flags: dict | None = None):
    flags = dict(flags) if flags is not None else _driver_backend_flags()

    @pandas_udf(T.StructType([
        T.StructField("fleschreadingease", T.DoubleType()),
        T.StructField("kincaidgradelevel", T.DoubleType()),
    ]))
    def reading_scores_udf(text: pd.Series) -> pd.DataFrame:
        _pin_worker(flags)
        rows = []
        for t in text:
            s = _nlp.reading_scores(t) if isinstance(t, str) else None
            rows.append(s if s is not None else (None, None))
        return pd.DataFrame(
            rows, columns=["fleschreadingease", "kincaidgradelevel"])

    return reading_scores_udf


def make_named_people_udf(flags: dict | None = None):
    flags = dict(flags) if flags is not None else _driver_backend_flags()

    @pandas_udf(T.ArrayType(T.StringType()))
    def named_people_udf(text: pd.Series) -> pd.Series:
        _pin_worker(flags)
        return pd.Series(
            [_nlp.named_people(t) if isinstance(t, str) else [] for t in text]
        )

    return named_people_udf


sentiment_udf = make_sentiment_udf()
reading_scores_udf = make_reading_scores_udf()
named_people_udf = make_named_people_udf()


def wordcount_expr(col):
    """A2 word count, JVM-side: len(str.split()) semantics
    (/root/reference/RISJbot/pipelines/wordcount.py:15). Python's split()
    splits on PYTHON's whitespace set and drops empty tokens at both
    ends — Java's plain \\s is ASCII-only (missed the \\xa0 that &nbsp;
    decodes to) and even (?U)\\s (= Unicode White_Space) misses
    U+001C-001F, which Python treats as whitespace via their bidi
    class. The class spells Python's exact set: ASCII \\s + VT/FF +
    FS/GS/RS/US + NEL + \\p{Z} (all separators incl. NBSP, U+2028/29,
    U+3000); F.trim strips only spaces, so the empty-token filter —
    not trim — drops the boundary empties. Parity with str.split() and
    the DuckDB oracle class is locked char-by-char in
    tests/test_dedup_queries.py."""
    toks = F.filter(F.split(col, PY_WS_RE), lambda x: x != "")
    return F.size(toks).cast("int")

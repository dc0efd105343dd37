"""Exact duplicated-span removal (dedup.strip_duplicate_spans) — library
semantics on an arbitrary-schema DataFrame: first occurrence kept,
later occurrences of any >=k-token repeated span dropped, short docs
untouched, case preserved, case-insensitive matching, intra-doc
repetition, overlap coverage union, stats columns, collision guards."""
import pytest
from pyspark.sql import functions as F

from risjbot_spark import dedup

SPAN = "alpha bravo charlie delta echo foxtrot golf hotel"          # 8 toks
SPAN_UP = "Alpha Bravo Charlie Delta Echo Foxtrot Golf Hotel"


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk string, body string, extra int")


def _clean(spark, rows, **kw):
    out = dedup.strip_duplicate_spans(
        _df(spark, rows), "pk", "body", k=8, out_col="clean",
        with_stats=True, **kw)
    return {r["pk"]: r for r in out.collect()}


def test_first_occurrence_kept_later_dropped(spark):
    rows = [("a", f"intro words {SPAN} tail one", 1),
            ("b", f"other start {SPAN} halt two", 2)]
    got = _clean(spark, rows)
    assert got["a"]["clean"] == rows[0][1]          # 'a' < 'b': kept whole
    assert got["a"]["n_dropped_tokens"] == 0
    assert got["b"]["clean"] == "other start halt two"
    assert got["b"]["n_dropped_tokens"] == 8
    assert got["b"]["extra"] == 2                   # caller columns survive


def test_short_docs_pass_through(spark):
    rows = [("a", "tiny doc under k tokens", 1),
            ("b", "tiny doc under k tokens", 2)]    # dup but < 8 tokens
    got = _clean(spark, rows)
    assert got["a"]["clean"] == rows[0][1]
    assert got["b"]["clean"] == rows[1][1]
    assert got["b"]["n_dropped_tokens"] == 0


def test_matching_is_case_insensitive_output_case_preserved(spark):
    rows = [("a", f"x {SPAN} y", 1), ("b", f"z {SPAN_UP} w", 2)]
    got = _clean(spark, rows)
    assert got["a"]["clean"] == f"x {SPAN} y"
    assert got["b"]["clean"] == "z w"               # dropped despite case


def test_intra_doc_repetition_drops_second_occurrence(spark):
    rows = [("a", f"{SPAN} middle filler {SPAN}", 1)]
    got = _clean(spark, rows)
    assert got["a"]["clean"] == f"{SPAN} middle filler"
    assert got["a"]["n_dropped_tokens"] == 8


def test_overlapping_spans_union_coverage(spark):
    # 9 shared tokens -> two overlapping 8-grams in doc b; coverage is
    # the union (9 tokens), not 16
    nine = SPAN + " india"
    rows = [("a", f"lead {nine} tail", 1), ("b", f"pre {nine} post", 2)]
    got = _clean(spark, rows)
    assert got["b"]["clean"] == "pre post"
    assert got["b"]["n_dropped_tokens"] == 9


def test_whole_doc_duplicate_becomes_empty(spark):
    rows = [("a", SPAN, 1), ("b", SPAN, 2)]
    got = _clean(spark, rows)
    assert got["a"]["clean"] == SPAN
    assert got["b"]["clean"] == ""
    assert got["b"]["n_dropped_tokens"] == 8


def test_null_text_stays_null(spark):
    # a transform must not invent content: downstream NULL-dropping
    # gates (quality_filter in pipeline.curate) still see the NULL
    rows = [("a", None, 1), ("b", f"x {SPAN}", 2), ("c", f"y {SPAN}", 3)]
    got = _clean(spark, rows)
    assert got["a"]["clean"] is None
    assert got["a"]["n_tokens"] == 0
    assert got["a"]["n_dropped_tokens"] == 0
    assert got["c"]["clean"] == "y"


def test_inplace_stats_use_original_text(spark):
    # regression: with out_col=None (in-place), stats computed after
    # the replacement would count the STRIPPED text's tokens
    rows = [("a", f"other start {SPAN} halt two", 1),
            ("b", f"intro words {SPAN} tail one", 2)]
    out = dedup.strip_duplicate_spans(
        _df(spark, rows), "pk", "body", k=8, with_stats=True)
    got = {r["pk"]: r for r in out.collect()}
    # 'a' < 'b' lexicographically: a keeps, b loses its 8 shared tokens
    assert got["b"]["n_tokens"] == 12               # original, not 4
    assert got["b"]["n_dropped_tokens"] == 8
    assert got["b"]["body"] == "intro words tail one"


def test_out_col_and_collision_guards(spark):
    df = _df(spark, [("a", "x", 1)])
    with pytest.raises(ValueError):
        dedup.strip_duplicate_spans(df, "pk", "body", out_col="extra")
    bad = df.withColumn("_drop", F.lit(1))
    with pytest.raises(ValueError):
        dedup.strip_duplicate_spans(bad, "pk", "body")


def test_occurrences_view(spark):
    rows = [("a", f"one two {SPAN}", 1), ("b", f"{SPAN} eight nine", 2)]
    occ = dedup.duplicate_span_occurrences(
        _df(spark, rows), "pk", "body", k=8).collect()
    assert [(r["pk"], r["pos"]) for r in occ] == [("b", 0)]


def test_partitioning_invariance(spark):
    rows = [(f"d{i:02d}", f"doc {i} filler {SPAN} more {i}", i)
            for i in range(12)]
    a = _clean(spark, rows)
    out = dedup.strip_duplicate_spans(
        _df(spark, rows).repartition(7), "pk", "body", k=8,
        out_col="clean", with_stats=True)
    b = {r["pk"]: r for r in out.collect()}
    assert {k: v["clean"] for k, v in a.items()} == \
           {k: v["clean"] for k, v in b.items()}
    # exactly one survivor carries the span
    keep = [k for k, v in a.items() if SPAN in v["clean"]]
    assert keep == ["d00"]

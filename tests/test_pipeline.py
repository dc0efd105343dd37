"""End-to-end curation orchestrator (pipeline.curate / holdout_split)."""
import pytest
from pyspark.sql import functions as F

from risjbot_spark import pipeline

BODY = ("the quick brown fox jumps over the lazy dog while the calm "
        "river flows past the old stone bridge near town")


def _corpus(spark):
    rows = [
        # normal docs, each with a distinct vocabulary
        ("d01", "mountain peaks rise sharply above quiet alpine meadows "
                "where marmots whistle under a pale morning sky", "en"),
        ("d02", "the market stalls sell ripe oranges sweet dates and "
                "warm flatbread to travellers passing through the old "
                "square", "en"),
        ("d03", "completely different text about ships and harbors "
                "sailing beyond the far horizon at dawn light", "de"),
        # near-dup pair: d05 = d04 minus first two words
        ("d04", f"unique lead {BODY} gamma three", "en"),
        ("d05", f"lead {BODY} gamma three", "en"),
        # repetitive junk (fails the quality gate)
        ("d06", "spam " * 40, "en"),
        # contaminated: quotes the eval set verbatim
        ("d07", "prefix words here benchmark question about rivers "
                "and bridges answer key suffix trailing", "en"),
        # NULL text (dropped by the quality gate)
        ("d08", None, "de"),
    ]
    return spark.createDataFrame(rows, "pk string, body string, lg string")


def _eval_df(spark):
    return spark.createDataFrame(
        [("benchmark question about rivers and bridges answer key",)],
        "body string")


def test_curate_full_chain(spark):
    res = pipeline.curate(
        _corpus(spark), "pk", "body",
        pii={},
        quality={"max_dup_ngram_frac": 0.2, "max_top_token_frac": 0.3,
                 "min_distinct_ratio": 0.3},
        near_dedup={"ngram": 3, "threshold": 0.5},
        decontam_eval=_eval_df(spark),
        decontam={"ngram": 5, "max_hit_frac": 0.05},
        split={"val_permille": 200, "test_permille": 200},
    )
    rows = {r["pk"]: r for r in res.docs.collect()}
    # d06 (junk) and d08 (null) fail quality; d05 loses to d04; d07
    # is contaminated
    assert sorted(rows) == ["d01", "d02", "d03", "d04"]
    assert set(r["split"] for r in rows.values()) <= {
        "train", "val", "test"}
    rep = res.report(run=False)  # collect() above already materialized
    assert rep["input"] == 8
    assert rep["after_quality"] == 6
    assert rep["after_near_dedup"] == 5
    assert rep["after_decontam"] == 4
    assert rep["output"] == 4
    assert res.stages == ["input", "pii_scrub", "after_quality",
                          "after_near_dedup", "after_decontam",
                          "split", "output"]


def test_curate_transform_stages_apply(spark):
    corpus = spark.createDataFrame(
        [("a", "contact me at bob@example.com for the details "
               "of the meeting", "en")],
        "pk string, body string, lg string")
    res = pipeline.curate(corpus, "pk", "body", pii={})
    out = res.docs.collect()[0]["body"]
    assert "<EMAIL>" in out and "bob@example.com" not in out


def test_curate_mix_stage(spark):
    rows = [(f"e{i:02d}", f"english document number {i} with several "
             f"more words to pass through {i}", "en") for i in range(8)]
    rows += [(f"g{i:02d}", f"german document number {i} with several "
              f"more words to pass through {i}", "de") for i in range(2)]
    corpus = spark.createDataFrame(rows, "pk string, body string, lg string")
    res = pipeline.curate(
        corpus, "pk", "body",
        mix={"group_cols": ["lg"], "weights": {"en": 1, "de": 1}})
    counts = {r["lg"]: r["n"] for r in
              res.docs.groupBy("lg").agg(F.count("*").alias("n"))
              .collect()}
    # 1:1 target from 8:2 -> en downsampled toward de's size
    assert counts.get("de", 0) >= 1
    assert counts["en"] <= 4


def test_curate_validation(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError):
        pipeline.curate(corpus, "pk", "body",
                        decontam={"max_hit_frac": 0.1})


def test_holdout_split_deterministic_and_complete(spark):
    rows = [(f"k{i:04d}",) for i in range(500)]
    df1 = spark.createDataFrame(rows, "pk string").coalesce(1)
    df2 = spark.createDataFrame(rows, "pk string").repartition(9)
    a = {r["pk"]: r["split"] for r in
         pipeline.holdout_split(df1, "pk").collect()}
    b = {r["pk"]: r["split"] for r in
         pipeline.holdout_split(df2, "pk").collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    frac_val = sum(1 for v in a.values() if v == "val") / len(a)
    assert 0.002 <= frac_val <= 0.05          # ~1% target, hash noise


def test_holdout_split_guards(spark):
    df = spark.createDataFrame([("a", 1)], "pk string, split int")
    with pytest.raises(ValueError):
        pipeline.holdout_split(df, "pk")
    df2 = spark.createDataFrame([("a",)], "pk string")
    with pytest.raises(ValueError):
        pipeline.holdout_split(df2, "pk", val_permille=600,
                               test_permille=600)


def test_holdout_split_custom_bucket_groups_stick_together(spark):
    # bucket by site so a whole site lands in one split
    rows = [(f"u{i}", f"site{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "pk string, site string")
    out = pipeline.holdout_split(
        df, "pk",
        bucket=F.pmod(F.xxhash64("site"), F.lit(1000)),
        val_permille=300, test_permille=300)
    per_site = (out.groupBy("site")
                .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r["n"] == 1 for r in per_site)


def test_curate_persist_knob(spark):
    res = pipeline.curate(
        _corpus(spark), "pk", "body",
        quality={"max_dup_ngram_frac": 0.2},
        near_dedup={"ngram": 3, "threshold": 0.5},
        persist=True)
    n = res.docs.count()
    assert n > 0
    assert len(res.persisted) == 1          # the pre-near-dedup pin
    assert res.persisted[0].storageLevel.useMemory
    res.unpersist()
    assert res.persisted == []


def test_leakage_safe_split_keeps_near_dups_together(spark):
    # three clusters of near-dups + singletons; every cluster must land
    # wholly in one split
    from risjbot_spark import dedup

    rows = []
    for c in range(12):
        base = (f"cluster {c} body with plenty of distinct words "
                f"alpha{c} beta{c} gamma{c} delta{c} epsilon{c} "
                f"zeta{c} eta{c} theta{c} iota{c} kappa{c}")
        rows.append((f"c{c:02d}a", base))
        rows.append((f"c{c:02d}b", base + " tail"))
    rows += [(f"solo{i}", f"totally unrelated text number {i} about "
              f"topic{i} subject{i} matter{i} theme{i} idea{i} "
              f"angle{i} facet{i} lens{i} frame{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "pk string, body string")
    pairs = dedup.minhash_dedup(df, "pk", "body", threshold=0.3)
    out = pipeline.leakage_safe_split(
        df, "pk", pairs, val_permille=300, test_permille=300)
    got = {r["pk"]: r["split"] for r in out.collect()}
    assert len(got) == len(rows)
    for c in range(12):
        assert got[f"c{c:02d}a"] == got[f"c{c:02d}b"], c
    assert len(set(got.values())) >= 2          # buckets actually split


def test_leakage_safe_split_singletons_match_holdout_split(spark):
    # documents in NO near-dup cluster must keep the exact assignment a
    # plain holdout_split gives them — a corpus refresh that upgrades to
    # the leakage-safe split must not reshuffle the un-clustered
    # majority (that reshuffle leaks former train docs into eval)
    df = spark.createDataFrame([(i, f"doc {i}") for i in range(200)],
                               "pk long, body string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    plain = {r["pk"]: r["split"]
             for r in pipeline.holdout_split(df, "pk").collect()}
    safe = {r["pk"]: r["split"]
            for r in pipeline.leakage_safe_split(df, "pk", pairs).collect()}
    assert plain == safe


def test_leakage_safe_split_guards(spark):
    df = spark.createDataFrame([("a", "x", 1)],
                               "pk string, body string, _rep int")
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    with pytest.raises(ValueError):
        pipeline.leakage_safe_split(df, "pk", pairs)


def test_curate_classifier_stage(spark):
    # model-based filter inside the orchestrator: weights that reward
    # d01's vocabulary and punish everything else
    from risjbot_spark.textquality import (QualityClassifier,
                                           token_bucket_expr)
    df = _corpus(spark)
    dim = 1024
    # bucket ids of d01's tokens get +1, everything else -1
    toks = "mountain peaks rise sharply above quiet alpine meadows " \
           "where marmots whistle under a pale morning sky".split()
    buckets = {r["b"] for r in
               spark.createDataFrame([(t,) for t in toks], "t string")
               .select(token_bucket_expr(F.col("t"), dim).alias("b"))
               .collect()}
    w = [1.0 if b in buckets else -1.0 for b in range(dim)]
    res = pipeline.curate(df, "pk", "body",
                          classifier={"weights": w, "min_prob": 0.9})
    kept = sorted(r["pk"] for r in res.docs.collect())
    assert kept == ["d01"]                     # NULL text (d08) dropped too
    assert "after_classifier" in res.stages
    rep = res.report(run=False)
    assert rep["after_classifier"] == 1
    # keep_score + trained-model object form
    model = QualityClassifier(weights=w, intercept=0.0)
    res2 = pipeline.curate(df, "pk", "body",
                           classifier={"model": model, "min_prob": 0.9,
                                       "keep_score": True})
    row = res2.docs.collect()[0]
    assert row["pk"] == "d01" and row["q_prob"] >= 0.9


def test_curate_classifier_contract_guards(spark):
    # shared contract (textquality.resolve_classifier_opts): typos and
    # missing weights fail loudly; min_prob=None is annotate-only and
    # requires keep_score
    df = _corpus(spark)
    with pytest.raises(ValueError, match="unknown classifier option"):
        pipeline.curate(df, "pk", "body",
                        classifier={"weights": [0.1] * 8, "minprob": 0.9})
    with pytest.raises(ValueError, match="weights"):
        pipeline.curate(df, "pk", "body", classifier={"min_prob": 0.9})
    with pytest.raises(ValueError, match="annotate-only"):
        pipeline.curate(df, "pk", "body",
                        classifier={"weights": [0.1] * 8,
                                    "min_prob": None})
    res = pipeline.curate(df, "pk", "body",
                          classifier={"weights": [0.1] * 8,
                                      "min_prob": None,
                                      "keep_score": True})
    rows = res.docs.collect()
    # annotate-only: nothing dropped (NULL text included), score present
    assert len(rows) == 8 and "q_prob" in res.docs.columns


def test_curate_dsir_stage(spark):
    # DSIR selection inside the orchestrator: the target's vocabulary
    # pulls its lookalikes out of the raw corpus
    target = spark.createDataFrame(
        [(i, "research method data analysis result study "
             f"sample {i}") for i in range(10)],
        "pk long, body string")
    raw_rows = [(100 + i, f"buy cheap pills casino offer deal now {i}")
                for i in range(10)]
    raw_rows += [(200 + i, "research method data analysis result "
                  f"study sample {i}") for i in range(3)]
    raw = spark.createDataFrame(raw_rows, "pk long, body string")
    res = pipeline.curate(raw, "pk", "body",
                          dsir={"target": target, "dim": 512,
                                "min_score": 0.0})
    kept = {r["pk"] for r in res.docs.collect()}
    assert kept == {200, 201, 202}
    assert "after_dsir" in res.stages
    with pytest.raises(ValueError, match="target"):
        pipeline.curate(raw, "pk", "body", dsir={"min_score": 0.0})


def test_curate_span_dedup_ordering_option(spark):
    """span_dedup runs early by default, after near-dedup with
    span_dedup_after_near_dedup=True — and the ordering is visible in
    both the stage list and the semantics: the shared span between the
    near-dup pair is what makes them near-dups here, so the
    survivor-first order (raw-text dedup) still collapses the pair,
    while in both orders the surviving text is span-stripped."""
    # texts dominated by a shared repeated span: raw-text 3-gram
    # Jaccard ≈ 0.8 (near-dups), but once the duplicated span is
    # stripped the residues ("ending" vs "closing") share nothing
    span = "alpha beta gamma delta epsilon zeta eta theta " * 3
    rows = [
        ("s01", f"{span}ending", "en"),
        ("s02", f"{span}closing", "en"),
        ("s03", "independent text about glaciers carving deep valleys "
                "over millennia of slow ice flow", "en"),
    ]
    corpus = spark.createDataFrame(rows, "pk string, body string, lg string")

    early = pipeline.curate(
        corpus, "pk", "body",
        span_dedup={"k": 8},
        near_dedup={"ngram": 3, "threshold": 0.5},
    )
    late = pipeline.curate(
        corpus, "pk", "body",
        span_dedup={"k": 8},
        near_dedup={"ngram": 3, "threshold": 0.5},
        span_dedup_after_near_dedup=True,
    )
    assert early.stages.index("span_dedup") < \
        early.stages.index("after_near_dedup")
    assert late.stages.index("span_dedup") > \
        late.stages.index("after_near_dedup")

    e_rows = {r["pk"]: r["body"] for r in early.docs.collect()}
    l_rows = {r["pk"]: r["body"] for r in late.docs.collect()}
    # both orders keep s03 untouched
    assert e_rows["s03"] == l_rows["s03"] == rows[2][1]
    # early order: span-strip runs first, so near-dedup sees the
    # residues — no longer near-dups → BOTH survive (the documented
    # semantic difference)
    assert sorted(e_rows) == ["s01", "s02", "s03"]
    # survivor-first: raw texts ARE near-dups (the shared span
    # dominates) → one survivor (smallest id), stripped afterwards
    assert sorted(l_rows) == ["s01", "s03"]
    # in both orders the surviving s01 keeps exactly ONE copy of the
    # tripled span (Lee et al. keep the first occurrence)
    for out in (e_rows["s01"], l_rows["s01"]):
        assert out.split().count("alpha") == 1
        assert out.split()[-1] == "ending"


def test_report_exact_survives_double_self_reference(spark):
    """A chain with BOTH self-referencing heavies (span-strip AND
    near-dedup) can leave upstream Observation rows empty (documented
    CollectMetrics re-instantiation limit); report(exact=True) must
    still return true per-stage counts."""
    res = pipeline.curate(
        _corpus(spark), "pk", "body",
        span_dedup={"k": 8},
        quality={"max_dup_ngram_frac": 0.2, "max_top_token_frac": 0.3,
                 "min_distinct_ratio": 0.3},
        near_dedup={"ngram": 3, "threshold": 0.5},
        persist=True,
    )
    res.docs.count()
    exact = res.report(exact=True)
    res.unpersist()
    assert exact["input"] == 8
    assert 0 < exact["output"] <= exact["after_quality"] <= 8
    # exact mode covers exactly the counter-marked stages (transform
    # stages like span_dedup have no counter in either mode)
    assert set(exact) == set(res.observations)

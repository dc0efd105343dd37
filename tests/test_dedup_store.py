"""Incremental MinHash signature store: decision policy (new-old drop,
new-new CC survivorship, shingle-less pass), store-only-holds-survivors
invariant across batches, estimate-verify, geometry/id-type pinning,
compaction cadence, and determinism across input partitionings."""

import json
import os

import pytest
from pyspark.sql import functions as F

from risjbot_spark.dedup_store import MinHashStore


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog every single day"),
        (2, "completely different text about spark dataframes and "
            "shuffles here"),
        (3, "a third unrelated document concerning bloom filters at scale"),
    ], "doc_id long, text string")


@pytest.fixture(scope="module")
def batch(spark):
    return spark.createDataFrame([
        # exact dup of stored 1
        (10, "the quick brown fox jumps over the lazy dog every single "
             "day"),
        # near-dup of stored 1 (first word dropped)
        (11, "quick brown fox jumps over the lazy dog every single day"),
        # unique
        (12, "a brand new document with entirely novel content and words"),
        # near-dup of 12 — a new-new pair; 12 is the min-id survivor
        (13, "a brand new document with entirely novel content and words "
             "too"),
        # shorter than the shingle size: no signature, always kept
        (14, "tiny"),
    ], "doc_id long, text string")


def _decisions(out):
    return {r["doc_id"]: (r["kept"], r["dup_of"])
            for r in out["decisions"].collect()}


def test_add_batch_policy(spark, corpus, batch, tmp_path):
    st = MinHashStore(spark, str(tmp_path / "s"))
    st.index_corpus(corpus, "doc_id", "text")
    assert st.n_stored_docs() == 3
    out = st.add_batch(batch, "doc_id", "text", corpus_df=corpus)
    assert _decisions(out) == {
        10: (False, 1), 11: (False, 1),          # dup vs store
        12: (True, None),                         # survivor
        13: (False, 12),                          # new-new loser
        14: (True, None),                         # no shingles
    }
    assert sorted(r["doc_id"] for r in out["kept"].collect()) == [12, 14]
    # store invariant: only survivors' signatures committed (14 has no
    # shingles so contributes none)
    assert st.n_stored_docs() == 4
    st.close()


def test_store_survivors_visible_to_later_batches(spark, corpus, batch,
                                                  tmp_path):
    st = MinHashStore(spark, str(tmp_path / "s"))
    st.index_corpus(corpus, "doc_id", "text")
    out1 = st.add_batch(batch, "doc_id", "text", corpus_df=corpus)
    full = corpus.unionAll(out1["kept"])
    b2 = spark.createDataFrame([
        # dup of doc 12, which was KEPT from batch 1
        (20, "a brand new document with entirely novel content and words"),
        (21, "yet another entirely fresh piece of content nobody has "
             "seen"),
    ], "doc_id long, text string")
    out2 = st.add_batch(b2, "doc_id", "text", corpus_df=full)
    assert _decisions(out2) == {20: (False, 12), 21: (True, None)}
    # estimate mode needs no corpus text and catches an exact dup of a
    # doc stored two batches ago (all k minima agree → estimate 1.0)
    b3 = spark.createDataFrame(
        [(30, "yet another entirely fresh piece of content nobody has "
              "seen")],
        "doc_id long, text string")
    out3 = st.add_batch(b3, "doc_id", "text", verify="estimate")
    assert _decisions(out3) == {30: (False, 21)}
    st.close()


def test_compaction_cadence_and_bucketed_base(spark, corpus, tmp_path):
    root = str(tmp_path / "s")
    st = MinHashStore(spark, root, compact_every=2)
    st.index_corpus(corpus, "doc_id", "text")  # bootstrap compacts
    meta = json.load(open(os.path.join(root, "meta.json")))
    assert meta["batches_since_compact"] == 0
    # the base is a BUCKETED snapshot (catalog table, band buckets)
    man = st._base.manifest()
    assert any("bucket_table" in e
               for e in man.get("file_meta", {}).values())
    b = spark.createDataFrame(
        [(40, "some wholly original sentence for the first delta batch")],
        "doc_id long, text string")
    st.add_batch(b, "doc_id", "text", corpus_df=corpus)
    assert json.load(open(os.path.join(root, "meta.json")))[
        "batches_since_compact"] == 1
    b2 = spark.createDataFrame(
        [(41, "another wholly original sentence for the second batch")],
        "doc_id long, text string")
    # corpus_df must cover everything stored so far: 41's text band-
    # collides with 40's, and the stale-corpus guard (rightly) refuses
    # to verify against a corpus that lacks the candidate
    st.add_batch(b2, "doc_id", "text", corpus_df=corpus.unionAll(b))
    # cadence hit: deltas folded into the base, counter reset
    assert json.load(open(os.path.join(root, "meta.json")))[
        "batches_since_compact"] == 0
    base, delta = st.stored_bands()
    assert delta.count() == 0
    # post-compaction probe still finds a dup of a delta-era doc
    b3 = spark.createDataFrame(
        [(42, "some wholly original sentence for the first delta batch")],
        "doc_id long, text string")
    out = st.add_batch(b3, "doc_id", "text",
                       corpus_df=corpus.unionAll(b).unionAll(b2))
    assert _decisions(out) == {42: (False, 40)}
    st.close()


def test_geometry_and_id_type_pinning(spark, corpus, tmp_path):
    root = str(tmp_path / "s")
    st = MinHashStore(spark, root, ngram=3)
    st.index_corpus(corpus, "doc_id", "text")
    # reopen with no args: adopts stored geometry
    st2 = MinHashStore(spark, root)
    assert st2.ngram == 3 and st2.num_bands == 2
    with pytest.raises(ValueError, match="geometry is pinned"):
        MinHashStore(spark, root, ngram=5)
    sdf = spark.createDataFrame([("a", "text irrelevant here")],
                                "doc_id string, text string")
    with pytest.raises(ValueError, match="pinned id type"):
        st2.add_batch(sdf, "doc_id", "text", verify="estimate")
    with pytest.raises(ValueError, match="needs corpus_df"):
        st2.add_batch(corpus, "doc_id", "text", verify="exact",
                      corpus_df=None)
    with pytest.raises(ValueError, match="unknown verify"):
        st2.add_batch(corpus, "doc_id", "text", verify="bogus")
    st.close()


def test_decisions_deterministic_across_partitionings(spark, corpus,
                                                      batch, tmp_path):
    d1 = MinHashStore(spark, str(tmp_path / "a"))
    d1.index_corpus(corpus, "doc_id", "text")
    r1 = _decisions(d1.add_batch(batch, "doc_id", "text",
                                 corpus_df=corpus))
    d2 = MinHashStore(spark, str(tmp_path / "b"))
    d2.index_corpus(corpus.repartition(7), "doc_id", "text")
    r2 = _decisions(d2.add_batch(batch.repartition(5), "doc_id", "text",
                                 corpus_df=corpus))
    assert r1 == r2
    d1.close(); d2.close()


def test_fresh_store_reads_empty(spark, tmp_path):
    """stored_bands()/n_stored_docs() on a never-written store return
    typed empties instead of crashing on a None id type (review
    finding)."""
    st = MinHashStore(spark, str(tmp_path / "s"))
    assert st.n_stored_docs() == 0
    base, delta = st.stored_bands()
    assert base.columns == ["band", "doc_id"] and base.count() == 0
    assert delta.count() == 0


def test_exact_verify_raises_on_stale_corpus(spark, corpus, batch,
                                             tmp_path):
    """A candidate stored doc missing from corpus_df must fail LOUDLY —
    the old inner join silently dropped the pair and admitted the
    duplicate (review finding)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    st = MinHashStore(spark, str(tmp_path / "s"))
    st.index_corpus(corpus, "doc_id", "text")
    stale = corpus.filter("doc_id <> 1")  # doc 1 is batch 10/11's dup
    # the raise can surface as a raw Py4JJavaError when it fires inside
    # the evidence localCheckpoint action rather than a SQL collect
    with pytest.raises((Py4JJavaError, PySparkException),
                       match="candidate stored doc 1 is missing"):
        st.add_batch(batch, "doc_id", "text",
                     corpus_df=stale)["decisions"].collect()
    st.close()


def test_crash_window_heals_on_open(spark, corpus, tmp_path):
    """A crash between the bands and mins commits leaves the tables
    inconsistent (bands without minima silently lose estimate-verify
    pairs); reopening rolls every table back to the last COMPLETE
    commit sequence recorded in meta (review finding)."""
    root = str(tmp_path / "s")
    st = MinHashStore(spark, root)
    st.index_corpus(corpus, "doc_id", "text")
    good_delta_sid = st._delta.current_snapshot_id()
    # simulate the torn commit: bands written, mins + meta never were
    orphan = spark.createDataFrame([("deadbeef" * 4, 999)],
                                   "band string, doc_id long")
    st._delta.commit(orphan, mode="append")
    assert st._delta.current_snapshot_id() != good_delta_sid
    st2 = MinHashStore(spark, root)
    assert st2._delta.current_snapshot_id() == good_delta_sid
    _, delta = st2.stored_bands()
    assert delta.filter("doc_id = 999").count() == 0
    st.close(); st2.close()


def test_batch_caches_released_and_prior_results_usable(spark, corpus,
                                                        batch, tmp_path):
    """add_batch releases the previous batch's plain caches (a
    long-lived store must not pin intermediates forever) while earlier
    batches' returned decisions stay collectable (they recompute or
    read pinned evidence)."""
    st = MinHashStore(spark, str(tmp_path / "s"))
    st.index_corpus(corpus, "doc_id", "text")
    out1 = st.add_batch(batch, "doc_id", "text", corpus_df=corpus)
    n_cached_after_1 = len(st._cached)
    b2 = spark.createDataFrame(
        [(50, "wholly fresh words never before seen in this corpus")],
        "doc_id long, text string")
    out2 = st.add_batch(b2, "doc_id", "text",
                        corpus_df=corpus.unionAll(out1["kept"]))
    # previous batch's caches were dropped, this batch's took their place
    assert len(st._cached) <= n_cached_after_1
    assert _decisions(out2) == {50: (True, None)}
    # batch-1 results still collectable after the release
    assert _decisions(out1)[10] == (False, 1)
    st.close()


def test_unrecorded_snapshots_refuse_then_adopt(spark, corpus, tmp_path):
    """A store with live snapshots but no table_state record is
    ambiguous (torn first commit vs pre-consistency-record store):
    opening must REFUSE — silently rolling back would destroy a
    pre-upgrade store's data (review finding) — and adopt_tables=True
    accepts the current snapshots as consistent."""
    root = str(tmp_path / "s")
    st = MinHashStore(spark, root)
    st.index_corpus(corpus, "doc_id", "text")
    # simulate a pre-upgrade meta: drop the consistency record
    meta = json.load(open(os.path.join(root, "meta.json")))
    del meta["table_state"]
    json.dump(meta, open(os.path.join(root, "meta.json"), "w"))
    with pytest.raises(RuntimeError, match="adopt_tables=True"):
        MinHashStore(spark, root)
    st2 = MinHashStore(spark, root, adopt_tables=True)
    assert st2.n_stored_docs() == 3
    # the adoption recorded state, so a plain reopen now works
    assert MinHashStore(spark, root).n_stored_docs() == 3
    st.close(); st2.close()


def test_same_object_heals_after_failed_commit(spark, corpus, batch,
                                               tmp_path):
    """A failed commit sequence must roll back on the SAME store object
    (a restarted streaming query keeps the store in its closure — it
    never re-runs __init__'s heal), or the retry re-appends on top of
    the half-committed batch (review finding)."""
    st = MinHashStore(spark, str(tmp_path / "s"))
    st.index_corpus(corpus, "doc_id", "text")
    good_delta = st._delta.current_snapshot_id()
    good_mins = st._mins.current_snapshot_id()
    # make the SECOND table commit of the sequence explode
    orig = st._mins.commit
    st._mins.commit = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("boom"))
    with pytest.raises(RuntimeError, match="boom"):
        st.add_batch(batch, "doc_id", "text", corpus_df=corpus)
    st._mins.commit = orig
    # the bands delta written before the failure was rolled back
    assert st._delta.current_snapshot_id() == good_delta
    assert st._mins.current_snapshot_id() == good_mins
    # retry on the same object succeeds cleanly (no duplicate bands)
    out = st.add_batch(batch, "doc_id", "text", corpus_df=corpus)
    assert _decisions(out)[12] == (True, None)
    assert st.n_stored_docs() == 4
    st.close()

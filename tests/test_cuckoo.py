"""Partitioned cuckoo filter (frontier/cuckoo.py): membership/delete
semantics, rollback-on-full, zero false negatives under the engine's
insert/delete discipline, checkpoint round-trip, probe parity between
the broadcast and aligned paths, and engine integration as
bloom_backend="cuckoo" (trim rounds delete keys from the filter)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from risjbot_spark.frontier.cuckoo import PartitionedCuckoo, _contains


def _keys(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(-2**62, 2**62, size=n, dtype=np.int64)


def test_insert_contains_no_false_negatives():
    f = PartitionedCuckoo(n_buckets=8, slots_per_bucket=1 << 10)
    ks = _keys(5000)
    f.add_local(ks)
    for b in np.unique(np.mod(ks, 8)):
        sel = ks[np.mod(ks, 8) == b]
        hit = _contains(f.tables[int(b)], sel)
        miss = sel[~hit]
        # misses must all be stashed (never silently dropped)
        assert all(int(k) in f.stash for k in miss)
    assert f.n_keys == 5000


def test_member_vec_membership_and_fp_rate():
    f = PartitionedCuckoo(n_buckets=8, slots_per_bucket=1 << 10)
    ks = _keys(5000, seed=1)
    f.add_local(ks)
    assert f._member_vec(f.tables, f.stash, ks).all()
    others = _keys(20000, seed=2)
    others = others[~np.isin(others, ks)]
    fp = f._member_vec(f.tables, f.stash, others).mean()
    # 16-bit fingerprints, 2 candidate rows x 4 lanes: fp ~ 8/2^16
    assert fp < 0.01, f"false-positive rate {fp:.4f} too high"


def test_delete_removes_membership_exactly_once():
    f = PartitionedCuckoo(n_buckets=4, slots_per_bucket=1 << 9)
    ks = _keys(2000, seed=3)
    f.add_local(ks)
    dead, live = ks[:1000], ks[1000:]
    removed = f.delete_local(dead)
    assert removed == 1000
    assert f.n_keys == 1000
    # every surviving key still answers true — deletion must never
    # manufacture a false negative for a live key
    assert f._member_vec(f.tables, f.stash, live).all()


def test_rollback_on_full_preserves_membership():
    # tiny filter, overfill it: failed inserts stash, and every
    # previously inserted key stays a member (rollback correctness)
    f = PartitionedCuckoo(n_buckets=1, slots_per_bucket=1 << 4)  # cap 64
    ks = _keys(200, seed=4)
    f.add_local(ks)
    assert f.overfull()          # way past 0.84 * 64
    assert f.stash               # some inserts must have failed
    assert f._member_vec(f.tables, f.stash, ks).all()


def test_delete_df_wraps_delete_local(spark):
    f = PartitionedCuckoo(n_buckets=4, slots_per_bucket=1 << 8)
    ks = _keys(400, seed=12)
    f.add_local(ks)
    df = spark.createDataFrame([(int(k),) for k in ks[:150]],
                               "url_hash long")
    assert f.delete_df(df) == 150
    assert f.n_keys == 250
    assert f._member_vec(f.tables, f.stash, ks[150:]).all()


def test_save_load_roundtrip(tmp_path):
    f = PartitionedCuckoo(n_buckets=4, slots_per_bucket=1 << 8)
    ks = _keys(900, seed=5)
    f.add_local(ks)
    f.delete_local(ks[:100])
    f.save(str(tmp_path))
    g = PartitionedCuckoo.load(str(tmp_path))
    assert g.n_keys == f.n_keys and g.stash == f.stash
    assert all((g.tables[b] == t).all() for b, t in f.tables.items())
    assert g._member_vec(g.tables, g.stash, ks[100:]).all()


def test_split_matches_member_vec(spark):
    f = PartitionedCuckoo(n_buckets=4, slots_per_bucket=1 << 8)
    ins = _keys(500, seed=6)
    f.add_local(ins)
    probe = np.concatenate([ins[:250], _keys(500, seed=7)])
    df = spark.createDataFrame([(int(k),) for k in probe], "url_hash long")
    maybe, fresh = f.split(df, spark)
    got_maybe = {r["url_hash"] for r in maybe.collect()}
    expect = set(probe[f._member_vec(f.tables, f.stash, probe)].tolist())
    assert got_maybe == expect
    assert {r["url_hash"] for r in fresh.collect()} == \
        set(probe.tolist()) - expect


def test_split_aligned_parity(spark):
    f = PartitionedCuckoo(n_buckets=4, slots_per_bucket=1 << 8)
    f.add_local(_keys(500, seed=8))
    probe = np.concatenate([_keys(300, seed=8)[:150], _keys(300, seed=9)])
    df = spark.createDataFrame([(int(k),) for k in probe], "url_hash long")
    m1, f1 = f.split(df, spark)
    m2, f2 = f.split_aligned(df, spark)
    assert ({r["url_hash"] for r in m1.collect()}
            == {r["url_hash"] for r in m2.collect()})
    assert ({r["url_hash"] for r in f1.collect()}
            == {r["url_hash"] for r in f2.collect()})


def test_from_seen_distributed_build(spark):
    ks = _keys(4000, seed=10)
    seen = spark.createDataFrame([(int(k),) for k in ks], "url_hash long")
    f = PartitionedCuckoo.from_seen(seen, n_buckets=8,
                                    slots_per_bucket=1 << 9)
    assert f.n_keys == 4000
    assert f._member_vec(f.tables, f.stash, ks).all()


def test_add_df_promotes_to_distributed_above_threshold(spark):
    # same final membership whichever path runs; above driver_threshold
    # the delta must go through the shard-parallel build (asserted by
    # forcing a tiny threshold), and the updated filter must still see
    # BOTH the pre-existing keys and the delta
    base = _keys(1500, seed=20)
    delta = _keys(1500, seed=21)
    f_driver = PartitionedCuckoo(n_buckets=8, slots_per_bucket=1 << 10)
    f_driver.add_local(base)
    f_dist = PartitionedCuckoo(n_buckets=8, slots_per_bucket=1 << 10)
    f_dist.add_local(base)

    delta_df = spark.createDataFrame([(int(k),) for k in delta],
                                     "url_hash long")
    f_driver.add_df(delta_df)                        # driver path
    f_dist.add_df(delta_df, driver_threshold=100)    # distributed path

    allk = np.concatenate([base, delta])
    assert f_dist.n_keys == f_driver.n_keys == 3000
    assert f_dist._member_vec(f_dist.tables, f_dist.stash, allk).all()
    assert f_driver._member_vec(f_driver.tables, f_driver.stash,
                                allk).all()
    # below threshold the driver path runs (no promotion): identical
    # membership again after a second small delta on both filters
    d2 = _keys(50, seed=22)
    d2_df = spark.createDataFrame([(int(k),) for k in d2], "url_hash long")
    f_dist.add_df(d2_df, driver_threshold=1_000_000)
    assert f_dist._member_vec(f_dist.tables, f_dist.stash, d2).all()
    # deletes still remove exactly the distributed-added keys; colliding
    # fingerprints may still probe true (false positives are allowed —
    # the hard guarantee is the REMAINING keys keep membership), but at
    # this load the FP rate over 100 deleted keys stays well under half
    assert f_dist.delete_local(delta[:100]) == 100
    gone = f_dist._member_vec(f_dist.tables, f_dist.stash, delta[:100])
    assert int(gone.sum()) < 50
    rest = np.concatenate([base, delta[100:], d2])
    assert f_dist._member_vec(f_dist.tables, f_dist.stash, rest).all()


def test_stash_counts_duplicate_overflow():
    # the stash is a counted multiset so delete-one semantics hold even
    # for keys that overflowed more than once (defensive; the engine
    # never double-inserts)
    f = PartitionedCuckoo(n_buckets=1, slots_per_bucket=1 << 2)  # cap 16
    k = np.array([12345], dtype=np.int64)
    f.add_local(np.repeat(_keys(100, seed=11), 1))  # saturate
    f.add_local(k)
    f.add_local(k)
    pre = f._member_vec(f.tables, f.stash, k)[0]
    assert pre
    f.delete_local(k)
    assert f._member_vec(f.tables, f.stash, k)[0]   # one copy remains
    f.delete_local(k)


# ---------------------------------------------------------------------------
# engine integration: bloom_backend="cuckoo"
# ---------------------------------------------------------------------------

def _engine(spark, corpus, wh, backend, **kw):
    from risjbot_spark.crawl import CrawlConfig, CrawlEngine
    from risjbot_spark.frontier.state import RefetchConfig

    cfg = CrawlConfig(
        refetch=RefetchConfig(maxfetches=5, refetchsecs=3600,
                              agelimit=4 * 3600, trimdb=True),
        default_budget=1000, num_partitions=4, collect_lineage=False,
        bloom_backend=backend, **{"trim_every": 2, **kw})
    return CrawlEngine(spark, wh, corpus, None, cfg)


def _snap(eng):
    arts = eng.articles_table.read().select(
        "round", "url_canon").collect()
    seen = eng.seen().select("url_hash", "fetches").collect()
    return ({(r["round"], r["url_canon"]) for r in arts},
            {(r["url_hash"], r["fetches"]) for r in seen})


def test_engine_cuckoo_parity_with_bloom(spark, tmp_path):
    """Same corpus, same seeds, driver-bloom vs cuckoo backend: identical
    articles and final seen state across rounds including a trim round
    — the filter backends only pre-filter; the authoritative join
    decides."""
    from datetime import datetime, timezone

    from risjbot_spark.corpus import pages_df, url_for

    corpus = pages_df(spark, 120, partitions=4)
    seeds = spark.createDataFrame(
        [(url_for(i), 0) for i in range(0, 120, 2)],
        "url string, priority int")
    start = datetime(2017, 4, 1, tzinfo=timezone.utc)
    e1 = _engine(spark, corpus, str(tmp_path / "whb"), "driver")
    e1.run(seeds, rounds=3, start_ts=start, round_gap_secs=3600)
    e2 = _engine(spark, corpus, str(tmp_path / "whc"), "cuckoo")
    e2.run(seeds, rounds=3, start_ts=start, round_gap_secs=3600)
    assert _snap(e1) == _snap(e2)
    assert e2.backend_choices["bloom_backend"]["value"] == "cuckoo"


def test_engine_cuckoo_trim_deletes_from_filter(spark, tmp_path):
    """After a trim round removes stale keys from the seen table, the
    cuckoo filter no longer claims them (n_keys tracks LIVE keys) —
    the deletion capability the bloom backends lack."""
    from datetime import datetime, timezone

    from risjbot_spark.corpus import pages_df, url_for

    corpus = pages_df(spark, 60, partitions=4)
    start = datetime(2017, 4, 1, tzinfo=timezone.utc)
    # round 0 fetches set A; later rounds fetch ONLY set B, so A ages
    # past agelimit (4h) and the round-4 trim deletes it
    seeds_a = spark.createDataFrame(
        [(url_for(i), 0) for i in range(0, 30)], "url string, priority int")
    seeds_b = spark.createDataFrame(
        [(url_for(i), 0) for i in range(30, 60)], "url string, priority int")
    # refetchfromdb=False: the J3a trawl would otherwise re-request set
    # A every round, refreshing last_fetch and keeping it alive forever
    from risjbot_spark.crawl import CrawlConfig, CrawlEngine
    from risjbot_spark.frontier.state import RefetchConfig

    cfg = CrawlConfig(
        refetch=RefetchConfig(maxfetches=5, refetchsecs=3600,
                              agelimit=4 * 3600, trimdb=True,
                              refetchfromdb=False),
        default_budget=1000, num_partitions=4, collect_lineage=False,
        bloom_backend="cuckoo", trim_every=4)
    eng = CrawlEngine(spark, str(tmp_path / "wht"), corpus, None, cfg)
    eng.run_round(seeds_a, 0, start)
    for r in range(1, 5):
        from datetime import timedelta

        eng.run_round(seeds_b, r, start + timedelta(seconds=3600 * r))
    seen_keys = {r["url_hash"] for r in eng.seen().select("url_hash").collect()}
    # set A must be gone from the seen table (aged out, never requested)
    from risjbot_spark.frontier.xxhash import xxhash64
    from risjbot_spark.urlnorm import canonicalize_py
    a_keys = np.array([xxhash64(canonicalize_py(url_for(i)))
                       for i in range(0, 30)], dtype=np.int64)
    assert not (set(a_keys.tolist()) & seen_keys)
    # and the FILTER must not claim them either
    assert not eng.bloom._member_vec(
        eng.bloom.tables, eng.bloom.stash, a_keys).any()
    assert eng.bloom.n_keys == len(seen_keys)


def test_engine_cuckoo_checkpoint_resume(spark, tmp_path):
    """Filter checkpoint + marker round-trip: a second engine over the
    same warehouse reuses the saved filter (no rebuild) and keeps
    gating correctly."""
    from datetime import datetime, timezone

    from risjbot_spark.corpus import pages_df, url_for

    corpus = pages_df(spark, 60, partitions=4)
    seeds = spark.createDataFrame(
        [(url_for(i), 0) for i in range(0, 60, 2)],
        "url string, priority int")
    start = datetime(2017, 4, 1, tzinfo=timezone.utc)
    e1 = _engine(spark, corpus, str(tmp_path / "whr"), "cuckoo")
    e1.run(seeds, rounds=1, start_ts=start)
    n1 = e1.bloom.n_keys
    e2 = _engine(spark, corpus, str(tmp_path / "whr"), "cuckoo")
    assert e2.bloom is not None and e2.bloom.n_keys == n1
    # second round via the resumed engine still works end-to-end
    e2.run(seeds, rounds=1, start_ts=start, round_gap_secs=3600)
    assert e2.articles_table.read().filter("round = 1").count() > 0


def test_engine_cuckoo_trim_with_aggressive_expiry(spark, tmp_path):
    """expire_keep_last=1 physically deletes pre-compaction snapshot
    files right after the trim commit — the trimmed-key collect must
    run BEFORE that (regression: a post-expire collect threw
    FileNotFound on every trim round)."""
    from datetime import datetime, timedelta, timezone

    from risjbot_spark.corpus import pages_df, url_for
    from risjbot_spark.crawl import CrawlConfig, CrawlEngine
    from risjbot_spark.frontier.state import RefetchConfig

    corpus = pages_df(spark, 60, partitions=4)
    start = datetime(2017, 4, 1, tzinfo=timezone.utc)
    cfg = CrawlConfig(
        refetch=RefetchConfig(maxfetches=5, refetchsecs=3600,
                              agelimit=4 * 3600, trimdb=True,
                              refetchfromdb=False),
        default_budget=1000, num_partitions=4, collect_lineage=False,
        bloom_backend="cuckoo", trim_every=4, expire_keep_last=1)
    eng = CrawlEngine(spark, str(tmp_path / "whx"), corpus, None, cfg)
    seeds_a = spark.createDataFrame(
        [(url_for(i), 0) for i in range(0, 20)], "url string, priority int")
    seeds_b = spark.createDataFrame(
        [(url_for(i), 0) for i in range(20, 40)], "url string, priority int")
    eng.run_round(seeds_a, 0, start)
    for r in range(1, 5):   # round 4 = trim + expire round
        eng.run_round(seeds_b, r, start + timedelta(seconds=3600 * r))
    n_seen = eng.seen().count()
    assert eng.bloom.n_keys == n_seen   # filter tracks live keys

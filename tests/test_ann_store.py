"""Incremental IVF vector store: build/add/search parity with the
one-shot ann.ivf_search, assignment-only adds (counts + imbalance
tracking), rebuild, geometry/id pinning via PinnedStore, and the
partition-pruned probe scan."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from risjbot_spark import ann
from risjbot_spark.ann_store import IVFStore


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def query(spark, emb):
    return (emb.filter("vec_id = 0")
            .select(ann.as_double_vec("embedding").alias("qv")))


def test_build_add_search_matches_oneshot(spark, emb, query, tmp_path):
    st = IVFStore(spark, str(tmp_path / "ivf"))
    st.build(emb.filter("vec_id % 3 != 0"), "vec_id", "embedding")
    n_built = st.n_stored_vectors()
    out = st.add_batch(emb.filter("vec_id % 3 = 0 AND vec_id != 0"),
                       "vec_id", "embedding")
    assert st.n_stored_vectors() > n_built
    assert out["imbalance"] >= 1.0 and not out["needs_rebuild"]
    got = [tuple(r) for r in st.search(query, nprobe=3, k=10).collect()]
    # parity: the store's partitioned probe == one-shot ivf_search over
    # the same centroids and the same full vector set
    ref = [tuple(r) for r in ann.ivf_search(
        emb.filter("vec_id != 0"), "vec_id", "embedding",
        st.centroids(), query, nprobe=3, k=10).collect()]
    assert got == ref and len(got) == 10
    st.close()


def test_vectors_partitioned_by_cid(spark, emb, tmp_path):
    root = str(tmp_path / "ivf")
    st = IVFStore(spark, root)
    st.build(emb.filter("vec_id % 3 != 0"), "vec_id", "embedding")
    # hive layout: cid=<n> directories under the vectors snapshot dir
    dirs = glob.glob(os.path.join(root, "vectors",
                                  "snap-*", "cid=*"))
    assert len(dirs) == st.k
    st.close()


def test_rebuild_after_drift(spark, emb, tmp_path):
    st = IVFStore(spark, str(tmp_path / "ivf"), rebuild_imbalance=1.01)
    st.build(emb.filter("vec_id < 60"), "vec_id", "embedding")
    # pile everything else on: assignment-only adds drift the counts
    out = st.add_batch(emb.filter("vec_id >= 60"), "vec_id",
                       "embedding")
    assert out["needs_rebuild"]
    n = st.n_stored_vectors()
    st.rebuild()
    assert st.n_stored_vectors() == n
    # counts were recomputed from the full reassignment
    assert sum(st._meta["counts"].values()) == n
    q = (emb.filter("vec_id = 0")
         .select(ann.as_double_vec("embedding").alias("qv")))
    assert st.search(q, k=5).count() == 5
    st.close()


def test_pinning_inherited(spark, emb, tmp_path):
    root = str(tmp_path / "ivf")
    st = IVFStore(spark, root, k=5)
    st.build(emb.filter("vec_id % 3 != 0"), "vec_id", "embedding")
    st2 = IVFStore(spark, root)
    assert st2.k == 5
    with pytest.raises(ValueError, match="geometry is pinned"):
        IVFStore(spark, root, k=7)
    sdf = spark.createDataFrame([("a", [0.1, 0.2])],
                                "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="pinned id type"):
        st2.add_batch(sdf, "vec_id", "embedding")
    # fresh store reads typed empties
    st3 = IVFStore(spark, str(tmp_path / "fresh"))
    assert st3.n_stored_vectors() == 0
    assert st3.vectors().count() == 0 and st3.centroids().count() == 0
    st.close()


def test_add_or_search_before_build_raises(spark, emb, tmp_path):
    """Without centroids the argmin would be null and every vector
    would land in a cid=null partition no probe list ever selects —
    silently black-holed (review finding). Fail loudly instead."""
    st = IVFStore(spark, str(tmp_path / "ivf"))
    with pytest.raises(RuntimeError, match="no index built yet"):
        st.add_batch(emb.limit(5), "vec_id", "embedding")
    with pytest.raises(RuntimeError, match="no index built yet"):
        st.search(emb.limit(1).select(
            ann.as_double_vec("embedding").alias("qv")))


def test_imbalance_counts_empty_clusters(spark, tmp_path):
    """A degenerate build that leaves most clusters empty is the WORST
    skew, not 'perfectly even' — the mean divides by K (review
    finding)."""
    st = IVFStore(spark, str(tmp_path / "ivf"), k=10,
                  rebuild_imbalance=4.0)
    # 30 near-identical vectors: Lloyd collapses to very few clusters
    df = spark.createDataFrame(
        [(i, [1.0, 1.0 + i * 1e-9]) for i in range(30)],
        "vec_id long, embedding array<double>")
    st.build(df, "vec_id", "embedding")
    assert st.imbalance() > 4.0 and st.needs_rebuild()
    st.close()


def test_auto_rebuild_fires_once_and_recall_recovers(spark, tmp_path):
    """auto_rebuild=True: a skew-inducing batch stream triggers EXACTLY
    one inline rebuild (the batch that crosses the threshold), the
    post-rebuild imbalance is back under it, and search recall vs the
    brute-force truth recovers to the freshly-built level."""
    def blob(base, lo, hi):
        # points around axis `base` of a 4-d space, deterministic jitter
        rows = []
        for i in range(lo, hi):
            v = [0.05 * ((i * 7 + d) % 5) for d in range(4)]
            v[base] += 10.0
            rows.append((i, v))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    st = IVFStore(spark, str(tmp_path / "ivf"), k=3,
                  rebuild_imbalance=1.5, auto_rebuild=True)
    st.build(blob(0, 0, 60).union(blob(1, 100, 160))
             .union(blob(2, 200, 260)), "vec_id", "embedding")

    rebuilds = []
    # batch 1 drops 120 vectors into a region no built centroid covers
    # (axis 3): assignment-only adds dump them all into ONE stale
    # cluster → imbalance crosses 1.5 → inline rebuild re-separates;
    # batch 2 is small and in-distribution and must NOT re-trigger
    for batch in (blob(3, 300, 420), blob(1, 500, 530)):
        out = st.add_batch(batch, "vec_id", "embedding")
        rebuilds.append(out["rebuilt"])
        if out["rebuilt"]:
            assert out["imbalance"] <= 1.5 + 1e-9
            assert not out["needs_rebuild"]
    assert rebuilds == [True, False], rebuilds

    # recall recovery: IVF probe vs brute-force cosine truth over the
    # full stored set (the rebuilt centroids re-separate the blobs)
    stored = st.vectors()
    q = spark.createDataFrame(
        [([10.0, 0.0, 0.05, 0.1],)], "qv array<double>")
    truth = {r["vec_id"] for r in ann.brute_topk(
        stored, "vec_id", "vec", q, k=10).collect()}
    got = {r["vec_id"] for r in st.search(q, nprobe=1, k=10).collect()}
    assert len(truth & got) / len(truth) >= 0.9
    st.close()

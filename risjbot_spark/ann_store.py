"""Incremental IVF vector store: a persisted k-means inverted-file
index over embeddings, so new vectors are ADDED by assignment (one
broadcast argmin expression — zero shuffle of the vector side, see
`ann.assign_nearest`) instead of rebuilding the index, and searches
read only the probed clusters' files.

The store is the ANN twin of `dedup_store.MinHashStore` (same
PinnedStore machinery: geometry pinned in meta.json, cross-table commit
consistency with rollback-on-open healing):

  * `centroids` — the k-means centroids (k rows), replaced on
    build/rebuild.
  * `vectors`   — (cid, vec_id, vec) hive-PARTITIONED by cid: a search
    probing nprobe of K clusters scans ~nprobe/K of the data via
    PARTITION PRUNING (the cid filter is a literal IN list, so the scan
    never opens the other clusters' files — the actual IVF win,
    plan-asserted in tools/explain_plans.py).

Drift: assignment-only adds degrade the index as the distribution
shifts — per-cluster counts are tracked in meta; `imbalance()` (max /
mean) and `needs_rebuild()` expose the health signal, `rebuild()`
re-runs Lloyd over everything stored and reassigns (the O(store) step,
scheduled by the caller like the MinHash store's compaction).

Reference parity: no RISJbot analogue — part of the LLM-pipeline
surface the brief adds, composing `ann.kmeans`/`assign_nearest` with
the engine's snapshot-store machinery.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import ann
from .store import SnapshotTable
from .store.pinned import PinnedStore

__all__ = ["IVFStore"]

_GEOMETRY = ("k", "iters", "quantize", "nprobe", "rebuild_imbalance")
_DEFAULTS = {"k": 10, "iters": 2, "quantize": 6, "nprobe": 3,
             "rebuild_imbalance": 4.0}


class IVFStore(PinnedStore):
    """Persisted IVF index with assignment-only incremental adds.

    >>> store = IVFStore(spark, "/data/ivf", k=256)
    >>> store.build(corpus, "vec_id", "embedding")
    >>> store.add_batch(new_vectors, "vec_id", "embedding")
    >>> store.search(query_df, k=10)       # scans ~nprobe/K of the data
    >>> if store.needs_rebuild(): store.rebuild()

    Vector ids follow the same store-lifetime uniqueness contract as
    the MinHash store; vectors must share one dimensionality (the
    cosine expressions zip element-wise)."""

    GEOMETRY = _GEOMETRY
    DEFAULTS = _DEFAULTS

    def __init__(self, spark, root: str, *,
                 k: Optional[int] = None,
                 iters: Optional[int] = None,
                 quantize: Optional[int] = None,
                 nprobe: Optional[int] = None,
                 rebuild_imbalance: Optional[float] = None,
                 auto_rebuild: bool = False,
                 checkpoint_dir: Optional[str] = None,
                 adopt_tables: bool = False):
        super().__init__(
            spark, root,
            {"k": k, "iters": iters, "quantize": quantize,
             "nprobe": nprobe, "rebuild_imbalance": rebuild_imbalance},
            checkpoint_dir=checkpoint_dir, adopt_tables=adopt_tables)
        # operational cadence, not pinned geometry (an old store's meta
        # has no such key, and the right cadence can differ per caller):
        # with auto_rebuild, add_batch runs the O(store) rebuild itself
        # whenever the batch pushes imbalance past rebuild_imbalance —
        # the same self-maintaining pattern as the MinHash store's
        # compact_every
        self.auto_rebuild = auto_rebuild
        if "counts" not in self._meta:
            self._meta["counts"] = {}
            self._save_meta()
        self._cents = SnapshotTable(spark, root, "centroids")
        self._vecs = SnapshotTable(spark, root, "vectors")
        self._register_tables(self._cents, self._vecs)

    # -- schemas / reads ------------------------------------------------------

    def _vec_schema(self) -> str:
        return f"cid int, vec_id {self._id_type()}, vec array<double>"

    def centroids(self) -> DataFrame:
        return self._cents.read(schema="centroid int, cvec array<double>")

    def vectors(self) -> DataFrame:
        return self._vecs.read(schema=self._vec_schema())

    def n_stored_vectors(self) -> int:
        return sum(self._meta["counts"].values())

    # -- index health ----------------------------------------------------------

    def imbalance(self) -> float:
        """max over per-cluster counts / (total / k) — 1.0 = perfectly
        even; grows as assignment-only adds drift from the built
        distribution. The mean divides by K, not by the number of
        NON-EMPTY clusters: a degenerate build that left 9 of 10
        clusters empty is the worst skew there is (search degrades to a
        full scan of the one live cluster), and must read as 10.0, not
        1.0."""
        counts = list(self._meta["counts"].values())
        total = sum(counts)
        if not total:
            return 1.0
        return max(counts) / (total / self.k)

    def needs_rebuild(self) -> bool:
        return self.imbalance() > self.rebuild_imbalance

    # -- build / add / rebuild ---------------------------------------------------

    def _assigned(self, df: DataFrame, id_col: str, vec_col: str,
                  cents: DataFrame) -> DataFrame:
        e = df.select(F.col(id_col).alias("vec_id"),
                      ann.as_double_vec(vec_col).alias("vec"))
        return (ann.assign_nearest(e, "vec", cents, out_col="cid")
                .select(F.col("cid").cast("int"), "vec_id", "vec"))

    def _merge_counts(self, assigned: DataFrame) -> None:
        # k-row collect: the per-cluster counts of THIS batch only
        # (batch-sized aggregation, never a store scan)
        for r in assigned.groupBy("cid").count().collect():
            key = str(r["cid"])
            self._meta["counts"][key] = (
                self._meta["counts"].get(key, 0) + r["count"])

    def build(self, df: DataFrame, id_col: str, vec_col: str) -> None:
        """Lloyd k-means over `df` (deterministic, quantized per
        iteration — see ann.kmeans), then commit centroids + the
        cid-partitioned vector table. Replaces any existing index."""
        self._pin_id_type(df, id_col)
        self._release_batch_intermediates()
        cents = ann.kmeans(df, id_col, vec_col, k=self.k,
                           iters=self.iters, quantize=self.quantize)
        assigned = self._cache(self._assigned(df, id_col, vec_col, cents))

        def commit():
            self._cents.commit(cents, mode="replace")
            self._vecs.commit(assigned, mode="replace",
                              partition_by=["cid"])
            self._meta["counts"] = {}
            self._merge_counts(assigned)
            self._record_table_state()
        self._consistent_commit(commit)

    def add_batch(self, df: DataFrame, id_col: str,
                  vec_col: str) -> dict:
        """Assign new vectors to the EXISTING centroids (one broadcast
        argmin expression — O(batch), zero shuffle of the vector side)
        and append them to their clusters' partitions. Returns
        {"assigned": ..., "imbalance": ..., "needs_rebuild": ...,
        "rebuilt": ...}.

        With auto_rebuild=True (constructor), a batch that pushes
        imbalance past rebuild_imbalance triggers rebuild() inline
        AFTER the append commits — the batch is never lost to a rebuild
        crash, and the reported imbalance is the post-rebuild one."""
        self._require_built("add_batch")
        self._pin_id_type(df, id_col)
        self._release_batch_intermediates()
        cents = self.centroids()
        assigned = self._cache(self._assigned(df, id_col, vec_col, cents))

        def commit():
            self._vecs.commit(assigned, mode="append",
                              partition_by=["cid"])
            self._merge_counts(assigned)
            self._record_table_state()
        self._consistent_commit(commit)
        rebuilt = False
        if self.auto_rebuild and self.needs_rebuild():
            self.rebuild()
            rebuilt = True
        return {"assigned": assigned, "imbalance": self.imbalance(),
                "needs_rebuild": self.needs_rebuild(), "rebuilt": rebuilt}

    def _require_built(self, op: str) -> None:
        # without centroids, assign_nearest's argmin over an EMPTY
        # broadcast array is null: every vector would land in a
        # cid=null hive partition that no literal probe list ever
        # selects — silently black-holed. Fail loudly instead.
        if self._cents.current_snapshot_id() is None:
            raise RuntimeError(
                f"IVFStore.{op}: no index built yet — call build() "
                "with the initial corpus first")

    def rebuild(self) -> None:
        """Re-run Lloyd over everything stored and reassign — the
        O(store) maintenance step (the caller schedules it off
        `needs_rebuild()`, like the MinHash store's compaction
        cadence)."""
        self.build(self.vectors(), "vec_id", "vec")

    # -- search -------------------------------------------------------------------

    def search(self, query: DataFrame, *, query_vec_col: str = "qv",
               nprobe: Optional[int] = None, k: int = 10,
               round_to: int = 6) -> DataFrame:
        """IVF top-k: rank the stored centroids against the (1-row)
        query, then scan ONLY the nprobe nearest clusters' partitions —
        the probe list is collected driver-side (a K-row action) so the
        cid filter is a literal IN list Spark can prune partitions
        with, which is the point of the inverted file: the other
        K-nprobe clusters' files are never opened."""
        self._require_built("search")
        npr = self.nprobe if nprobe is None else nprobe
        q = query.select(F.col(query_vec_col).alias("qv"))
        probes = [
            r["centroid"]
            for r in (self.centroids().crossJoin(F.broadcast(q))
                      .select("centroid",
                              ann.cosine_expr(F.col("cvec"),
                                              F.col("qv")).alias("c"))
                      .orderBy(F.col("c").desc(),
                               F.col("centroid").asc())
                      .limit(npr).collect())]
        cands = (self.vectors()
                 .filter(F.col("cid").isin(probes))
                 .crossJoin(F.broadcast(q)))
        return (cands.select(
            "vec_id",
            F.round(ann.cosine_expr(F.col("vec"), F.col("qv")),
                    round_to).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            .limit(k))

"""Shared machinery for persisted incremental stores (the MinHash
signature store and the IVF vector store): geometry-pinned meta.json,
cross-table commit consistency with rollback-on-open healing, and the
cache/lineage-truncation bookkeeping batches need.

Contracts provided to subclasses:

  * GEOMETRY/DEFAULTS class attrs: parameter names pinned at creation.
    Reopening with conflicting explicit arguments raises; None adopts
    the stored value.
  * `_register_tables(*snapshot_tables)` + `_record_table_state()`:
    meta records every table's current snapshot id AFTER each complete
    multi-table commit sequence; `__init__` rolls tables back to that
    record, so a crash mid-sequence is healed as batch-never-happened
    (each SnapshotTable swap is atomic, the SEQUENCE is not).
  * `_cache` / `_truncate` / `_release_batch_intermediates` / `close`:
    plain caches are released at the next batch; truncated evidence
    (localCheckpoint, or reliable `spark.checkpoint()` under
    checkpoint_dir) stays pinned so returned DataFrames outlive the
    batch — without truncation, plans compound across batches through
    corpus/result chains until the PLANNER itself OOMs (measured: a
    2-doc batch against a 1 GiB driver heap).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame

from .snapshots import SnapshotTable


class PinnedStore:
    GEOMETRY: "tuple[str, ...]" = ()
    DEFAULTS: "dict[str, object]" = {}

    def __init__(self, spark, root: str, passed: dict, *,
                 checkpoint_dir: Optional[str] = None,
                 adopt_tables: bool = False):
        self.spark = spark
        self.root = root
        self.checkpoint_dir = checkpoint_dir
        self._adopt_tables = adopt_tables
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)
            clash = {p: (v, self._meta[p]) for p, v in passed.items()
                     if v is not None and v != self._meta[p]}
            if clash:
                raise ValueError(
                    f"{type(self).__name__} geometry is pinned at "
                    f"creation; reopening {root} with conflicting "
                    f"arguments {clash} (passed, stored) would "
                    "silently mix incompatible state")
        else:
            self._meta = {p: (v if v is not None else self.DEFAULTS[p])
                          for p, v in passed.items()}
            self._meta["id_type"] = None
            self._save_meta()
        for p in self.GEOMETRY:
            setattr(self, p, self._meta[p])
        self._tables: "list[SnapshotTable]" = []
        self._cached: "list[DataFrame]" = []
        self._pinned: "list[DataFrame]" = []

    # -- tables + consistency -------------------------------------------------

    def _register_tables(self, *tables: SnapshotTable) -> None:
        self._tables = list(tables)
        self._heal_tables()

    def _save_meta(self) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._meta, f, indent=1)
        os.replace(tmp, self._meta_path)

    def _record_table_state(self) -> None:
        """Record every table's current snapshot id in meta, LAST in
        each multi-table commit sequence — the consistency marker
        `_heal_tables` checks on open."""
        self._meta["table_state"] = {
            t.name: t.current_snapshot_id() for t in self._tables}
        self._save_meta()

    def _heal_tables(self) -> None:
        """Roll every table back to the last COMPLETE commit sequence
        recorded in meta: a half-committed batch is treated as
        never-happened (the caller re-adds it), the only consistent
        interpretation of a crash between table commits.

        A meta WITHOUT any table_state record but WITH live snapshots
        is ambiguous — a torn very-first commit (roll back to empty),
        or a store written before consistency records existed (rolling
        back would silently DESTROY it). Refuse and make the operator
        choose: delete the store dir to rebuild, or adopt the current
        snapshots as consistent via `adopt_tables=True`."""
        recorded = self._meta.get("table_state")
        if recorded is None:
            live = [t.name for t in self._tables
                    if t.current_snapshot_id() is not None]
            if not live:
                return
            if self._adopt_tables:
                self._record_table_state()
                return
            raise RuntimeError(
                f"store {self.root} has snapshots for {live} but meta "
                "records no completed commit sequence — either a crash "
                "during the very first commit (delete the store dir "
                "and rebuild) or a store predating consistency records "
                "(reopen once with adopt_tables=True to accept the "
                "current snapshots as consistent)")
        for t in self._tables:
            want, have = recorded.get(t.name), t.current_snapshot_id()
            if have != want:
                t.rollback(want)

    def _consistent_commit(self, fn) -> None:
        """Run a multi-table commit sequence; on ANY failure, heal the
        tables back to the last recorded state before re-raising — so
        a caller that keeps using the SAME store object after a failed
        commit (e.g. a restarted streaming query holding the store in a
        closure) never re-appends on top of a half-committed batch.
        `fn` must end by updating meta and calling
        _record_table_state()."""
        try:
            fn()
        except BaseException:
            # discard in-memory meta mutations from the failed
            # sequence too — the on-disk meta is the last consistent
            # record
            if os.path.exists(self._meta_path):
                with open(self._meta_path) as f:
                    self._meta = json.load(f)
            self._heal_tables()
            raise

    # -- id pinning -------------------------------------------------------------

    def _pin_id_type(self, df: DataFrame, id_col: str) -> str:
        idt = df.schema[id_col].dataType.simpleString()
        if self._meta["id_type"] is None:
            self._meta["id_type"] = idt
            self._save_meta()
        elif self._meta["id_type"] != idt:
            raise ValueError(
                f"id column type {idt} does not match the store's "
                f"pinned id type {self._meta['id_type']}")
        return idt

    def _id_type(self) -> str:
        # placeholder for a store no write has pinned yet: there are no
        # rows, so the type only has to parse (reads on a fresh store
        # return a typed empty frame instead of crashing on 'None')
        return self._meta["id_type"] or "string"

    # -- cache / lineage bookkeeping ---------------------------------------------

    def _cache(self, df: DataFrame) -> DataFrame:
        df = df.cache()
        self._cached.append(df)
        return df

    def _truncate(self, df: DataFrame) -> DataFrame:
        """Materialize a TINY evidence table and cut its lineage (the
        connected_components device). Reliable `spark.checkpoint()`
        when checkpoint_dir is set (cluster-durable); localCheckpoint
        otherwise (executor-memory-resident, the single-node
        default)."""
        if self.checkpoint_dir is not None:
            df.sparkSession.sparkContext.setCheckpointDir(
                self.checkpoint_dir)
            out = df.checkpoint(eager=True)
        else:
            out = df.localCheckpoint(eager=True)
        self._pinned.append(out)
        return out

    def _release_batch_intermediates(self) -> None:
        """Unpersist the PREVIOUS batch's plain caches (they recompute
        from the caller's inputs if ever referenced again) but keep the
        truncated evidence checkpoints pinned: their lineage is cut, so
        unpersisting them would break DataFrames returned to the
        caller. Checkpoints are evidence-sized, so the pinned set grows
        with evidence, not with corpus — close() releases those too."""
        for df in self._cached:
            try:
                df.unpersist()
            except Exception:
                pass
        self._cached = []

    def close(self) -> None:
        """Unpersist every intermediate this store cached or
        checkpointed. DataFrames returned by earlier batch calls may
        recompute or become invalid afterwards."""
        self._release_batch_intermediates()
        for df in self._pinned:
            try:
                df.unpersist()
            except Exception:
                pass
        self._pinned = []

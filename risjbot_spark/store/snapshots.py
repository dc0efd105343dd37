"""Snapshot tables: parquet data files + JSON manifests, Iceberg semantics.

The production target is Iceberg (`MERGE INTO seen ...`, snapshot expiry,
metadata-level min/max pruning — SURVEY.md §2.1 S10, §2.3 J2). This
container ships no Iceberg runtime jar, so this module provides the same
*contract* over plain parquet:

  * commit(df, lineage) → immutable snapshot (data files never rewritten)
  * every snapshot carries parent pointer + per-partition lineage metrics
    (north_rule: frontier-in / fetched / deduped / extracted counts)
  * read(snapshot_id) → any historical snapshot (time travel / resume)
  * atomic CURRENT pointer swap (os.replace) = the Iceberg catalog swap

The crawl's whole persistent state lives in these tables (replacing the
reference's single sqlite file synced to S3,
/root/reference/RISJbot/spmiddlewares/refetchcontrol.py:90-122 +
extensions/dotscrapy.py:10-55), so a crawl resumes mid-run from any
snapshot on any cluster.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _has_parquet_files(path: str) -> bool:
    for _dir, _sub, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


class SnapshotTable:
    def __init__(self, spark, root: str, name: str):
        self.spark = spark
        self.name = name
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)

    # -- catalog ----------------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.dir, "CURRENT")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.dir, f"snap-{sid}.manifest.json")

    def manifest(self, sid: int | None = None) -> dict | None:
        explicit = sid is not None
        sid = sid if sid is not None else self.current_snapshot_id()
        if sid is None:
            return None
        try:
            with open(self._manifest_path(sid)) as f:
                return json.load(f)
        except FileNotFoundError:
            if explicit:   # unknown or expired id the caller asked for
                raise ValueError(
                    f"no snapshot {sid} in {self.name}") from None
            raise       # CURRENT points at a missing manifest: corrupt

    def snapshots(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.startswith("snap-") and fn.endswith(".manifest.json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["id"])

    # -- write path ---------------------------------------------------------
    def commit(self, df, lineage: dict | None = None, mode: str = "replace",
               partition_by: list[str] | None = None,
               stats: dict | None = None,
               bucket_by: str | None = None,
               n_buckets: int = 32,
               lineage_fn=None) -> int:
        """Write df as a new immutable snapshot and swap CURRENT.

        mode='replace': snapshot contents = df (the seen-table MERGE result).
        mode='append' : snapshot = parent's files + df's new files (articles
        log) — parquet files are immutable, only the manifest grows, exactly
        Iceberg's append commit.

        partition_by: hive-layout the data dir by these columns (the
        compacted seen base partitions by last-fetch day so time-bounded
        reads prune day directories). stats: column min/max ranges the
        CALLER asserts for this commit's new files (e.g.
        {"last_fetch_range": [iso, iso]} — a round delta's last_fetch is
        the round timestamp on every row) — Iceberg's manifest column
        stats, enabling whole-file skips without opening footers. Both
        are recorded per data dir in the manifest's file_meta.

        bucket_by: ALSO hash-bucket the data files by this column — the
        Iceberg `bucket(N, col)` transform. The snapshot is written as an
        EXTERNAL datasource table (unique catalog name, data under this
        table's own dir), so later equi-joins/aggregations on the bucket
        column read it exchange-free via read_dir(); composes with
        partition_by (day dirs × url_hash buckets). The manifest records
        the table name + DDL schema, and read_dir() re-registers it in a
        fresh session's (in-memory) catalog — the data outlives any one
        SparkSession."""
        parent = self.current_snapshot_id()
        # sid from the MAX existing id, not parent+1: after rollback(),
        # parent+1 would reuse a live id and silently overwrite that
        # snapshot's manifest (orphaning its data; breaking lineage).
        # Ids come from the FILENAMES: parsing every manifest's JSON just
        # for max(id) made cumulative commit cost O(N²) in manifest
        # bytes on the driver's per-round critical path.
        existing = [
            int(fn[len("snap-"):-len(".manifest.json")])
            for fn in os.listdir(self.dir)
            if fn.startswith("snap-") and fn.endswith(".manifest.json")
        ]
        sid = max(existing, default=0) + 1
        data_dir = os.path.join(self.dir, f"snap-{sid}-{uuid.uuid4().hex[:8]}")
        bucket_entry = {}
        if bucket_by:
            # align write tasks to buckets (Murmur3 repartition == the
            # bucketBy hash) so each task writes exactly one bucket's
            # file per partition dir instead of n_buckets small files
            from pyspark.sql import functions as F

            tbl = f"snap_{self.name}_{sid}_{uuid.uuid4().hex[:8]}"
            (
                df.repartition(n_buckets, F.col(bucket_by))
                .write.mode("overwrite").format("parquet")
                .option("path", data_dir)
                .partitionBy(*(partition_by or []))
                .bucketBy(n_buckets, bucket_by).sortBy(bucket_by)
                .saveAsTable(tbl)
            )
            # schema DDL for re-registration in a later session's catalog
            # (partition columns last, as saveAsTable lays them out)
            pset = set(partition_by or [])
            fields = ([f for f in df.schema.fields if f.name not in pset]
                      + [f for f in df.schema.fields if f.name in pset])
            ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
            bucket_entry = {"bucket_table": tbl, "bucket_by": bucket_by,
                            "n_buckets": n_buckets, "schema_ddl": ddl}
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(data_dir)
            if partition_by and not _has_parquet_files(data_dir):
                # an EMPTY partitioned write leaves a dir with no data
                # files at all (no partition dirs → no parquet footers),
                # which a later read cannot infer a schema from; rewrite
                # flat — the zero-row part file still carries the schema.
                # Detected by a post-write directory scan, not an
                # isEmpty() pre-check, which would execute the
                # (compaction-sized) plan twice. (Bucketed commits don't
                # need this: the catalog entry carries the schema.)
                partition_by = None
                df.write.mode("overwrite").parquet(data_dir)
        # lineage_fn runs AFTER the data write but BEFORE the manifest
        # write: the write action has executed the plan, so Observation
        # metrics riding it are resolvable now — lineage counters land in
        # the committed manifest without any extra Spark job (the eager
        # count()/agg() pattern ran the round's plan subtrees twice).
        # Receives the fresh data dir so callers can also fold in
        # driver-side parquet-footer stats (per-file row counts).
        if lineage_fn is not None:
            lineage = {**(lineage or {}), **(lineage_fn(data_dir) or {})}
        files = [data_dir]
        file_meta = {}
        if mode == "append" and parent is not None:
            pman = self.manifest(parent)
            files = pman["files"] + files
            file_meta = dict(pman.get("file_meta", {}))
        entry = dict(bucket_entry)
        if partition_by:
            entry["partition_by"] = list(partition_by)
        if stats:
            entry.update(stats)
        if entry:
            file_meta[data_dir] = entry
        man = {
            "id": sid,
            "parent": parent,
            "table": self.name,
            "mode": mode,
            "committed_at": time.time(),
            "files": files,
            "file_meta": file_meta,
            "lineage": lineage or {},
        }
        tmp = self._manifest_path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(sid))
        cur_tmp = self._current_path() + ".tmp"
        with open(cur_tmp, "w") as f:
            f.write(str(sid))
        os.replace(cur_tmp, self._current_path())  # atomic catalog swap
        return sid

    # -- read path ----------------------------------------------------------
    def read_dir(self, data_dir: str, manifest: dict | None = None):
        """DataFrame over ONE manifest data dir. Flat/hive dirs read as
        parquet; bucketed dirs read through the session catalog so the
        bucket spec survives (exchange-free joins on the bucket column),
        re-registering the external table first when this session's
        (in-memory) catalog hasn't seen it — resume on a fresh cluster."""
        man = manifest or self.manifest()
        entry = (man or {}).get("file_meta", {}).get(data_dir, {})
        tbl = entry.get("bucket_table")
        if not tbl:
            return self.spark.read.parquet(data_dir)
        if not self.spark.catalog.tableExists(tbl):
            pby = entry.get("partition_by") or []
            ddl = (f"CREATE TABLE {tbl} ({entry['schema_ddl']}) "
                   f"USING parquet ")
            if pby:
                ddl += f"PARTITIONED BY ({', '.join(pby)}) "
            ddl += (f"CLUSTERED BY ({entry['bucket_by']}) "
                    f"SORTED BY ({entry['bucket_by']}) "
                    f"INTO {entry['n_buckets']} BUCKETS "
                    f"LOCATION '{data_dir}'")
            self.spark.sql(ddl)
            if pby:
                self.spark.sql(f"ALTER TABLE {tbl} RECOVER PARTITIONS")
        return self.spark.table(tbl)

    def read(self, snapshot_id: int | None = None, schema=None):
        """DataFrame view of a snapshot (default: CURRENT). Empty-typed DF
        when the table has no snapshot yet.

        A snapshot can mix hive-partitioned dirs (compacted base) and
        flat delta dirs; Spark refuses that in one multi-path read
        (CONFLICTING_DIRECTORY_STRUCTURES), so mixed snapshots read
        per-dir and union — partition columns come back null on flat
        rows (they are derivable data there, e.g. lf_day from
        last_fetch; resolved views project them away)."""
        man = self.manifest(snapshot_id)
        if man is None or not man["files"]:
            if schema is None:
                raise ValueError(f"table {self.name} is empty and no schema given")
            return self.spark.createDataFrame([], schema)
        meta = man.get("file_meta", {})
        if any(meta.get(d, {}).get("partition_by")
               or meta.get(d, {}).get("bucket_table") for d in man["files"]):
            from functools import reduce

            parts = [self.read_dir(d, man) for d in man["files"]]
            return reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                parts)
        return self.spark.read.parquet(*man["files"])

    def lineage_history(self) -> list[dict]:
        return [
            {"id": m["id"], "lineage": m["lineage"]} for m in self.snapshots()
        ]

    def rollback(self, snapshot_id: "int | None") -> None:
        """Point CURRENT at an earlier snapshot (Iceberg
        `rollback_to_snapshot`). Data files and manifests are immutable,
        so this is just the atomic catalog swap; later snapshots remain
        readable until expired. snapshot_id=None rolls back to the
        never-committed state (CURRENT marker removed) — the heal path
        for a crash during a table's very first commit sequence."""
        if snapshot_id is None:
            try:
                os.remove(self._current_path())
            except FileNotFoundError:
                pass
            return
        # manifest() raises ValueError for an unknown/expired explicit id
        self.manifest(snapshot_id)
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, self._current_path())

    # -- maintenance --------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 3) -> list[int]:
        """Iceberg `expire_snapshots` analogue (the reference's DB trim +
        VACUUM, refetchcontrol.py:180-193 → SURVEY.md §4): drop manifests
        older than the newest `keep_last` and delete data directories no
        live manifest references. Returns expired snapshot ids."""
        import shutil

        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return []
        # CURRENT is always live regardless of age: after rollback() the
        # live snapshot may be older than the newest keep_last, and
        # expiring it would destroy the table's state (Iceberg's expire
        # likewise never removes the current snapshot)
        cur = self.current_snapshot_id()
        live = [m for m in snaps[-keep_last:]] + [
            m for m in snaps[:-keep_last] if m["id"] == cur]
        dead = [m for m in snaps[:-keep_last] if m["id"] != cur]
        live_files = {f for m in live for f in m["files"]}
        expired = []
        for m in dead:
            for f in m["files"]:
                if f not in live_files and os.path.isdir(f):
                    tbl = m.get("file_meta", {}).get(f, {}).get("bucket_table")
                    if tbl:
                        # unregister before deleting the data: a stale
                        # catalog entry over a removed dir would fail
                        # later reads with a confusing path error
                        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                    shutil.rmtree(f, ignore_errors=True)
            os.remove(self._manifest_path(m["id"]))
            expired.append(m["id"])
        return expired

"""Partitioned cuckoo filter for URL-seen pre-filtering — the
north_star's literal ask ("partitioned cuckoo-filter URL-seen set"),
shipped alongside the bloom backends as `bloom_backend="cuckoo"`.

Why a cuckoo filter when the bloom family already works: DELETION.
A bloom filter cannot remove keys, so rows the trim rounds (J3b) delete
from the seen table linger in the filter as false-positive fodder until
the next full rebuild. A cuckoo filter (Fan, Andersen, Kaminsky,
Mitzenmacher, CoNEXT'14 — "Cuckoo Filter: Practically Better Than
Bloom") stores displaceable 16-bit fingerprints in a 4-way
set-associative table, so the engine can delete trimmed keys exactly
and the filter tracks the LIVE key set instead of an ever-growing
superset. Same correctness contract as the blooms: false positives
fall through to the authoritative seen join; false negatives are
impossible under the engine's insert/delete discipline (below).

Structure mirrors PartitionedBloom (frontier/bloom.py): one table per
url_hash bucket shard, probed either via a broadcast dict + pandas UDF
(`split`) or partition-aligned via cogroup (`split_aligned`), NPZ
checkpoint in the warehouse, adaptive 4× growth through the engine's
existing overfull()/rebuild protocol.

Correctness discipline (what makes deletion safe):
  * every live key is inserted EXACTLY once — the engine adds only
    first-fetch keys (previousfetches == 0); refetches are already in
    the filter. Duplicate fingerprints would otherwise both waste
    capacity and break delete-one semantics;
  * only keys that were inserted are ever deleted — trim removes rows
    that exist in the seen table, and each delete removes exactly one
    matching fingerprint copy. Deleting a never-inserted key could
    remove a colliding key's fingerprint and create a false negative —
    the one failure mode a seen-set pre-filter must never have;
  * a full table is never allowed to DROP a key: inserts that lose the
    eviction fight land in a driver-side stash (membership-checked with
    the table), and a non-empty stash reports overfull() so the engine
    rebuilds 4× larger from the seen snapshot — the same grow protocol
    as the blooms.

Geometry: 16-bit fingerprints × 4 lanes; slots_per_bucket is a power
of two (default 2^13 → 32,768 entries/shard, ~1.7M keys at the 0.84
target load over 64 shards — the same footprint class as the default
bloom). Partial-key cuckoo hashing: i2 = i1 XOR H(fp), so either
candidate row is derivable from the other plus the stored fingerprint.

Sizing guidance (when to pick cuckoo vs the blooms): the table-bloom
backend is the 10^10-frontier default — the auto-selector never picks
cuckoo; it is opt-in via bloom_backend="cuckoo". Choose cuckoo for
TRIM-HEAVY workloads where deletion precision pays: long-running crawls
whose trim rounds remove a meaningful share of the seen table between
full rebuilds (with a bloom, every trimmed key lingers as a false
positive until the next rebuild's full seen scan). Inserts above
2M keys/round promote to a shard-parallel distributed delta build
(add_df driver_threshold), so first-fetch-heavy rounds stay off the
driver; deletes are exact and driver-side (trim deltas are small by
construction — trim_every bounds them). If rounds are dominated by
NEW-key discovery rather than trims, prefer the table bloom: its
per-round cost is one bucketed merge with no eviction chains.

Reference parity note: the reference keeps its seen set in sqlite
(spmiddlewares/refetchcontrol.py) — no filter exists there to copy;
this file implements the public cuckoo-filter construction on Spark
primitives.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ASSOC = 4          # lanes per slot row
_MAX_KICKS = 500    # eviction chain bound before stashing
_LOAD_TARGET = 0.84  # occupancy at which overfull() trips


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high hash bits (the shard id
    uses the low bits via pmod, the row index the middle bits — reusing
    bit ranges across the three is fine as long as each is fixed)."""
    fp = ((h.astype(np.uint64) >> np.uint64(48))
          & np.uint64(0xFFFF)).astype(np.uint16)
    fp = fp + (fp == 0).astype(np.uint16)   # 0 is the empty-lane sentinel
    return fp


def _row1(h: np.ndarray, slots: int) -> np.ndarray:
    return ((h.astype(np.uint64) >> np.uint64(16))
            & np.uint64(slots - 1)).astype(np.int64)


def _fp_hash(fp: np.ndarray, slots: int) -> np.ndarray:
    """Partial-key displacement hash H(fp) — Knuth multiplicative."""
    return ((fp.astype(np.uint64) * np.uint64(0x9E3779B1))
            & np.uint64(slots - 1)).astype(np.int64)


def _contains(table: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized membership for one shard table (slots, ASSOC)."""
    slots = table.shape[0]
    fp = _fingerprints(h)
    i1 = _row1(h, slots)
    i2 = i1 ^ _fp_hash(fp, slots)
    hit = (table[i1] == fp[:, None]).any(axis=1)
    hit |= (table[i2] == fp[:, None]).any(axis=1)
    return hit


def _insert_shard(table: np.ndarray, pdf: pd.DataFrame, bucket: int,
                  slots: int) -> pd.DataFrame:
    """Executor-side shard build step shared by from_seen (fresh table)
    and add_df's distributed delta path (copy of the live table):
    insert every key of one bucket's pandas group into `table`,
    stashing eviction-chain losers, and return the one-row
    (bucket, table-bytes, stash-json, n) result frame."""
    import json as _json

    h = pdf["url_hash"].to_numpy()
    fps = _fingerprints(h)
    i1s = _row1(h, slots)
    shard = PartitionedCuckoo(1, slots)    # reuse the rollback insert
    stash: dict = {}
    for j in range(len(h)):
        if not shard._insert_one_safe(table, int(fps[j]), int(i1s[j])):
            stash[int(h[j])] = stash.get(int(h[j]), 0) + 1
    return pd.DataFrame({
        "bucket": [bucket],
        "table": [table.tobytes()],
        "stash": [_json.dumps(stash)],
        "n": [len(h)],
    })


def _probe_tables(tables: dict, stash: dict, h: np.ndarray,
                  n_buckets: int) -> np.ndarray:
    """Vectorized membership across shards + stash — the ONE probe body
    behind _member_vec, split's pandas UDF and split_aligned (a probe
    fix must not have three drift-prone copies)."""
    out = np.zeros(len(h), dtype=bool)
    buckets = np.mod(h, n_buckets)
    for b in np.unique(buckets):
        table = tables.get(int(b))
        if table is None:
            continue
        idx = np.nonzero(buckets == b)[0]
        out[idx] = _contains(table, h[idx])
    if stash:
        out |= np.isin(h, np.fromiter(stash.keys(), dtype=np.int64))
    return out


class PartitionedCuckoo:
    def __init__(self, n_buckets: int = 64, slots_per_bucket: int = 1 << 13):
        assert slots_per_bucket & (slots_per_bucket - 1) == 0, "power of two"
        self.n_buckets = n_buckets
        self.slots = slots_per_bucket
        self.tables: dict[int, np.ndarray] = {}
        # stash: url_hash → count, for inserts that lost the eviction
        # fight (overfull signal; membership includes it)
        self.stash: dict[int, int] = {}
        self.n_keys = 0            # live keys (deletes decrement)
        self._bc = None

    # -- shared plumbing (same shape as PartitionedBloom) ---------------
    def _broadcast(self, spark):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(
                (self.tables, dict(self.stash)))
        return self._bc

    def _invalidate_broadcast(self) -> None:
        if self._bc is not None:
            try:
                self._bc.unpersist()
            except Exception:
                pass
            self._bc = None

    @property
    def m(self) -> int:
        """Bit-size analogue for the engine's broadcast-budget math:
        bytes per shard table × 8 (uint16 lanes)."""
        return self.slots * _ASSOC * 16

    def overfull(self) -> bool:
        """Grow when any insert stashed, or live keys cross the target
        load — past ~0.95 occupancy eviction chains start failing en
        masse; 0.84 leaves headroom for shard imbalance."""
        cap = self.n_buckets * self.slots * _ASSOC
        return bool(self.stash) or self.n_keys > int(cap * _LOAD_TARGET)

    # -- build / update --------------------------------------------------
    def _shard(self, b: int) -> np.ndarray:
        t = self.tables.get(b)
        if t is None:
            t = np.zeros((self.slots, _ASSOC), dtype=np.uint16)
            self.tables[b] = t
        return t

    def add_local(self, hashes: np.ndarray) -> None:
        """Insert keys already on the driver. Caller contract: each key
        is NEW to the filter (the engine feeds previousfetches == 0
        keys only) — re-adding a live key would store a duplicate
        fingerprint and break delete-one semantics."""
        self._invalidate_broadcast()
        h = np.asarray(hashes, dtype=np.int64)
        if len(h) == 0:
            return
        buckets = np.mod(h, self.n_buckets)
        for b in np.unique(buckets):
            sel = h[buckets == b]
            table = self._shard(int(b))
            fps = _fingerprints(sel)
            i1s = _row1(sel, self.slots)
            for j in range(len(sel)):
                if not self._insert_one_safe(table, int(fps[j]),
                                             int(i1s[j])):
                    self.stash[int(sel[j])] = \
                        self.stash.get(int(sel[j]), 0) + 1
        self.n_keys += len(h)

    def _insert_one_safe(self, table: np.ndarray, fp: int,
                         i1: int) -> bool:
        """Insert with rollback: a failed eviction chain restores every
        displaced fingerprint, so failure leaves the table EXACTLY as
        before and the caller can stash the new key without any other
        key losing membership."""
        slots = self.slots

        def alt(i: int, f: int) -> int:
            return i ^ int(_fp_hash(np.array([f], dtype=np.uint16),
                                    slots)[0])

        i2 = alt(i1, fp)
        for idx in (i1, i2):
            row = table[idx]
            for lane in range(_ASSOC):
                if row[lane] == 0:
                    row[lane] = fp
                    return True
        trail: list[tuple[int, int, int]] = []   # (idx, lane, old_fp)
        idx, cur = i1, fp
        for kick in range(_MAX_KICKS):
            lane = kick % _ASSOC
            old = int(table[idx][lane])
            table[idx][lane] = cur
            trail.append((idx, lane, cur))
            cur = old
            idx = alt(idx, cur)
            row = table[idx]
            for ln in range(_ASSOC):
                if row[ln] == 0:
                    row[ln] = cur
                    return True
        # chain failed: roll back so membership is exactly as before —
        # each trail entry (idx, lane, placed) gets back the fingerprint
        # the NEXT displacement carried away; the homeless `cur` is the
        # last victim, which re-lands in the final trail slot
        prev = cur
        for idx2, lane2, _placed in reversed(trail):
            nxt = int(table[idx2][lane2])
            table[idx2][lane2] = prev
            prev = nxt
        # prev is now the new key's fp — never placed; caller stashes
        return False

    def delete_local(self, hashes: np.ndarray) -> int:
        """Remove one fingerprint copy per key. Only keys that were
        inserted may be deleted (trim deletes rows that exist in the
        seen table) — deleting a never-inserted key could strip a
        colliding key's fingerprint and manufacture a false negative.
        Returns the number of keys actually removed.

        fp/i1/i2 are batch-vectorized like add_local; only the
        lane-clear itself is a Python step (it mutates one cell, and
        two deletes may target the same row)."""
        self._invalidate_broadcast()
        h = np.asarray(hashes, dtype=np.int64)
        removed = 0
        buckets = np.mod(h, self.n_buckets)
        fps = _fingerprints(h)
        i1s = _row1(h, self.slots)
        i2s = i1s ^ _fp_hash(fps, self.slots)
        for j in range(len(h)):
            key = int(h[j])
            if key in self.stash:
                if self.stash[key] <= 1:
                    del self.stash[key]
                else:
                    self.stash[key] -= 1
                removed += 1
                continue
            table = self.tables.get(int(buckets[j]))
            if table is None:
                continue
            fp = int(fps[j])
            done = False
            for idx in (int(i1s[j]), int(i2s[j])):
                row = table[idx]
                for lane in range(_ASSOC):
                    if row[lane] == fp:
                        row[lane] = 0
                        removed += 1
                        done = True
                        break
                if done:
                    break
        self.n_keys = max(0, self.n_keys - removed)
        return removed

    def add_df(self, keys: DataFrame, driver_threshold: int = 0) -> None:
        """Insert url_hash keys from a DataFrame. Inserts are sequential
        per shard (eviction chains mutate state), so small deltas are
        pulled to the driver and inserted locally — per-round NEW-key
        deltas are usually small relative to the table (the blooms'
        driver_threshold rationale).

        Above `driver_threshold` keys (when set > 0) the insert promotes
        to a distributed shard-delta build, mirroring
        PartitionedBloom.add_df's promotion: the current shard tables
        broadcast to the executors (64 shards × slots×4×2 B — ~4 MB at
        the default geometry), one applyInPandas task per shard inserts
        that shard's delta into a copy of its table, and the updated
        (table, stash-delta) rows return to the driver. A 50M-URL
        first-fetch round therefore never materializes its key set in
        driver memory or runs a 50M-iteration driver loop."""
        keys = keys.select("url_hash")
        if driver_threshold and driver_threshold > 0:
            # single-evaluation sizing (PartitionedBloom.add_df's
            # idiom): pull at most threshold+1 rows — the overflow row
            # detects "too big" without a separate count() pass, and
            # under the threshold the pull IS the delta to insert.
            # toArrow, not toPandas: the pickle collect path peaks at
            # ~400 B/row of driver RSS (measured 680 MB for a 2M-long
            # sizing pull); the Arrow batch transfer is ~8 B/row
            arr = (keys.limit(driver_threshold + 1).toArrow()
                   .column("url_hash").to_numpy())
            if len(arr) > driver_threshold:
                self._add_df_distributed(keys)
                return
        else:
            arr = keys.toArrow().column("url_hash").to_numpy()
        self.add_local(arr)

    def _add_df_distributed(self, keys: DataFrame) -> None:
        self._invalidate_broadcast()
        spark = keys.sparkSession
        slots = self.slots
        nb = self.n_buckets
        tables_b = spark.sparkContext.broadcast(
            {b: t.tobytes() for b, t in self.tables.items()})

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            raw = tables_b.value.get(b)
            table = (np.frombuffer(raw, dtype=np.uint16)
                     .reshape(slots, _ASSOC).copy()
                     if raw is not None
                     else np.zeros((slots, _ASSOC), dtype=np.uint16))
            return _insert_shard(table, pdf, b, slots)

        rows = (
            keys.select(F.col("url_hash"),
                        F.pmod(F.col("url_hash"),
                               F.lit(nb)).alias("bucket"))
            .groupBy("bucket")
            .applyInPandas(
                build, schema="bucket int, table binary, stash string, n long")
            .collect()
        )
        self._absorb_shard_rows(rows)
        tables_b.unpersist()

    def delete_df(self, keys: DataFrame) -> int:
        arr = (keys.select("url_hash").toArrow()
               .column("url_hash").to_numpy())
        return self.delete_local(arr)

    # -- probe ------------------------------------------------------------
    def _member_vec(self, maps, stash, h: np.ndarray) -> np.ndarray:
        return _probe_tables(maps, stash, h, self.n_buckets)

    def split(self, frontier: DataFrame, spark) -> tuple[DataFrame, DataFrame]:
        """→ (maybe_seen, definite_new); empty filter ⇒ everything new.
        Same contract as PartitionedBloom.split."""
        if not self.tables and not self.stash:
            return frontier.limit(0), frontier
        nb = self.n_buckets
        bc = self._broadcast(spark)

        @F.pandas_udf(T.BooleanType())
        def maybe_seen(url_hash: pd.Series) -> pd.Series:
            maps, stash = bc.value
            return pd.Series(
                _probe_tables(maps, stash, url_hash.to_numpy(), nb))

        flagged = frontier.withColumn("_maybe", maybe_seen(F.col("url_hash")))
        return (flagged.filter(F.col("_maybe")).drop("_maybe"),
                flagged.filter(~F.col("_maybe")).drop("_maybe"))

    def split_aligned(self, frontier: DataFrame, spark
                      ) -> tuple[DataFrame, DataFrame]:
        """Partition-aligned probe: each shard table ships once to the
        task probing that shard's frontier rows (cogroup on
        url_hash % n_buckets), same as the bloom variant. The stash is
        tiny by construction (overfull() trips on its first entry) and
        rides the closure."""
        if not self.tables and not self.stash:
            return frontier.limit(0), frontier
        nb, slots = self.n_buckets, self.slots
        stash_keys = np.fromiter(self.stash.keys(), dtype=np.int64) \
            if self.stash else np.empty(0, dtype=np.int64)
        tb_df = spark.createDataFrame(
            [(int(b), t.tobytes()) for b, t in self.tables.items()],
            "bucket int, table binary")
        fr = frontier.withColumn(
            "_b", F.pmod(F.col("url_hash"), F.lit(nb)).cast("int"))
        out_schema = T.StructType(
            fr.schema.fields + [T.StructField("_maybe", T.BooleanType())])

        def probe(key, left, right):
            left = left.copy()
            if len(left) == 0:
                left["_maybe"] = pd.Series([], dtype=bool)
                return left
            h = left["url_hash"].to_numpy()
            if len(right) == 0:
                hit = np.zeros(len(h), dtype=bool)
            else:
                table = np.frombuffer(
                    right["table"].iloc[0], dtype=np.uint16
                ).reshape(slots, _ASSOC)
                hit = _contains(table, h)
            if len(stash_keys):
                hit = hit | np.isin(h, stash_keys)
            left["_maybe"] = hit
            return left

        flagged = (
            fr.groupBy("_b")
            .cogroup(tb_df.groupBy("bucket"))
            .applyInPandas(probe, schema=out_schema)
        )
        return (flagged.filter(F.col("_maybe")).drop("_maybe", "_b"),
                flagged.filter(~F.col("_maybe")).drop("_maybe", "_b"))

    # -- checkpoint ---------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, "cuckoo.tmp.npz")
        stash_arr = np.array(
            [[k, v] for k, v in self.stash.items()], dtype=np.int64
        ).reshape(-1, 2)
        np.savez(
            tmp,
            meta=np.array([self.n_buckets, self.slots, self.n_keys],
                          dtype=np.int64),
            stash=stash_arr,
            **{f"t{k}": v for k, v in self.tables.items()},
        )
        os.replace(tmp, os.path.join(path, "cuckoo.npz"))

    @classmethod
    def load(cls, path: str) -> "PartitionedCuckoo | None":
        f = os.path.join(path, "cuckoo.npz")
        if not os.path.exists(f):
            return None
        with np.load(f) as z:
            meta = [int(x) for x in z["meta"]]
            self = cls(meta[0], meta[1])
            self.n_keys = meta[2]
            for row in z["stash"]:
                self.stash[int(row[0])] = int(row[1])
            for k in z.files:
                if k.startswith("t"):
                    self.tables[int(k[1:])] = z[k].copy()
        return self

    def _absorb_shard_rows(self, rows) -> None:
        """Replace shard tables / merge stash deltas / bump n_keys from
        a collected list of (bucket, table, stash, n) build rows."""
        import json as _json

        slots = self.slots
        for r in rows:
            self.tables[r["bucket"]] = np.frombuffer(
                r["table"], dtype=np.uint16).reshape(slots, _ASSOC).copy()
            for k, v in _json.loads(r["stash"]).items():
                self.stash[int(k)] = self.stash.get(int(k), 0) + v
            self.n_keys += r["n"]

    @classmethod
    def from_seen(cls, seen: DataFrame, n_buckets: int = 64,
                  slots_per_bucket: int = 1 << 13) -> "PartitionedCuckoo":
        """Bulk build: one task per shard inserts that shard's keys into
        a fresh table (insertion is sequential per shard but shards
        build in parallel); tiny (bucket, table, stash) rows return to
        the driver. One full seen scan, same as the bloom rebuild."""
        self = cls(n_buckets, slots_per_bucket)
        slots = slots_per_bucket

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            table = np.zeros((slots, _ASSOC), dtype=np.uint16)
            return _insert_shard(table, pdf, int(pdf["bucket"].iloc[0]),
                                 slots)

        rows = (
            seen.select(F.col("url_hash"),
                        F.pmod(F.col("url_hash"),
                               F.lit(n_buckets)).alias("bucket"))
            .groupBy("bucket")
            .applyInPandas(
                build, schema="bucket int, table binary, stash string, n long")
            .collect()
        )
        self._absorb_shard_rows(rows)
        return self

"""Partitioned bloom filter for the URL-seen pre-filter (north_star).

At a 10^10-URL frontier, shuffling every candidate URL into the seen-set
join is the dominant cost; most candidates are brand new. The filter is
built per url_hash bucket from the seen table (one numpy bitmap per
bucket, built distributedly with applyInPandas), broadcast, and probed
with a vectorized UDF. Definite-new URLs skip the seen join entirely;
possible-seen URLs fall through to the authoritative left-outer join —
false positives cost a join row, never correctness
(SURVEY.md §7 "cuckoo filter at 10^10 scale").

Sizing: bits_per_key≈10, k=7 → ~1% FP. At 10^10 keys that is ~12.5 GB of
bitmap split across buckets; per-executor memory holds only the buckets
it probes when the probe side is partitioned the same way (at this
sandbox's scale we broadcast the whole dict). Filters serialize into the
checkpoint and rebuild from the seen snapshot on resume."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K = 7  # hash probes


def _bitmap_size(n_keys: int, bits_per_key: int = 10) -> int:
    bits = max(1024, n_keys * bits_per_key)
    return 1 << int(np.ceil(np.log2(bits)))  # power of two → mask, no mod


def _positions(hashes: np.ndarray, m: int) -> np.ndarray:
    """Double hashing: k positions per 64-bit key, vectorized. → (k, n)."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = ((h >> np.uint64(32)) | np.uint64(1))
    ks = np.arange(_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) & np.uint64(m - 1)).astype(np.int64)


def build_bloom(seen: DataFrame, n_buckets: int = 64,
                bits_per_key: int = 10) -> dict[int, bytes]:
    """seen(url_hash) → {bucket: bitmap bytes}. Distributed build: one
    applyInPandas group per bucket, tiny result rows to the driver."""
    n = seen.count()
    if n == 0:
        return {}
    m = _bitmap_size(max(1, n // n_buckets) + 1, bits_per_key)

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash"].to_numpy(), m).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "bitmap": [bits.tobytes()]})

    rows = (
        seen.select(F.col("url_hash"),
                    F.pmod(F.col("url_hash"), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .applyInPandas(make, schema="bucket int, bitmap binary")
        .collect()
    )
    return {r["bucket"]: r["bitmap"] for r in rows}


def split_by_bloom(frontier: DataFrame, bloom: dict[int, bytes],
                   n_buckets: int, spark) -> tuple[DataFrame, DataFrame]:
    """→ (maybe_seen, definite_new). Empty filter ⇒ everything is new."""
    if not bloom:
        return frontier.limit(0), frontier

    bc = spark.sparkContext.broadcast(
        {b: np.frombuffer(bm, dtype=np.uint8) for b, bm in bloom.items()}
    )

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        maps = bc.value
        h = url_hash.to_numpy()
        buckets = np.mod(h, n_buckets)  # match F.pmod semantics for int64
        out = np.zeros(len(h), dtype=bool)
        for b in np.unique(buckets):
            bits = maps.get(int(b))
            idx = np.nonzero(buckets == b)[0]
            if bits is None:
                continue
            m = len(bits) * 8
            pos = _positions(h[idx], m)
            hit = np.ones(len(idx), dtype=bool)
            for kk in range(_K):
                p = pos[kk]
                hit &= (bits[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
            out[idx] = hit
        return pd.Series(out)

    flagged = frontier.withColumn("_maybe_seen", maybe_seen(F.col("url_hash")))
    return (
        flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen"),
        flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen"),
    )

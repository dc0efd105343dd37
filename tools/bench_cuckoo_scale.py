"""Scale evidence for the cuckoo seen-backend's distributed delta path
(r4 advice item: add_df used to pull every key to the driver; it now
promotes to a shard-parallel build above driver_threshold).

What this measures, all on local[32]:
  1. bulk build (`from_seen`) of a 2M-key base — one task per shard;
  2. `add_df` of a 4M-key first-fetch delta with driver_threshold=2M,
     i.e. the PROMOTED distributed path: the driver never materializes
     the delta (it pulls at most threshold+1 sizing rows), shard tables
     broadcast once (~17 MB at this geometry), one applyInPandas task
     per shard inserts its slice, and 64 tiny (table, stash) rows come
     back;
  3. membership of a 20k sample of the added keys (must be 100% — the
     filter can false-positive, never false-negative);
  4. exact deletion of a 20k trim slice and the post-delete FP rate
     over the deleted keys (bounded by colliding live fingerprints);
  5. driver RSS before/after — the delta itself must not land on the
     driver (the resident tables, ~17 MB, do by design: the broadcast
     probe path serves them).

Geometry: 64 shards x 2^15 slots x 4 lanes = 8.39M entries; 6M keys =
0.715 load, under the 0.84 overfull target.

Run: python tools/bench_cuckoo_scale.py [n_base] [n_delta] [out.json]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else os.path.join(REPO, "BENCH", "cuckoo_scale.json"))
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.frontier.cuckoo import PartitionedCuckoo

    # distinct url_hash keys, generated distributed (xxhash64 over
    # disjoint id ranges is collision-free in practice at 6M draws;
    # base and delta ranges are disjoint by construction)
    base_keys = spark.range(n_base).select(
        F.xxhash64("id").alias("url_hash"))
    delta_keys = spark.range(n_base, n_base + n_delta).select(
        F.xxhash64("id").alias("url_hash"))

    rss0 = _rss_mb()
    t0 = time.monotonic()
    filt = PartitionedCuckoo.from_seen(base_keys, n_buckets=64,
                                       slots_per_bucket=1 << 15)
    t_build = time.monotonic() - t0
    n_after_base = filt.n_keys

    t0 = time.monotonic()
    filt.add_df(delta_keys, driver_threshold=2_000_000)
    t_add = time.monotonic() - t0
    rss1 = _rss_mb()
    n_after_add = filt.n_keys

    # membership: every added key must probe true
    sample = np.array([r["url_hash"] for r in
                       delta_keys.limit(20_000).collect()])
    member = filt._member_vec(filt.tables, filt.stash, sample)
    # trim: exact deletion of the sampled slice, then FP rate over it
    t0 = time.monotonic()
    removed = filt.delete_local(sample)
    t_del = time.monotonic() - t0
    after = filt._member_vec(filt.tables, filt.stash, sample)

    result = {
        "metric": "cuckoo_distributed_add_keys_per_sec",
        "value": round(n_delta / t_add, 1),
        "unit": "keys/sec",
        "n_base": n_base,
        "n_delta": n_delta,
        "build_secs": round(t_build, 1),
        "add_df_secs": round(t_add, 1),
        "delete_20k_secs": round(t_del, 3),
        "n_keys_after_base": n_after_base,
        "n_keys_after_add": n_after_add,
        "n_keys_after_delete": filt.n_keys,
        "load": round(n_after_add / (64 * (1 << 15) * 4), 3),
        "stash_size": len(filt.stash),
        "overfull": filt.overfull(),
        "added_membership_frac": round(float(member.mean()), 6),
        "deleted_exactly": int(removed),
        "post_delete_fp_rate": round(float(after.mean()), 6),
        "driver_rss_mb_before": round(rss0, 1),
        "driver_rss_mb_after": round(rss1, 1),
        "ts": datetime.now(timezone.utc).isoformat(),
        "config": "local[32], 64 shards x 2^15 slots x 4 lanes, "
                  "driver_threshold=2M",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

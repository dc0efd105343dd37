"""Evidence for the table-backed bloom at frontier scale (r2 verdict
item #1 'done' criterion): a 10^8-key filter builds, checkpoints,
probes, and grows WITHOUT any bitmap collect() — and without driver
memory growing with the filter.

The driver backend would hold the full bitmap set in a Python dict
(~125 MiB at 10^8 keys / 10 bits/key, ~12 GiB at the 10^10 north_star);
DistributedBloomTable keeps it as a bucket-keyed parquet table. This
script builds one at n_keys (default 10^8), reports build / incremental
add / probe timings, verifies probe completeness on a sample, grows it
4x, and prints driver-RSS before/after — the delta stays flat because
only (n_buckets, m, n_keys, version) live on the driver.

Run: python tools/bench_bloom_scale.py [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def rss_mb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.frontier.bloom_table import DistributedBloomTable

    # size for ~10 bits/key at n_keys: n_buckets * m >= 10 * n_keys
    n_buckets = 256
    m = 1 << 22                       # 256 x 4 Mib = 2^30 bits ≈ 10.7 b/key
    while n_buckets * m < 10 * n_keys:
        m *= 4
    out = {"n_keys": n_keys, "n_buckets": n_buckets, "bits_per_bucket": m,
           "filter_mib": round(n_buckets * m / 8 / 2**20, 1)}

    path = tempfile.mkdtemp(prefix="bloom_scale_")
    bt = DistributedBloomTable(spark, path, n_buckets, m)
    keys = spark.range(n_keys).select(F.xxhash64("id").alias("url_hash"))

    out["rss_mb_before_build"] = rss_mb()
    t0 = time.monotonic()
    bt.add_df(keys)
    out["build_secs"] = round(time.monotonic() - t0, 1)
    out["rss_mb_after_build"] = rss_mb()
    assert bt.n_keys == n_keys and bt.version == 1

    # incremental round: 1M new keys OR-merged in
    delta = spark.range(n_keys, n_keys + 1_000_000).select(
        F.xxhash64("id").alias("url_hash"))
    t0 = time.monotonic()
    bt.add_df(delta)
    out["incremental_add_1m_secs"] = round(time.monotonic() - t0, 1)

    # probe: 1M members + 1M non-members, partition-aligned cogroup
    members = spark.range(0, 1_000_000).select(
        F.xxhash64("id").alias("url_hash"))
    fresh = spark.range(10 * n_keys, 10 * n_keys + 1_000_000).select(
        F.xxhash64("id").alias("url_hash"))
    probe = members.unionByName(fresh)
    t0 = time.monotonic()
    maybe, new = bt.split_aligned(probe)
    n_maybe, n_new = maybe.count(), new.count()
    out["probe_2m_secs"] = round(time.monotonic() - t0, 1)
    out["probe_maybe"] = n_maybe
    out["probe_definite_new"] = n_new
    # completeness: every member must probe maybe-seen (no false
    # negatives); false positives land in probe_maybe - 1M members
    member_misses = members.join(new, "url_hash", "left_semi").count()
    assert member_misses == 0, f"{member_misses} false negatives!"
    out["false_negative"] = 0
    out["fp_rate_est"] = round((n_maybe - 1_000_000) / 1_000_000, 4)

    # adaptive growth: rebuild 4x larger from the key set — still no
    # bitmap bytes on the driver
    t0 = time.monotonic()
    bt.rebuild_from(keys, bits_per_bucket=m * 4)
    out["grow_4x_secs"] = round(time.monotonic() - t0, 1)
    out["rss_mb_after_grow"] = rss_mb()
    out["driver_rss_delta_mb"] = (
        out["rss_mb_after_grow"] - out["rss_mb_before_build"])

    # checkpoint size on disk + reload
    total = 0
    for root, _d, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    out["checkpoint_mib"] = round(total / 2**20, 1)
    re = DistributedBloomTable.load(spark, path)
    assert re is not None and re.n_keys == n_keys and re.m == m * 4
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Bloom fold cadence under sustained MoR rounds at ~10^8 seen keys —
the second half of the r3 verdict's scale-path item: a long-running
crawl against a 10^8-key table-backed filter keeps paying O(round) per
round, with the occasional dense fold amortized.

Protocol: build the 10^8-key DistributedBloomTable once (distributed,
as bloom_scale_1e8 benches), then stream `rounds` sequential add_df
batches of `round_keys` new keys — exactly what the engine's per-round
`bloom.add_df(fetched_keys)` does under merge-on-read — and record each
batch's wall seconds plus whether it folded (version bump) or appended
to the LSM pending layer. Healthy shape: most rounds are ~1 s pending
appends; folds land on the pending-threshold cadence and only rewrite
the touched file groups. A flat driver RSS across the series is the
no-bitmaps-on-the-driver invariant.

    SPARK_GRAFT_BLOOM_KEYS=100000000 SPARK_GRAFT_BLOOM_ROUNDS=20 \
        SPARK_GRAFT_BLOOM_ROUND_KEYS=500000 \
        python tools/bench_bloom_mor_cadence.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_KEYS = int(os.environ.get("SPARK_GRAFT_BLOOM_KEYS", "100000000"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_BLOOM_ROUNDS", "20"))
ROUND_KEYS = int(os.environ.get("SPARK_GRAFT_BLOOM_ROUND_KEYS", "500000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rss_mb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from risjbot_spark.frontier.bloom_table import DistributedBloomTable

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = tempfile.mkdtemp(prefix="risjbot_bloom_cadence_")
    # geometry for ~10 bits/key at N_KEYS (power-of-two bits/bucket)
    n_buckets = 256
    m = 1
    while n_buckets * m < 10 * N_KEYS:
        m *= 4
    bloom = DistributedBloomTable(spark, path, n_buckets, m)

    t0 = time.monotonic()
    base = spark.range(N_KEYS).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    bloom.rebuild_from(base)
    build_secs = round(time.monotonic() - t0, 1)
    rss0 = rss_mb()

    rounds = []
    for r in range(ROUNDS):
        lo = N_KEYS + r * ROUND_KEYS
        keys = spark.range(lo, lo + ROUND_KEYS).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
        v0 = bloom.version
        t0 = time.monotonic()
        bloom.add_df(keys)
        dt = round(time.monotonic() - t0, 2)
        rounds.append({"round": r, "secs": dt,
                       "folded": bloom.version != v0,
                       "pending_layers": len(bloom._pending),
                       "rss_mb": rss_mb()})

    pend = [x["secs"] for x in rounds if not x["folded"]]
    folds = [x["secs"] for x in rounds if x["folded"]]
    out = {
        "metric": "bloom_add_secs_per_round_at_1e8_base",
        "base_keys": N_KEYS, "round_keys": ROUND_KEYS, "rounds": ROUNDS,
        "n_buckets": n_buckets, "bits_per_bucket": m,
        "build_secs": build_secs,
        "per_round": rounds,
        "pending_rounds": len(pend),
        "pending_median_secs": sorted(pend)[len(pend) // 2] if pend else None,
        "fold_rounds": len(folds),
        "fold_secs": folds,
        "driver_rss_mb_start": rss0,
        "driver_rss_mb_end": rounds[-1]["rss_mb"] if rounds else rss0,
        "ts": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(out))
    # artifact name derives from the base size so smoke runs at small
    # N_KEYS don't clobber the canonical 1e8 record
    import math

    tag = (f"1e{int(math.log10(N_KEYS))}"
           if 10 ** int(math.log10(N_KEYS)) == N_KEYS else str(N_KEYS))
    with open(os.path.join(REPO, "BENCH",
                           f"bloom_mor_cadence_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())

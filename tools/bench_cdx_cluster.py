"""Scale receipt for the two-level CDX cluster index (round 5).

Builds the index over the bench WARC archive (reuses the
bench_warc_split corpus cache; builds it if absent) and measures:

  * build wall — the ONE-range-exchange global sort + shard write;
  * driver-side lookup latency (p50/p99 over K sampled urls, plus a
    cold miss) — the zero-Spark-job two-seek path;
  * correctness spot-check: every sampled lookup's extents equal the
    full read_cdx rows for that url.

Run: python tools/bench_cdx_cluster.py [n_pages] [page_kb] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    page_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else os.path.join(REPO, "BENCH", "cdx_cluster.json"))
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "10g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.sources import warc as W

    seg = f"/tmp/warc_split_bench_seg_{n_pages}x{page_kb}x1"
    if not os.path.exists(os.path.join(seg, "_DONE")):
        n_blocks = max(1, page_kb * 1024 // 64)
        body = F.sha2(F.concat(F.lit("page"), F.col("id").cast("string")),
                      256)
        payload = F.encode(
            F.concat_ws("", F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda i: F.sha2(F.concat(body, i.cast("string")), 256))),
            "UTF-8")
        pages = spark.range(n_pages).select(
            F.concat(F.lit("https://bench.example/p/"),
                     F.col("id").cast("string")).alias("url"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            payload.alias("payload"))
        W.write_warc(pages, seg, n_files=1).collect()
        open(os.path.join(seg, "_DONE"), "w").close()

    cidx = f"/tmp/cdx_cluster_bench_{n_pages}"
    t0 = time.monotonic()
    man = W.write_cdx_cluster(spark, seg, cidx, shards=32,
                              block=3000).collect()
    build_secs = time.monotonic() - t0
    n_indexed = sum(r["n_lines"] for r in man)
    assert n_indexed == n_pages, (n_indexed, n_pages)

    # oracle rows for sampled urls from the full index
    sample_ids = list(range(0, n_pages, max(1, n_pages // 256)))[:256]
    urls = [f"https://bench.example/p/{i}" for i in sample_ids]
    want = {r["url"]: (r["cdx_ts"], r["offset"], r["length"], r["file"])
            for r in (W.read_cdx(spark, seg)
                      .filter(F.col("url").isin(urls)).collect())}

    # first lookup pays the one-time cluster.idx parse (memoized by
    # path+mtime+size); report it separately from the steady state
    t0 = time.perf_counter()
    first = W.cdx_cluster_lookup(cidx, urls[0])
    cold_us = (time.perf_counter() - t0) * 1e6
    assert len(first) == 1

    lat_us = []
    for u in urls:
        t0 = time.perf_counter()
        hits = W.cdx_cluster_lookup(cidx, u)
        lat_us.append((time.perf_counter() - t0) * 1e6)
        assert len(hits) == 1 and (
            hits[0]["cdx_ts"], hits[0]["offset"], hits[0]["length"],
            hits[0]["file"]) == want[u], u
    t0 = time.perf_counter()
    assert W.cdx_cluster_lookup(cidx, "https://never.example/x") == []
    miss_us = (time.perf_counter() - t0) * 1e6

    lat_us.sort()
    result = {
        "metric": "cdx_cluster_build_secs",
        "value": round(build_secs, 2),
        "unit": "sec",
        "n_records": n_pages,
        "n_shards": len(man),
        "block": 3000,
        "lookup_cold_us": round(cold_us, 1),
        "lookup_p50_us": round(statistics.median(lat_us), 1),
        "lookup_p99_us": round(lat_us[int(len(lat_us) * 0.99) - 1], 1),
        "lookup_miss_us": round(miss_us, 1),
        "lookups_checked": len(urls),
        "ts": datetime.now(timezone.utc).isoformat(),
        "config": "local[32]; 1-file 558MB archive; shards=32",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

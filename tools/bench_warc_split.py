"""Scale receipt for CDX-split WARC reads (round-5 item: remove the
one-task-per-file ceiling).

Builds a 2-file WARC segment of deterministic synthetic pages (total
~targeted MB), then times a full parse+count over it two ways on the
same local[N] session:

  * whole-file mode: binaryFile tasks, parallelism = file count (2);
  * split_by_cdx mode: offset-range tasks on member boundaries,
    parallelism = ceil(bytes / split_bytes) per file.

The interesting number is the speedup at cores >> files — exactly the
skewed-segment shape (one 1 GB file, 32 idle cores) the splitter
exists for.  Also asserts the two reads return identical record counts
(row-level identity is pytest-gated in tests/test_warc.py).

Run: python tools/bench_warc_split.py [n_pages] [page_kb] [out.json]
                                      [n_files]

n_files=1 is the headline shape: ONE ~0.5 GB file on 32 cores — the
whole-file mode is a single serial task there, so the split speedup
approaches the task-count ratio instead of 2-file's modest 2x ceiling.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    page_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else os.path.join(REPO, "BENCH", "warc_split.json"))
    n_files = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "10g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.sources import warc as W

    # size params in the cache path: a re-run with different n_pages/
    # page_kb builds fresh instead of tripping the count assert below
    seg = f"/tmp/warc_split_bench_seg_{n_pages}x{page_kb}x{n_files}"
    if not os.path.exists(os.path.join(seg, "_DONE")):
        # deterministic poorly-compressing payloads so the archive has
        # real bulk: per-page sha2-chained hex blocks (64 B each),
        # built JVM-side with ONE higher-order expression
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
        W.write_warc(pages, seg, n_files=n_files).collect()
        open(os.path.join(seg, "_DONE"), "w").close()
    total_mb = sum(os.path.getsize(os.path.join(seg, f))
                   for f in os.listdir(seg) if f.endswith(".warc.gz")) / 2**20

    def timed(df):
        t0 = time.monotonic()
        n = df.count()
        return n, time.monotonic() - t0

    # warm the page cache with a throwaway pass, then measure both modes
    W.read_warc(spark, seg, glob="*.warc.gz").count()
    n_whole, t_whole = timed(W.read_warc(spark, seg, glob="*.warc.gz"))
    split_bytes = 8 << 20
    split_df = W.read_warc(spark, seg, split_by_cdx=True,
                           split_bytes=split_bytes)
    n_split, t_split = timed(split_df)
    assert n_whole == n_split == n_pages, (n_whole, n_split)
    n_groups = (W.read_cdx(spark, seg)
                .groupBy("file", F.floor(F.col("offset") / split_bytes))
                .count().count())
    # ACTUAL concurrency: the range spread caps tasks at its partition
    # count, so reporting the raw group count would overstate the
    # parallelism the speedup was measured at
    n_tasks = min(n_groups, split_df.rdd.getNumPartitions())

    result = {
        "metric": "warc_split_read_speedup",
        "value": round(t_whole / t_split, 2),
        "unit": "x (whole-file / split wall)",
        "archive_mb": round(total_mb, 1),
        "n_records": n_pages,
        "n_files": n_files,
        "split_bytes": split_bytes,
        "n_split_groups": n_groups,
        "n_split_tasks": n_tasks,
        "whole_file_secs": round(t_whole, 2),
        "split_secs": round(t_split, 2),
        "records_per_sec_split": round(n_pages / t_split, 1),
        "ts": datetime.now(timezone.utc).isoformat(),
        "config": f"local[32]; {n_files}-file segment; split_bytes=8MiB",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

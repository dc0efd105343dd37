"""End-to-end bench of the AT-SCALE engine configuration.

The driver bench (bench.py) measures the default small/medium-crawl
path: broadcast frontier join + driver-resident bloom. The 10^10-URL
north-star deployment instead runs the scale path — bucketed pages
table (SMJ fetch join, one Exchange on the frontier side only),
url_hash-bucketed seen base, and the table-backed distributed bloom —
which no timed surface exercised end-to-end beyond unit parity tests.

This tool runs N crawl rounds at 10^6 pages (5× the scaling-leg corpus)
through exactly that configuration and reports cold + warm throughput,
per-round seconds, and driver-Python RSS (which must stay flat: the
table bloom keeps no bitmaps on the driver). Results → one JSON line on
stdout and BENCH/scale_path_1m.json.

    SPARK_GRAFT_SP_PAGES=1000000 SPARK_GRAFT_SP_ROUNDS=4 \
        python tools/bench_scale_path.py
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time
from datetime import datetime, timedelta, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_PAGES = int(os.environ.get("SPARK_GRAFT_SP_PAGES", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROUNDS = int(os.environ.get("SPARK_GRAFT_SP_ROUNDS", "4"))
BUCKETS = int(os.environ.get("SPARK_GRAFT_SP_BUCKETS", "64"))
# the synthetic corpus spreads pages over 12 hosts, so beyond ~10M pages
# the hottest host crosses the engine's default 1M per-host budget —
# raise it so the bench measures throughput, not the politeness cap
# (which is its own operator, gate-checked separately)
BUDGET = int(os.environ.get("SPARK_GRAFT_SP_BUDGET", str(max(
    1_000_000, N_PAGES))))


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("risjbot-scale-path")
        # align shuffle partitions to the bucket count so the SMJ's
        # frontier-side Exchange lands directly on the bucket layout
        .config("spark.sql.shuffle.partitions", str(BUCKETS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g"))
        .config("spark.sql.warehouse.dir",
                os.path.join(tempfile.gettempdir(), "risjbot_sp_warehouse"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from risjbot_spark.bucketing import (read_bucketed_pages,
                                         write_bucketed_pages)
    from risjbot_spark.corpus import pages_df
    from risjbot_spark.crawl import CrawlConfig, CrawlEngine
    from risjbot_spark.frontier.state import RefetchConfig

    # ---- corpus + bucketed ingest (NOT timed: input data, not engine
    # work). The flat corpus is cached at the bench.py path convention;
    # the bucketed table is REBUILT each process (the catalog is
    # in-memory, so a previous run's registration doesn't survive —
    # its leftover warehouse location is cleared first).
    corpus_parts = max(16, min(256, N_PAGES // 250))
    direct = os.environ.get("SPARK_GRAFT_SP_DIRECT") == "1"
    pages_path = os.path.join(
        tempfile.gettempdir(), f"risjbot_bench_pages_{N_PAGES}")
    if not direct and not os.path.exists(
            os.path.join(pages_path, "_SUCCESS")):
        pages_df(spark, N_PAGES, partitions=corpus_parts) \
            .write.mode("overwrite").parquet(pages_path)

    table = f"sp_pages_{N_PAGES}_{BUCKETS}"
    if not spark.catalog.tableExists(table):
        # a previous process's COMPLETED bucket files are reusable: the
        # in-memory catalog forgot them, but re-declaring the location
        # (register_bucketed_pages) restores the bucket spec without
        # rebuilding tens of GB
        prev = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            table.lower())
        if os.path.exists(os.path.join(prev, "_SUCCESS")):
            from risjbot_spark.bucketing import register_bucketed_pages
            register_bucketed_pages(spark, table, prev, buckets=BUCKETS)
    if not spark.catalog.tableExists(table) \
            or spark.table(table).count() != N_PAGES:
        # the catalog is in-memory (fresh per process) but the warehouse
        # dir persists — clear a leftover location from a previous run
        # or saveAsTable fails with LOCATION_ALREADY_EXISTS
        leftover = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            table.lower())
        if spark.catalog.tableExists(table):
            # a re-registered table that failed the count check above:
            # drop the catalog entry too (an external-location table
            # would otherwise make the overwrite saveAsTable collide
            # with the still-populated location)
            spark.sql(f"DROP TABLE {table}")
        if os.path.exists(leftover):
            import shutil
            shutil.rmtree(leftover)
        # SPARK_GRAFT_SP_DIRECT=1: bucket-write straight from the
        # generator — no flat parquet copy ever touches disk. At 50M+
        # pages the duplicate flat cache (even transiently, pre
        # DROP_FLAT) is what stops fitting the sandbox; a real
        # deployment ingests from object storage and likewise writes
        # the bucketed table once, directly.
        src = (pages_df(spark, N_PAGES, partitions=corpus_parts)
               if direct else spark.read.parquet(pages_path))
        write_bucketed_pages(src, table, buckets=BUCKETS)
    pages = read_bucketed_pages(spark, table)
    if direct:
        import shutil
        shutil.rmtree(pages_path, ignore_errors=True)  # stale flat cache
    # seeds come from the bucketed table (it keeps the raw url column),
    # so the flat corpus is droppable once ingested — at 20M+ pages the
    # duplicate flat copy is what no longer fits the sandbox disk
    # (SPARK_GRAFT_SP_DROP_FLAT=1 to reclaim it; a real deployment's
    # ingest reads from object storage and has no second copy at all)
    seeds = spark.table(table).select("url").withColumn(
        "priority", F.lit(0))
    if os.environ.get("SPARK_GRAFT_SP_DROP_FLAT") == "1":
        import shutil
        shutil.rmtree(pages_path, ignore_errors=True)

    wh = tempfile.mkdtemp(prefix="risjbot_sp_wh_")
    eng = CrawlEngine(
        spark, wh, pages, robots=None,
        cfg=CrawlConfig(
            refetch=RefetchConfig(maxfetches=max(8, N_ROUNDS + 1)),
            default_budget=BUDGET,
            num_partitions=BUCKETS,
            collect_lineage=False,
            use_bloom=True,
            bloom_backend="table",       # distributed bitmaps
            broadcast_frontier=False,    # SMJ against the bucketed table
            bucket_seen_base=True,       # url_hash-bucketed seen compaction
            # the generator emits exactly one row per URL and the
            # bucketed ingest preserves that, so the engine can skip
            # the corpus-sized html dedup exchange (the production
            # dedup-at-ingest contract; parity-tested in test_crawl)
            pages_unique_per_url=True,
        ),
    )
    # SPARK_GRAFT_SP_PRUNE_ARTICLES=1: drop each committed round's
    # article delta FILES after counting them — at 50M pages/round the
    # accumulated deltas (~16 GB/round) are what stop fitting the
    # sandbox disk alongside the 27 GB corpus. Counts accumulate
    # driver-side first; the seen table (the crawl STATE) is untouched,
    # and nothing in later bench rounds reads past article deltas
    # (follow_links off). A real deployment keeps them in object
    # storage.
    prune_articles = os.environ.get("SPARK_GRAFT_SP_PRUNE_ARTICLES") == "1"

    start = datetime(2017, 4, 1, tzinfo=timezone.utc)
    timings, rss = {}, {}
    warm_best = None
    n_round0 = 0
    pruned_total = 0
    for r in range(N_ROUNDS):
        t0 = time.monotonic()
        eng.run_round(seeds, r, start + timedelta(
            seconds=r * eng.cfg.refetch.refetchsecs))
        dt = time.monotonic() - t0
        timings[f"round_{r}"] = round(dt, 3)
        rss[f"round_{r}"] = round(_rss_mb(), 1)
        if r == 0:
            # measured, not averaged; counted OUTSIDE the timing window
            n_round0 = eng.articles_table.read().count()
        else:
            warm_best = dt if warm_best is None else min(warm_best, dt)
        if prune_articles and r < N_ROUNDS - 1:
            import shutil
            delta = eng.last_delta_dir
            pruned_total += spark.read.parquet(delta).count()
            shutil.rmtree(delta, ignore_errors=True)

    n_articles = (pruned_total + spark.read.parquet(
        eng.last_delta_dir).count() if prune_articles
        else eng.articles_table.read().count())
    out = {
        "metric": "scale_path_urls_per_sec_warm",
        "value": round(N_PAGES / warm_best, 1) if warm_best else None,
        "unit": "urls/sec",
        "pages": N_PAGES,
        "cpus": CPUS,
        "buckets": BUCKETS,
        "per_host_budget": BUDGET,
        "rounds": timings,
        "driver_rss_mb": rss,
        "articles_round0": n_round0,
        "articles_total": n_articles,
        "cold_urls_per_sec": round(N_PAGES / timings["round_0"], 1),
        "config": "broadcast_frontier=False bloom_backend=table "
                  "bucket_seen_base=True pages_unique_per_url=True"
                  + (" prune_articles=True" if prune_articles else ""),
        "ts": datetime.now(timezone.utc).isoformat(),
    }
    line = json.dumps(out)
    print(line)
    # filename derives from the corpus size so a smoke run can never
    # clobber the committed 1M baseline artifact
    tag = (f"{N_PAGES // 1_000_000}m" if N_PAGES % 1_000_000 == 0
           else f"{N_PAGES // 1000}k" if N_PAGES % 1000 == 0
           else str(N_PAGES))
    with open(os.path.join(REPO, "BENCH", f"scale_path_{tag}.json"),
              "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

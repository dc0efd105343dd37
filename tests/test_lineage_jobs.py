"""r3 verdict item #6: collect_lineage=True must add ZERO extra Spark
jobs per round — every counter rides the commit action as an Observation
(frontier_in inside the cached frontier plan, the four article counters
on the written plan) and per-partition extraction counts come from the
committed files' parquet footers, driver-side. The r3 shape paid three
extra jobs per round (eager frontier count, article-counters agg,
per-partition groupBy+collect)."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from risjbot_spark.corpus import pages_df
from risjbot_spark.crawl import CrawlConfig, CrawlEngine
from risjbot_spark.frontier.state import RefetchConfig

T0 = datetime(2017, 4, 1, tzinfo=timezone.utc)


def _round_job_count(spark, eng, seeds, rnd, ts, tag):
    sc = spark.sparkContext
    group = f"lineage-jobs-{tag}-{rnd}"
    sc.setJobGroup(group, group)
    try:
        lineage = eng.run_round(seeds, rnd, ts)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group)), lineage


def test_lineage_collection_adds_no_jobs(spark, tmp_path):
    pages = pages_df(spark, 40, partitions=2)
    seeds = pages.select("url").withColumn("priority", F.lit(0))
    jobs = {}
    lineages = {}
    for tag, flag in (("off", False), ("on", True)):
        eng = CrawlEngine(
            spark, str(tmp_path / f"wh_{tag}"), pages, None,
            CrawlConfig(refetch=RefetchConfig(maxfetches=3,
                                              refetchsecs=3600),
                        num_partitions=4, bloom_buckets=8,
                        collect_lineage=flag))
        per_round = []
        for rnd in range(3):
            n, lin = _round_job_count(
                spark, eng, seeds, rnd,
                T0 + timedelta(seconds=rnd * 3600), tag)
            per_round.append(n)
            lineages[(tag, rnd)] = lin
        jobs[tag] = per_round
    assert jobs["on"] == jobs["off"], (
        f"collect_lineage=True must not add Spark jobs: {jobs}")
    # and the counters are still real: exact values, not placeholders
    lin = lineages[("on", 0)]
    assert lin["frontier_in"] == 40
    assert lin["fetched"] == 40
    assert lin["extracted"] > 0
    assert lin["scheduled"] == 40
    assert sum(lin["per_partition_extracted"].values()) == lin["fetched"]
    # round 1 gates everything (inside refetchsecs at +3600? no — +3600
    # is exactly eligible; round 2 at +7200 likewise): fetch counts stay
    # consistent with the frontier each round
    for rnd in range(3):
        lr = lineages[("on", rnd)]
        assert lr["frontier_in"] == 40
        assert lr["fetched"] <= lr["scheduled"]


def test_manifest_still_carries_counters(spark, tmp_path):
    """The commit manifest must keep the lineage contract (round,
    round_ts, extracted, per-partition counts) now that the counters are
    resolved between the data write and the manifest write."""
    pages = pages_df(spark, 20, partitions=2)
    seeds = pages.select("url").withColumn("priority", F.lit(0))
    eng = CrawlEngine(
        spark, str(tmp_path / "wh"), pages, None,
        CrawlConfig(refetch=RefetchConfig(), num_partitions=4,
                    bloom_buckets=8, collect_lineage=True))
    eng.run_round(seeds, 0, T0)
    man = eng.articles_table.manifest()
    lin = man["lineage"]
    assert lin["round"] == 0
    assert lin["fetched"] == 20 and lin["extracted"] > 0
    assert lin["frontier_in"] == 20
    assert sum(lin["per_partition_extracted"].values()) == 20

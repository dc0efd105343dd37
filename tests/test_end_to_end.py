"""End-to-end user journey: Common-Crawl-style WARC segments in →
bucketed pages table → crawl rounds → curated training corpus →
deterministic shards, and the crawl's fetched pages back OUT as
WARC + CDX.  Every stage is the public API a reference user would
call; byte identity is asserted at both archive boundaries."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from risjbot_spark import pipeline
from risjbot_spark.bucketing import read_bucketed_pages, \
    write_bucketed_pages
from risjbot_spark.corpus import pages_df, robots_rows, seed_urls
from risjbot_spark.crawl import CrawlConfig, CrawlEngine
from risjbot_spark.frontier.state import RefetchConfig
from risjbot_spark.schema import ROBOTS_SCHEMA
from risjbot_spark.shards import write_training_shards
from risjbot_spark.sources import warc as W

START = datetime(2026, 1, 2, tzinfo=timezone.utc)


def test_warc_to_crawl_to_curate_to_shards(spark, tmp_path):
    n = 60
    origin = pages_df(spark, n, partitions=2)

    # 1. the corpus arrives as WARC segments
    seg_dir = str(tmp_path / "segments")
    W.write_warc(
        origin.select("url", "warc_ts",
                      F.col("html").alias("payload")),
        seg_dir, n_files=4).collect()

    # 2. ingest: byte-identical pages table back out of the archive —
    # via the CDX-split offset-range path (write_warc wrote sidecars),
    # so the splittable reader is exercised through the whole journey;
    # tiny split_bytes forces real multi-split planning even at n=60
    pages = W.pages_from_warc(spark, seg_dir, glob="*.warc.gz",
                              split_by_cdx=True, split_bytes=4096)
    got = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    want = {r["url"]: bytes(r["html"])
            for r in origin.select("url", "html").collect()}
    assert got == want

    # 3. bucket for the beyond-broadcast fetch join
    loc = tmp_path / "bucketdb"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS e2e LOCATION '{loc}'")
    try:
        write_bucketed_pages(pages, "e2e.pages", buckets=4)
        bucketed = read_bucketed_pages(spark, "e2e.pages")

        # 4. crawl one round over the ingested table
        robots = spark.createDataFrame(robots_rows(), ROBOTS_SCHEMA)
        cfg = CrawlConfig(
            refetch=RefetchConfig(maxfetches=3, refetchsecs=3600),
            default_budget=100, num_partitions=2,
            pages_precanonicalized=True)
        eng = CrawlEngine(spark, str(tmp_path / "wh"), bucketed,
                          robots, cfg)
        seeds = (spark.createDataFrame(
            seed_urls(n), "url string, source_kind string, priority int")
            .select("url", "priority"))
        eng.run(seeds, rounds=1, start_ts=START)
        articles = eng.articles_table.read()
        n_art = articles.count()
        assert n_art > 0

        # 5. curate the extracted text into a training corpus — incl.
        # the model-based stages: a permissive classifier (annotation
        # gate at a threshold every real article clears) and DSIR
        # selection against the corpus' own articles as target (scores
        # ~0, inclusive cut keeps them) — integration, not selectivity,
        # is what the journey pins; selectivity has its own tests
        corpus_in = articles.select("url_canon", "bodytext")
        res = pipeline.curate(
            corpus_in,
            "url_canon", "bodytext",
            quality={"max_top_token_frac": 0.8,
                     "min_distinct_ratio": 0.05,
                     "max_dup_ngram_frac": 0.9},
            classifier={"weights": [0.05] * 256, "min_prob": 0.5,
                        "keep_score": True},
            dsir={"target": corpus_in, "dim": 256, "min_score": -1.0},
            split={"val_permille": 100, "test_permille": 100})
        curated = res.docs
        n_cur = curated.count()
        assert 0 < n_cur <= n_art
        assert "q_prob" in curated.columns
        rep = res.report(run=False)
        assert rep["input"] == n_art and rep["output"] == n_cur
        assert "after_classifier" in rep and "after_dsir" in rep

        # 6. deterministic shards a trainer can stream
        man = write_training_shards(
            curated, str(tmp_path / "shards"), n_shards=3,
            id_col="url_canon")
        assert sum(man["rows"].values()) == n_cur

        # 7. and the fetched pages back out as WARC + CDX
        out = str(tmp_path / "export")
        manifest = eng.export_warc(out, n_files=2).collect()
        n_exported = sum(m["n_records"] for m in manifest)
        assert n_exported == articles.select("url_canon") \
            .distinct().count()
        idx = W.read_cdx(spark, out)
        assert idx.count() == n_exported
        # random access returns exactly the bytes the crawl fetched
        import os
        r = idx.orderBy("urlkey").first()
        rec = W.fetch_record(os.path.join(out, r["file"]),
                             r["offset"], r["length"])
        assert rec["payload"] == want[rec["url"]]
    finally:
        spark.sql("DROP TABLE IF EXISTS e2e.pages")
        spark.sql("DROP DATABASE IF EXISTS e2e")

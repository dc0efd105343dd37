"""Beyond-broadcast fetch joins: bucketed pages tables.

The corpus-join fetch broadcasts the per-round frontier into the pages
scan (crawl.py) — the right plan while a round's scheduled URLs fit in a
broadcast. Past that (billions of eligible URLs per round), the join
must shuffle — and shuffling the PAGES side means moving the 100 TB of
html every round. The classic warehouse answer is BUCKETING: write
pages bucketed (and sorted) by the canonical-URL join key once, at
ingest; every later fetch join then shuffles only the frontier side
into the same bucket layout, while the pages scan stays in place
(SortMergeJoin with an Exchange on exactly one side — plan-asserted in
tests). This is the parquet-datasource analogue of the Iceberg
`bucket(N, url)` partition transform SURVEY §4 names.

Cost model at 10^10 URLs / 100 TB: one bucketed rewrite at ingest
(amortized over every round), then per-round cost = frontier shuffle
(O(round keys)) + co-located merge join — vs per-round pages shuffle
(O(corpus)) without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .urlnorm import with_canonical


def write_bucketed_pages(pages: DataFrame, table: str,
                         buckets: int = 64) -> None:
    """One-time ingest: canonicalize and bucket the pages by page_url.

    Written as a datasource table (bucket metadata lives in the session
    catalog; no Hive needed). `buckets` sizes the per-bucket file to the
    executor-memory budget — at 100 TB / 512 MiB targets that is ~200k
    buckets, here a test-friendly default."""
    from pyspark.sql import functions as F

    (
        with_canonical(pages)
        .select(pages["*"], "url_canon")
        .withColumnRenamed("url_canon", "page_url")
        # align write tasks to buckets BEFORE bucketBy (Murmur3
        # repartition == the bucketBy hash): without this every input
        # task writes up to `buckets` files — tasks × buckets small
        # files; at the 100 TB / ~200k-bucket target that is millions
        # of tiny parquet files (same fix as snapshots.commit's
        # bucketed path)
        .repartition(buckets, F.col("page_url"))
        .write.mode("overwrite")
        .bucketBy(buckets, "page_url")
        .sortBy("page_url")
        .format("parquet")
        .saveAsTable(table)
    )


def register_bucketed_pages(spark: SparkSession, table: str,
                            location: str, buckets: int = 64) -> None:
    """Re-declare an EXISTING bucketed-pages directory as a catalog
    table — the session catalog is in-memory, so a new process loses
    the registration while the (possibly hundreds-of-GB) bucket files
    survive on disk. Spark's datasource bucketing encodes the bucket id
    in each file name (`..._00042.c000`), so an external CLUSTERED BY
    declaration over the same location restores the full bucket spec:
    the fetch join plans its single frontier-side Exchange exactly as
    if this process had written the table (plan-asserted in tests).
    The declaration must match the writer (write_bucketed_pages):
    page_url bucket+sort column, same bucket count."""
    df = spark.read.parquet(location)
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in df.schema.fields)
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY (page_url) SORTED BY (page_url) "
        f"INTO {buckets} BUCKETS LOCATION '{location}'")


def read_bucketed_pages(spark: SparkSession, table: str) -> DataFrame:
    """The bucketed pages view for CrawlEngine(pages=...): reading via
    the catalog preserves the bucket spec, so the engine's fetch join
    (with cfg.broadcast_frontier=False) plans an Exchange on the
    frontier side only."""
    return spark.table(table)

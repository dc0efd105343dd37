"""Bucketed seen base (Iceberg bucket(N, url_hash) analogue): the J1
gate and the MoR resolve must be row-identical to the generic paths,
shuffle-free on the base side, and resumable across catalogs."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from risjbot_spark.corpus import pages_df, url_for
from risjbot_spark.crawl import CrawlConfig, CrawlEngine
from risjbot_spark.frontier.state import (
    RefetchConfig,
    resolve_split,
    seen_filter,
    seen_filter_split,
    seen_state,
)
from risjbot_spark.frontier.xxhash import xxhash64

START = datetime(2017, 4, 1, tzinfo=timezone.utc)


def _seen_rows(spark, spec):
    """spec: [(key_suffix, fetches, iso_ts)] → resolved seen rows."""
    rows = [
        (xxhash64(f"https://h{i % 3}.example.com/{k}"),
         f"https://h{i % 3}.example.com/{k}", f"h{i % 3}.example.com",
         f, datetime.fromisoformat(ts))
        for i, (k, f, ts) in enumerate(spec)
    ]
    return spark.createDataFrame(
        rows, "url_hash long, url string, host string, fetches int, "
              "last_fetch timestamp")


def test_resolve_split_equals_seen_state(spark):
    """newer ∪ (base ∖ newer-keys) must equal the groupBy latest-wins
    resolve whenever newer rows are strictly newer (the MoR invariant)."""
    base = _seen_rows(spark, [
        ("a", 1, "2017-04-01 00:00:00"),
        ("b", 2, "2017-04-01 03:00:00"),
        ("c", 1, "2017-04-01 06:00:00"),
    ])
    newer = _seen_rows(spark, [
        ("b", 3, "2017-04-02 00:00:00"),     # supersedes base
        ("d", 1, "2017-04-02 00:00:00"),     # new key
    ])
    split = resolve_split(base, newer)
    generic = seen_state(base.unionByName(newer))
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(split) == key(generic)


def test_seen_filter_split_equals_seen_filter(spark):
    base = _seen_rows(spark, [
        ("a", 1, "2017-04-01 12:00:00"),     # refetch-eligible (age 14h)
        ("b", 8, "2017-04-01 12:00:00"),     # maxfetches reached
        ("c", 1, "2017-04-01 20:00:00"),     # would be eligible (age 6h)…
    ])
    # …but the delta supersedes 'c' with a fresh fetch 30 min ago —
    # delta precedence must drop it (_seen_rows keys by enumeration
    # order, so a single-row spec hashes as i=0 → h0/c; mirror that key
    # in base/frontier via the same helper ordering)
    newer = _seen_rows(spark, [("c", 2, "2017-04-02 01:30:00")])
    fr_rows = [(xxhash64(f"https://h{i % 3}.example.com/{k}"),
                f"https://h{i % 3}.example.com/{k}", f"h{i % 3}.example.com")
               for i, k in [(0, "a"), (1, "b"), (2, "c"), (0, "c"),
                            (1, "zz")]]
    frontier = spark.createDataFrame(
        fr_rows, "url_hash long, url_canon string, host string")
    cfg = RefetchConfig()
    ts = datetime(2017, 4, 2, 2, 0, tzinfo=timezone.utc)
    merged = resolve_split(base, newer)
    a = seen_filter(frontier, merged, cfg, ts)
    b = seen_filter_split(frontier, base, newer, cfg, ts)
    key = lambda df: sorted(
        (r.url_hash, r.previousfetches) for r in df.collect())
    assert key(a) == key(b)
    # 'a' eligible (old enough), 'b' dropped (maxfetches), h2/c eligible
    # from base, h0/c dropped (the DELTA row is 30 min old — precedence),
    # 'zz' new
    got = dict(key(b))
    assert set(got) == {xxhash64("https://h0.example.com/a"),
                        xxhash64("https://h2.example.com/c"),
                        xxhash64("https://h1.example.com/zz")}
    assert got[xxhash64("https://h1.example.com/zz")] == 0


def _run_engine(spark, wh, pages, seeds, bucketed, rounds=6):
    cfg = CrawlConfig(refetch=RefetchConfig(), num_partitions=4,
                      collect_lineage=False, trim_every=2,
                      bucket_seen_base=bucketed, seen_buckets=8)
    eng = CrawlEngine(spark, wh, pages, None, cfg)
    for r in range(rounds):
        eng.run_round(seeds, r, START + timedelta(seconds=10801 * r))
    return eng


def test_bucketed_run_parity_with_generic(spark, tmp_path):
    """Six rounds through two compactions: articles and resolved seen
    state must be identical with and without the bucketed base."""
    pages = pages_df(spark, 90, partitions=4)
    seeds = pages.select("url").withColumn("priority", F.lit(0))
    a = _run_engine(spark, str(tmp_path / "flat"), pages, seeds, False)
    b = _run_engine(spark, str(tmp_path / "bucketed"), pages, seeds, True)
    arts = lambda e: sorted(
        (r.url_canon, r.round) for r in e.articles_table.read().collect())
    seen = lambda e: sorted(
        (r.url_hash, r.fetches, r.last_fetch) for r in e.seen().collect())
    assert arts(a) == arts(b)
    assert seen(a) == seen(b)
    # the bucketed engine actually produced the split shape
    assert b._seen_parts() is not None
    assert a._seen_parts() is None


def test_gate_plan_no_exchange_on_base_side(spark, tmp_path):
    """The whole point: after compaction, the J1 gate join must read the
    base bucketed with NO hash exchange on the base side — the only
    Exchange hashpartitioning in the plan belongs to the frontier."""
    pages = pages_df(spark, 90, partitions=4)
    seeds = pages.select("url").withColumn("priority", F.lit(0))
    eng = _run_engine(spark, str(tmp_path / "wh"), pages, seeds, True,
                      rounds=4)                   # compaction at 2 + delta
    base, deltas = eng._seen_parts()
    newer = seen_state(deltas)
    frontier = spark.createDataFrame(
        [(xxhash64(url_for(i)), url_for(i), "h") for i in range(30)],
        "url_hash long, url_canon string, host string")
    gated = seen_filter_split(frontier, base, newer, RefetchConfig(),
                              START + timedelta(days=2))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = gated._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Bucketed: true" in plan
    # two hash exchanges total: the frontier into the bucket layout and
    # the O(delta) resolve groupBy — NEVER the base. Walk the bucketed
    # scan's ancestor chain (tree lines above it with a shallower
    # branch marker) and require it exchange-free.
    assert plan.count("Exchange hashpartitioning") == 2
    lines = plan.splitlines()
    scan_i = next(i for i, l in enumerate(lines) if "Bucketed: true" in l)

    def depth(line):
        for tok in ("+- ", ":- "):
            if tok in line:
                return line.index(tok)
        return -1                            # root line
    d = depth(lines[scan_i])
    ancestors = []
    for i in range(scan_i - 1, -1, -1):
        di = depth(lines[i])
        if di < d:
            ancestors.append(lines[i])
            d = di
        if di == -1:
            break
    assert not any("Exchange" in l for l in ancestors), ancestors


def test_bucketed_base_survives_catalog_loss(spark, tmp_path):
    """Resume on a fresh cluster: the in-memory catalog forgets the
    table; read_dir must re-register from the manifest DDL (incl.
    partition recovery) and the engine must resume losslessly."""
    pages = pages_df(spark, 60, partitions=4)
    seeds = pages.select("url").withColumn("priority", F.lit(0))
    eng = _run_engine(spark, str(tmp_path / "wh"), pages, seeds, True,
                      rounds=3)
    before = sorted((r.url_hash, r.fetches) for r in eng.seen().collect())
    man = eng.seen_table.manifest()
    tbl = man["file_meta"][man["files"][0]]["bucket_table"]
    spark.sql(f"DROP TABLE {tbl}")               # simulate a new session
    eng2 = CrawlEngine(
        spark, str(tmp_path / "wh"), pages, None,
        CrawlConfig(refetch=RefetchConfig(), num_partitions=4,
                    collect_lineage=False, trim_every=2,
                    bucket_seen_base=True, seen_buckets=8))
    after = sorted((r.url_hash, r.fetches) for r in eng2.seen().collect())
    assert before == after
    # and the next round still runs (gate + trawl against the re-
    # registered base)
    eng2.run_round(seeds, 3, START + timedelta(seconds=10801 * 3))
    assert eng2.articles_table.read().filter(F.col("round") == 3).count() > 0

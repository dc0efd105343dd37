"""Link-graph frontier prioritization: PageRank over discovered outlinks.

The reference schedules purely by hand-assigned per-request priority
ints (RISJbot spiders set 0/5/10/100 — e.g.
/root/reference/RISJbot/spiders/uk/liverpoolecho.py:37,108,134,171 —
consumed by Scrapy's priority queue). That works for a dozen news
sites; a 10^10-URL frontier needs a GLOBAL signal of which unfetched
URLs matter. The classic answer is link-graph authority (PageRank /
OPIC): URLs that many already-crawled pages point at get fetched
first. This module scores the (src → dst) outlink graph the crawl has
already observed and converts the scores into the same priority ints
the politeness scheduler (W1, `frontier/politeness.py`) already
consumes — no scheduler changes needed.

Arithmetic is FIXED-POINT on longs, not doubles. Floating-point
PageRank is order-dependent (a distributed SUM of doubles changes with
partitioning), so two runs of the same job — or the engine vs a SQL
oracle — drift in the low bits and can even flip rank ORDER between
near-ties. Integer fixed-point (rank mass scaled by `scale`, damping
as the exact rational num/den, integer division) is associative and
order-independent: the same input gives bit-identical ranks at any
parallelism, which makes crawl schedules reproducible and the query
hash-checkable against DuckDB. Precision is 1/scale of the initial
mass (1e-6 by default) — far below any meaningful rank distinction.

Scale shape (the 100 TB story):
- state per iteration = one (node, rank) table, O(nodes);
- per-iteration work = two shuffles sized by the EDGE list (join
  ranks→edges on src; groupBy dst) plus one node-sized left join —
  never the corpus, never all-pairs;
- the edge list is repartitioned by src ONCE and persisted, so each
  iteration's src-join exchanges only the (node, share) side;
- hub dst skew (everyone links to the homepage) is absorbed by
  map-side partial aggregation — SUM is associative, so the hot key
  combines locally before the exchange;
- lineage is truncated per iteration (the same idiom as
  `dedup.connected_components`): eager `localCheckpoint` by default
  (single-node / bench), reliable `spark.checkpoint()` when
  `checkpoint_dir` is set (a lost executor recomputes from checkpoint
  files instead of failing the job).

Dangling nodes (no outlinks) contribute no mass — the standard
"no dangling redistribution" PageRank variant; they still RECEIVE the
(1-d) base plus their inbound share. Every node that appears in any
edge is scored; isolated frontier URLs keep their existing priority
via the left join in `prioritize_frontier`.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..urlnorm import canonicalize_expr


def outlink_edges(articles: DataFrame, *, src_col: str = "url_canon",
                  links_col: str = "links") -> DataFrame:
    """Extracted articles → canonical (src, dst) outlink edge list.

    `links` is the pre-prune, offsite-filtered outlink array the
    extraction UDF already produces (S6, `extract/semantics.py`
    `_extract_links`); dst URLs are canonicalized with the same
    expression the frontier uses so graph nodes and frontier keys
    agree. Self-loops are dropped (a page linking to itself carries no
    scheduling information); parallel edges are collapsed so out-degree
    means distinct outlinks, matching the oracle's DISTINCT edges."""
    return (
        articles
        .select(F.col(src_col).alias("src"),
                F.explode(links_col).alias("dst_raw"))
        .select("src", canonicalize_expr(F.col("dst_raw")).alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def link_graph_ranks(edges: DataFrame, *, src: str = "src",
                     dst: str = "dst", iterations: int = 3,
                     damping_num: int = 17, damping_den: int = 20,
                     scale: int = 1_000_000,
                     num_partitions: Optional[int] = None,
                     checkpoint_dir: Optional[str] = None) -> DataFrame:
    """Fixed-iteration, fixed-point PageRank over an edge list.

    Returns (node, rank) with rank a long in units of `1/scale` of one
    page's initial mass (rank0 = scale). damping defaults to the exact
    rational 17/20 = 0.85. `iterations` is fixed rather than
    convergence-tested: a crawl reprioritizes on a cadence, and a fixed
    T makes the job's cost and its oracle deterministic (T=3 already
    separates hubs from leaves by orders of magnitude).

    Per iteration, with d = num/den and share(u) = rank(u) div
    outdeg(u):   rank'(v) = base + (num * Σ_{u→v} share(u)) div den
    where base = ((den-num) * scale) div den. All operands are longs;
    every operation is exact, so the result is independent of
    partitioning and parallelism (asserted in tests by re-running at a
    different layout)."""
    if iterations < 1:
        # 0 iterations would return the uniform initial mass for every
        # node — prioritize_frontier would then map EVERY linked URL to
        # priority scale/unit (= the reference's maximum hand-pin level),
        # silently destroying pin precedence. Refuse instead.
        raise ValueError(f"iterations must be >= 1 (got {iterations})")
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    n_part = num_partitions or edges.sparkSession.sparkContext.defaultParallelism
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .repartition(n_part, "src").persist())
    # every derived table gets FRESH column names (new exprIds):
    # outdeg/nodes/e all descend from the same edge scan, and Spark's
    # ambiguous-self-join analyzer rejects mixing their lineages in one
    # join otherwise
    outdeg = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
              .select(F.col("src").alias("deg_src"), "deg")
              .persist())
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct().persist())

    base = ((damping_den - damping_num) * scale) // damping_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    try:
        for _ in range(iterations):
            share = (
                ranks.join(outdeg, F.col("node") == F.col("deg_src"))
                .select(F.col("deg_src").alias("src"),
                        F.expr("rank div deg").cast("long").alias("share"))
            )
            contrib = (
                e.join(share, "src")
                .groupBy("dst").agg(F.sum("share").alias("inflow"))
                .select(F.col("dst").alias("in_dst"), "inflow")
            )
            ranks = _truncate(
                nodes.join(contrib, F.col("node") == F.col("in_dst"),
                           "left")
                .select(
                    "node",
                    (F.lit(base) + F.expr(
                        f"({damping_num} * coalesce(inflow, 0L)) "
                        f"div {damping_den}")).cast("long").alias("rank"),
                )
            )
    finally:
        # the persisted inputs are only needed while iterating; release
        # the executor memory before handing the (checkpoint-backed)
        # result out — ALSO on a failing iteration, or a long-lived
        # engine session leaks the cached edge list (the largest
        # structure in the job) every failed refresh
        for df in (e, outdeg, nodes):
            df.unpersist()
    return ranks


def prioritize_frontier(frontier: DataFrame, ranks: DataFrame, *,
                        url_col: str = "url_canon",
                        priority_col: str = "priority",
                        unit: int = 10_000) -> DataFrame:
    """Merge link-graph ranks into frontier priorities.

    For URLs in the graph, priority' = greatest(existing priority,
    rank div unit): explicit spider priorities (the reference's
    100-level "fetch me now" pins) still win, while unpinned URLs get
    ordered by authority. `unit` converts fixed-point rank mass into
    the scheduler's int scale — the default maps one initial-page-mass
    (1e6) to priority 100, the reference's highest hand-assigned level.
    Frontier URLs absent from the graph keep their existing priority
    UNTOUCHED — including negative deprioritization pins and NULLs
    (the left join's _rp is null, and the when() below never fires).

    The merged priority is clamped to int32 max: a mega-hub's rank can
    exceed 2^31×unit (~2.5e7 in-links at the defaults), and under
    Spark 4's default ANSI mode an unclamped bigint→int cast would
    throw CAST_OVERFLOW on exactly the most authoritative node —
    killing every frontier assembly after the refresh that first
    crossed the line."""
    r = ranks.select(
        F.col("node"),
        F.least(F.expr(f"rank div {unit}"),
                F.lit(2147483647).cast("long")).cast("int").alias("_rp"))
    out = (
        frontier.join(r, frontier[url_col] == r["node"], "left")
        .withColumn(
            priority_col,
            F.when(
                F.col("_rp").isNotNull(),
                F.greatest(F.coalesce(F.col(priority_col), F.lit(0)),
                           F.col("_rp")),
            ).otherwise(F.col(priority_col)))
        .drop("node", "_rp")
    )
    return out

"""Scale evidence for link-graph frontier prioritization
(frontier/rank.py): fixed-point PageRank over a synthetic hub-skewed
outlink graph at 10^7 edges on local[32].

What this demonstrates for the 100 TB story:
  * per-iteration cost is EDGE-sized: the two shuffles each Lloyd-style
    round pays (ranks→edges join on src; groupBy dst) move the edge
    list / (node, share) tables, never a corpus — wall time per
    iteration is recorded per edge decade to show linear growth;
  * hub skew (a zipf-ish in-degree tail — everyone links to the
    homepage) is absorbed by map-side partial aggregation: SUM is
    associative, the hot dst key combines locally before the exchange,
    so the hottest node does NOT dominate the iteration;
  * driver RSS stays flat: rank state lives in executor-side
    localCheckpoint blocks, the driver holds no per-node structures;
  * the result is bit-identical at different parallelism — asserted at
    the 10^6 step by re-running at half the partitions and comparing a
    rank-sum fingerprint (exact long arithmetic makes this a strict
    equality, not a tolerance).

Graph: src = id % n_nodes; dst = xxhash64(id) % n_nodes, then ~30% of
dst mass collapsed into the low-100-id hub band so in-degree follows a
heavy tail. Deterministic, seedless.

Run: python tools/bench_link_rank.py [n_edges] [out.json]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def graph(spark, n_edges: int, n_nodes: int):
    """Deterministic hub-skewed edge list: dst is squashed toward low
    node ids (dst' = dst % (dst_bucket)) so the low hundred nodes
    collect a heavy share of in-links — the 'everyone links to the
    homepage' shape the module's skew claim is about."""
    e = spark.range(0, n_edges).select(
        F.pmod(F.col("id"), F.lit(n_nodes)).alias("s"),
        # xxhash64: deterministic scatter with no ANSI long overflow
        # (id*id*const exceeds int64 past ~2^31 ids)
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("d0"),
    )
    # squash ~30% of dst mass into the low-id hub band
    e = e.select(
        F.concat(F.lit("n"), F.col("s")).alias("src"),
        F.concat(F.lit("n"), F.when(
            F.pmod(F.col("d0"), F.lit(10)) < 3,
            F.pmod(F.col("d0"), F.lit(100)),
        ).otherwise(F.col("d0"))).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return e


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, "BENCH", "link_rank_scale.json"))
    from bench import _host_delivery_probe

    host_ops = _host_delivery_probe(32)
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.frontier.rank import link_graph_ranks

    steps = {}
    rss0 = _rss_mb()
    invariance_ok = None
    for n in (n_edges // 100, n_edges // 10, n_edges):
        n_nodes = max(1000, n // 10)
        edges = graph(spark, n, n_nodes)
        # materialize the input once so the timed section is the rank
        # job, not the generator
        path = f"/tmp/lr_scale_edges_{n}"
        edges.write.mode("overwrite").parquet(path)
        edges = spark.read.parquet(path)
        t0 = time.monotonic()
        ranks = link_graph_ranks(edges, iterations=3)
        row = ranks.agg(F.count("*").alias("nodes"),
                        F.sum("rank").alias("mass"),
                        F.max("rank").alias("hub")).first()
        dt = time.monotonic() - t0
        steps[n] = {
            "seconds": round(dt, 3),
            "edges_per_sec_per_iter": round(3 * n / dt),
            "nodes": int(row["nodes"]),
            "rank_mass": int(row["mass"]),
            "hub_max_rank": int(row["hub"]),
            "driver_rss_mb": round(_rss_mb()),
        }
        if n == n_edges // 10:
            # partitioning invariance at scale: exact long arithmetic ⇒
            # the (count, sum, max) fingerprint is a strict equality
            r2 = link_graph_ranks(edges, iterations=3,
                                  num_partitions=max(
                                      2, spark.sparkContext
                                      .defaultParallelism // 2))
            row2 = r2.agg(F.count("*").alias("nodes"),
                          F.sum("rank").alias("mass"),
                          F.max("rank").alias("hub")).first()
            invariance_ok = (
                (int(row["nodes"]), int(row["mass"]), int(row["hub"]))
                == (int(row2["nodes"]), int(row2["mass"]),
                    int(row2["hub"])))
            assert invariance_ok, "ranks differ across partitionings"

    result = {
        "metric": "link_rank_scale",
        "n_edges_max": n_edges,
        "iterations": 3,
        "host_mops_32": round(host_ops / 1e6, 1),
        "steps": steps,
        "partitioning_invariant_at_10pct": invariance_ok,
        "driver_rss_mb_start": round(rss0),
        "ts": datetime.now(timezone.utc).isoformat(),
    }
    line = json.dumps(result)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    import shutil

    for n in (n_edges // 100, n_edges // 10, n_edges):
        shutil.rmtree(f"/tmp/lr_scale_edges_{n}", ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

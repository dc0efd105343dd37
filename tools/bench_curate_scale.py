"""Scale evidence for the COMPOSED curation pipeline (pipeline.curate):
the full chain — boilerplate strip, PII scrub, duplicated-span removal,
heuristic quality gate, model-based classifier gate, near-dedup
(MinHash/LSH + connected components + survivors), decontamination, and
the leakage-safe holdout split — over a synthetic 10^6-document corpus
on local[32], driven as ONE declarative plan with Observation lineage.

What this demonstrates for the 100 TB story (VERDICT r4 item #4):
  * the one-plan claim holds at 10^6 docs: a single write action fires
    every stage AND every Observation counter (per-stage survivor
    counts are read back with run=False — no second pass);
  * the chain's cost is dominated by its two known-heavy exchanges
    (span-strip's gram window and near-dedup's shingle pipeline), not
    by orchestration overhead — the composed docs/s is the number a
    capacity plan needs;
  * driver RSS stays flat: lineage is Observation-based (no collects),
    the classifier weights ride the plan as one array literal, and the
    decontam eval side broadcasts.

Corpus: the deterministic generator from bench_textquality_scale plus
planted structure — every 10th doc gets a truncated near-dup twin,
every 50th doc quotes the eval set (contamination), every 25th doc
carries a shared boilerplate line, and 2% are repetitive junk.

Run: python tools/bench_curate_scale.py [n_docs] [out.json]
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


EVAL_SENTENCE = ("benchmark question about rivers and bridges "
                 "answer key")
BOILER = "subscribe to our newsletter for daily updates and offers"


def mutant_corpus(spark, n_docs: int):
    """base docs + planted near-dups / contamination / boilerplate /
    junk, all deterministic expressions."""
    from tools.bench_textquality_scale import corpus

    base = corpus(spark, n_docs)
    # plant signals on the base text
    planted = base.select(
        "doc_id",
        F.when(F.col("doc_id") % 50 == 0,
               F.concat(F.col("text"), F.lit(" " + EVAL_SENTENCE)))
         .when(F.col("doc_id") % 25 == 0,
               F.concat(F.lit(BOILER + "\n"), F.col("text")))
         .when(F.col("doc_id") % 47 == 0,
               F.concat_ws(" ", F.array_repeat(F.lit("spam junk"), 40)))
         .otherwise(F.col("text")).alias("text"),
        "source", "lang")
    # near-dup twins for every 10th doc: drop the first token
    twins = (planted.filter(F.col("doc_id") % 10 == 0)
             .select((F.col("doc_id") + n_docs).alias("doc_id"),
                     F.substring_index(F.col("text"), " ", -60)
                     .alias("text"),
                     "source", "lang"))
    return planted.unionByName(twins)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, "BENCH", "curate_1m.json"))
    from bench import _host_delivery_probe

    host_ops = _host_delivery_probe(32)
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark import pipeline

    docs_path = "/tmp/curate_scale_docs"
    mutant_corpus(spark, n_docs).write.mode("overwrite") \
        .parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    n_input = docs.count()
    rss0 = _rss_mb()

    eval_df = spark.createDataFrame([(EVAL_SENTENCE,)], "text string")
    dim = 2 ** 12
    weights = [((b * 2654435761) % 2000) / 1000.0 - 1.0
               for b in range(dim)]
    target = docs.filter(F.col("doc_id") % 97 == 0).select("text")

    t0 = time.monotonic()
    res = pipeline.curate(
        docs, "doc_id", "text",
        boilerplate={},
        pii={},
        span_dedup={"k": 8, "strategy": "join"},
        quality={"max_dup_ngram_frac": 0.6, "max_top_token_frac": 0.4,
                 "min_distinct_ratio": 0.2},
        classifier={"weights": weights, "intercept": 0.0,
                    "min_prob": 0.05},
        near_dedup={"ngram": 3, "threshold": 0.5},
        decontam_eval=eval_df,
        decontam={"ngram": 5, "max_hit_frac": 0.05},
        split={"val_permille": 10, "test_permille": 10},
        # persist=True: pins each multiply-referenced boundary (span,
        # near-dedup, decontam) so every Observation counter fires
        # exactly once — exact lineage — and the span/shingle sides
        # share one materialization
        persist=True,
    )
    # ONE action drives the whole chain and every Observation
    n_out = res.docs.count()
    wall = time.monotonic() - t0
    # zero-extra-jobs lineage first (Observations; a chain with BOTH
    # self-referencing heavies can leave upstream counters empty — the
    # documented CollectMetrics re-instantiation limit), then the exact
    # per-stage counts off the pinned caches, timed separately
    stages_obs = res.report(run=False)
    t1 = time.monotonic()
    stages = res.report(exact=True)
    t_exact = time.monotonic() - t1
    res.unpersist()
    rss1 = _rss_mb()

    result = {
        "metric": "curate_full_chain_docs_per_sec",
        "value": round(n_input / wall, 1),
        "unit": "docs/sec",
        "n_input": n_input,
        "n_output": n_out,
        "wall_secs": round(wall, 1),
        "stage_survivors": stages,
        "stage_survivors_via_observations": stages_obs,
        "exact_report_secs": round(t_exact, 1),
        "stages": res.stages,
        "driver_rss_mb_before": round(rss0, 1),
        "driver_rss_mb_after": round(rss1, 1),
        "host_cpu_delivery_ops_per_sec": host_ops,
        "ts": datetime.now(timezone.utc).isoformat(),
        "config": "local[32], shuffle=64, driver 12g, persist=True",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

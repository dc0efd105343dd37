"""Scale evidence for the data-SELECTION family (round-4 additions):
quality-classifier scoring, DSIR histogram estimation + scoring, and
classifier training, over a synthetic 10^6-document corpus on
local[32].

What this demonstrates for the 100 TB story:
  * the classifier serve path and the DSIR scorer are pure projections
    (ZERO hash exchanges in the executed plans — asserted here, not
    just in PLANS.md) whose cost tracks scan+expression speed, with the
    weight vector riding the plan as one array literal;
  * the two DSIR distribution estimates are dim-bounded aggregates:
    output rows ≤ dim no matter the corpus size, so the driver collect
    is O(dim), never O(corpus) — driver RSS is recorded to prove it;
  * training runs on a SMALL labeled set by design (the row-UDF vector
    assembly never touches the corpus); its wall time at 10^4 labeled
    docs is recorded for context.

Corpus: the same deterministic xxhash64-seeded generator as
tools/bench_textquality_scale.py. Absolute numbers carry the documented
±50% co-tenant noise (BENCH/BASELINE.md); the busy-fleet CPU-delivery
probe is embedded so a reader can normalize.

Run: python tools/bench_selection_scale.py [n_docs] [out.json]
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


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, "BENCH", "selection_1m.json"))
    from bench import _host_delivery_probe
    from tools.bench_textquality_scale import corpus, final_plan

    host_ops = _host_delivery_probe(32)
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.textquality import (dsir_log_ratio_weights,
                                           dsir_scores,
                                           hashed_bucket_counts,
                                           quality_classifier_score,
                                           train_quality_classifier)

    docs = corpus(spark, n_docs)
    docs.write.mode("overwrite").parquet("/tmp/sel_scale_docs")
    docs = spark.read.parquet("/tmp/sel_scale_docs")
    rss0 = _rss_mb()

    # --- classifier serve path: dim=2^15 deterministic weights; the
    # avg() forces every row's score without shipping rows back
    dim = 2 ** 15
    w = [((b * 2654435761) % 2000) / 1000.0 - 1.0 for b in range(dim)]
    scored = quality_classifier_score(docs, "text", w, round_dp=None)
    t0 = time.monotonic()
    row = scored.agg(F.avg("q_prob").alias("avg"),
                     F.count("*").alias("n")).first()
    t_clf = time.monotonic() - t0
    clf_plan = final_plan(scored)
    assert "hashpartitioning(" not in clf_plan, "classifier plan shuffled"
    assert row["n"] == n_docs

    # --- DSIR: target = the 'en' slice (~20%); two dim-bounded
    # histograms collected to the driver, then the zero-shuffle scorer
    t0 = time.monotonic()
    wts = dsir_log_ratio_weights(
        hashed_bucket_counts(docs.filter(F.col("lang") == "en"),
                             "text", dim=dim),
        hashed_bucket_counts(docs, "text", dim=dim), dim=dim)
    t_hist = time.monotonic() - t0
    ds = dsir_scores(docs, "text", wts, round_dp=None)
    t0 = time.monotonic()
    drow = ds.agg(F.avg("dsir_score").alias("avg"),
                  F.count("*").alias("n")).first()
    t_ds = time.monotonic() - t0
    ds_plan = final_plan(ds)
    assert "hashpartitioning(" not in ds_plan, "dsir scorer shuffled"
    assert drow["n"] == n_docs

    # --- training on a 10^4-doc labeled slice (the intended scale for
    # the row-UDF vector assembly; the corpus path above never runs it)
    labeled = (docs.limit(10_000)
               .withColumn("y", (F.pmod(F.xxhash64("doc_id"), F.lit(2)))
                           .cast("int")))
    t0 = time.monotonic()
    model = train_quality_classifier(labeled, "text", "y",
                                     dim=2 ** 15, max_iter=10)
    t_train = time.monotonic() - t0

    result = {
        "metric": "selection_family_scale",
        "n_docs": n_docs,
        "host_mops_32": round(host_ops / 1e6, 1),
        "classifier_score": {
            "seconds": round(t_clf, 3),
            "docs_per_sec": round(n_docs / t_clf),
            "dim": dim,
            "hash_exchanges_in_plan": 0,
            "avg_prob": round(float(row["avg"]), 6),
        },
        "dsir": {
            "histograms_seconds": round(t_hist, 3),
            "score_seconds": round(t_ds, 3),
            "score_docs_per_sec": round(n_docs / t_ds),
            "dim": dim,
            "hash_exchanges_in_scoring_plan": 0,
            "avg_score": round(float(drow["avg"]), 6),
        },
        "train_10k_labeled_seconds": round(t_train, 3),
        "model_dim": model.dim,
        "driver_rss_mb_start": round(rss0, 1),
        "driver_rss_mb_end": round(_rss_mb(), 1),
        "ts": datetime.now(timezone.utc).isoformat(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

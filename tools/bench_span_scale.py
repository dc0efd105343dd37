"""Scale evidence for the round's new corpus ops: exact duplicated-span
removal (dedup.strip_duplicate_spans) and sequence packing
(shards.pack_sequences) over a synthetic 10^6-document corpus on
local[32].

What this demonstrates for the 100 TB story:
  * span removal's wide cost is ONE window exchange over the k-gram
    stream (~n_tokens rows of (id, pos, 16-byte hash)); everything
    after operates on flagged rows only. The measured docs/sec is the
    shape a 1000-executor run scales by partitions; the plan fact
    (exactly one _gh exchange) is asserted from the EXECUTED plan.
  * packing is one shard-keyed exchange + per-shard window cumsum —
    docs/sec should track scan speed.

Corpus: the textquality bench's deterministic vocab-draw docs, PLUS
planted duplication shaped like a real crawl — every 10th doc has an
exact copy and every 20th a first-token-dropped copy (both get fresh
ids above the base range), so ~15% of documents contain spans the op
must find and the answer is exactly predictable in expectation.

Run: python tools/bench_span_scale.py [n_docs] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def final_plan(df) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, "BENCH", "span_scale_1m.json"))
    from bench import _host_delivery_probe
    host_ops = _host_delivery_probe(32)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from bench_textquality_scale import corpus  # same deterministic docs
    from risjbot_spark.dedup import strip_duplicate_spans
    from risjbot_spark.shards import pack_sequences

    base = corpus(spark, n_docs).select("doc_id", "text")
    exact = (base.filter(F.col("doc_id") % 10 == 0)
             .select((F.col("doc_id") + 2 * n_docs).alias("doc_id"),
                     "text"))
    near = (base.filter(F.col("doc_id") % 20 == 0)
            .select((F.col("doc_id") + 4 * n_docs).alias("doc_id"),
                    F.expr("substring(text, instr(text, ' ') + 1)")
                    .alias("text")))
    docs = base.unionByName(exact).unionByName(near)
    docs.write.mode("overwrite").parquet("/tmp/span_scale_docs")
    docs = spark.read.parquet("/tmp/span_scale_docs")
    n_total = docs.count()

    # --- strip_duplicate_spans, k=8 — evaluate via the stats aggregate
    out = strip_duplicate_spans(docs, "doc_id", "text", k=8,
                                out_col="clean", with_stats=True)
    # plan facts must come from the query execution that actually RAN
    # (an un-executed DataFrame's plan is pre-AQE and can differ), so
    # aggregate and inspect the SAME DataFrame instance
    out_agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_tokens").alias("tok_in"),
        F.sum("n_dropped_tokens").alias("tok_dropped"),
        F.sum((F.col("n_dropped_tokens") > 0).cast("long"))
        .alias("docs_touched"))
    t0 = time.monotonic()
    agg = out_agg.collect()[0]
    t_span = time.monotonic() - t0
    plan = final_plan(out_agg)
    gh_exchanges = len(re.findall(r"hashpartitioning\(_gh", plan))

    # --- pack_sequences over the SAME corpus (token counts from text)
    pk = pack_sequences(docs, "doc_id", seq_len=2048, text_col="text",
                        n_shards=256)
    pk_agg = pk.agg(F.count("*").alias("n"),
                    F.max("seq_last").alias("max_seq"),
                    F.sum("n_tok").alias("tok"))
    t0 = time.monotonic()
    pagg = pk_agg.collect()[0]
    t_pack = time.monotonic() - t0
    pk_plan = final_plan(pk_agg)
    shard_exchanges = len(re.findall(r"hashpartitioning\(shard", pk_plan))

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    result = {
        "n_docs_base": n_docs,
        "n_docs_total": int(n_total),
        "span_strip": {
            "secs": round(t_span, 1),
            "docs_per_sec": round(n_total / t_span),
            "tokens_in": int(agg["tok_in"]),
            "tokens_dropped": int(agg["tok_dropped"]),
            "docs_touched": int(agg["docs_touched"]),
            "gram_stream_exchanges": gh_exchanges,
        },
        "pack_sequences": {
            "secs": round(t_pack, 1),
            "docs_per_sec": round(n_total / t_pack),
            "max_seqs_in_a_shard": int(pagg["max_seq"]) + 1,
            "tokens": int(pagg["tok"]),
            "shard_exchanges": shard_exchanges,
        },
        "driver_rss_mb": round(rss_mb, 1),
        "host_cpu_delivery_ops_per_sec": host_ops,
        "config": "local[32], shuffle.partitions=64, driver 8g",
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())

"""Scale evidence for the textquality family (round-4 additions): run
repetition_signals, decontaminate, quality_filter (the applied gate)
and mix_report over a synthetic 10^6-document corpus on local[32] and
record throughput + plan-shape facts.

What this demonstrates for the 100 TB story:
  * repetition_signals is a pure projection — docs/sec should track raw
    scan+expression speed and the plan carries ZERO hash exchanges;
  * decontaminate explodes ~(len-4) distinct 5-gram strings per doc
    (~7×10^7 rows at 10^6 docs) through ONE broadcast join and ONE
    id-keyed exchange — the measured shape a 1000-executor run scales
    by partitions.

The corpus is deterministic (xxhash64-seeded picks from a 200-word
vocabulary, 40-79 tokens/doc) — built entirely with JVM expressions, no
Python row funcs anywhere. The eval side for decontaminate is the
drop-first-token mutant of every 1000th doc (~0.1%, the realistic
benchmark-to-corpus ratio).

Absolute numbers carry the documented ±50% co-tenant noise (see
BENCH/BASELINE.md); the busy-fleet CPU-delivery probe is embedded so a
reader can normalize. Run: python tools/bench_textquality_scale.py
[n_docs] [out.json]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = [f"w{i:03d}" for i in range(200)]


def final_plan(df) -> str:
    """Executed-plan text, FINAL section only: after an action, AQE's
    toString appends an '== Initial Plan ==' section that duplicates
    every node — counting exchanges across both double-counts them."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def corpus(spark, n_docs: int):
    """Deterministic synthetic docs: 40-79 tokens drawn from VOCAB by
    xxhash64(id, position) — pure expressions, reproducible."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_toks = (F.pmod(F.xxhash64("id"), F.lit(40)) + 40).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_toks),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.xxhash64("id", j), F.lit(len(VOCAB))) + 1)
            .cast("int")))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        F.concat(F.lit("src"),
                 F.pmod(F.xxhash64("id", F.lit("s")), F.lit(50))
                 .cast("string")).alias("source"),
        F.element_at(F.array(*[F.lit(x) for x in
                               ("en", "de", "fr", "es", "zh")]),
                     (F.pmod(F.xxhash64("id", F.lit("l")), F.lit(5)) + 1)
                     .cast("int")).alias("lang"))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, "BENCH", "textquality_1m.json"))
    sys.path.insert(0, REPO)
    from bench import _host_delivery_probe
    host_ops = _host_delivery_probe(32)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from risjbot_spark.textquality import (boilerplate_lines,
                                           decontaminate, mix_report,
                                           pii_scrub, quality_filter,
                                           repetition_signals,
                                           strip_boilerplate)

    docs = corpus(spark, n_docs)
    docs.write.mode("overwrite").parquet("/tmp/tq_scale_docs")
    docs = spark.read.parquet("/tmp/tq_scale_docs")

    # --- repetition_signals: force full evaluation via an aggregate
    sig = repetition_signals(docs, "doc_id", "text")
    t0 = time.monotonic()
    sig_agg = sig.agg(
        F.avg("dup_ngram_frac").alias("avg_dup"),
        F.avg("top_token_frac").alias("avg_top"),
        F.count("*").alias("n")).first()
    t_sig = time.monotonic() - t0
    sig_plan = final_plan(sig)

    # --- decontaminate: eval = drop-first-token mutants of 0.1% of docs
    ev = (docs.filter(F.col("doc_id") % 1000 == 0)
          .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                  F.expr("substring(text, instr(text, ' ') + 1)")
                  .alias("text")))
    dc = decontaminate(docs, ev, "doc_id", "text", ngram=5)
    t0 = time.monotonic()
    n_contaminated = dc.count()
    t_dc = time.monotonic() - t0
    dc_plan = final_plan(dc)

    # --- quality_filter: the APPLIED gate — count survivors. The
    # threshold sits at the corpus' modal-token median so the gate
    # provably drops AND keeps documents.
    qf = quality_filter(docs, "text", max_top_token_frac=0.044)
    t0 = time.monotonic()
    n_kept = qf.count()
    t_qf = time.monotonic() - t0
    qf_plan = final_plan(qf)

    # --- mix_report: 50 sources × 5 langs = 250 groups
    mr = mix_report(docs, ["source", "lang"], "text")
    t0 = time.monotonic()
    mr_rows = mr.collect()
    t_mr = time.monotonic() - t0
    mr_plan = final_plan(mr)

    # --- strip_boilerplate: 51 boiler lines (one per source + one
    # global footer) over 10^6 multi-line docs; the unique tail line
    # must survive. sum(length) forces the cleaned text of EVERY row —
    # a bare count() would let Catalyst prune the removal expression.
    mdocs = docs.select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("text"),
            F.concat(F.lit("follow "), F.col("source"),
                     F.lit(" on social media for updates")),
            F.lit("Subscribe to our newsletter and never miss an update"),
            F.concat(F.lit("story-id "), F.col("doc_id").cast("string"),
                     F.lit(" unique trailing line"))).alias("text"))
    sb = strip_boilerplate(mdocs, "text", min_docs=1000)
    t0 = time.monotonic()
    sb_agg = sb.agg(F.sum(F.length("text")).alias("chars"),
                    F.count("*").alias("n")).first()
    t_sb = time.monotonic() - t0
    sb_plan = final_plan(sb)
    n_boiler = boilerplate_lines(mdocs, "text", min_docs=1000).count()

    # --- pii_scrub: email + IPv4 + intl phone appended to every doc;
    # the sums force both the scrubbed text and all three count columns
    pdocs = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or node 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +44 20 7946 0"),
            (F.col("doc_id") % 100).cast("string")).alias("text"))
    ps = pii_scrub(pdocs, "text")
    t0 = time.monotonic()
    ps_agg = ps.agg(F.sum(F.length("text")).alias("chars"),
                    F.sum("n_email").alias("e"),
                    F.sum("n_ipv4").alias("i"),
                    F.sum("n_phone").alias("p")).first()
    t_ps = time.monotonic() - t0
    ps_plan = final_plan(ps)

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    result = {
        "n_docs": n_docs,
        "host_cpu_delivery_ops_per_sec": host_ops,
        "repetition_signals": {
            "seconds": round(t_sig, 2),
            "docs_per_sec": round(n_docs / t_sig),
            "avg_dup_ngram_frac": round(sig_agg["avg_dup"], 6),
            "avg_top_token_frac": round(sig_agg["avg_top"], 6),
            "rows": sig_agg["n"],
            "plan_has_hash_exchange":
                "Exchange hashpartitioning" in sig_plan,
        },
        "decontaminate": {
            "seconds": round(t_dc, 2),
            "docs_per_sec": round(n_docs / t_dc),
            "n_eval_docs": n_docs // 1000,
            "n_contaminated": n_contaminated,
            "plan_broadcasts_eval": "BroadcastHashJoin" in dc_plan,
            "plan_corpus_hash_exchanges":
                dc_plan.count("Exchange hashpartitioning(doc_id"),
        },
        "quality_filter": {
            "seconds": round(t_qf, 2),
            "docs_per_sec": round(n_docs / t_qf),
            "n_kept": n_kept,
            "kept_frac": round(n_kept / n_docs, 4),
            "plan_has_hash_exchange":
                "Exchange hashpartitioning" in qf_plan,
        },
        "mix_report": {
            "seconds": round(t_mr, 2),
            "docs_per_sec": round(n_docs / t_mr),
            "n_groups": len(mr_rows),
            "plan_corpus_hash_exchanges":
                mr_plan.count("Exchange hashpartitioning(source"),
        },
        "strip_boilerplate": {
            "seconds": round(t_sb, 2),
            "docs_per_sec": round(n_docs / t_sb),
            "n_boiler_lines": n_boiler,
            "out_chars": sb_agg["chars"],
            "rows": sb_agg["n"],
            "plan_line_hash_exchanges":
                sb_plan.count("Exchange hashpartitioning(line"),
            "plan_corpus_hash_exchanges":
                sb_plan.count("Exchange hashpartitioning(doc_id"),
        },
        "pii_scrub": {
            "seconds": round(t_ps, 2),
            "docs_per_sec": round(n_docs / t_ps),
            "n_email": ps_agg["e"], "n_ipv4": ps_agg["i"],
            "n_phone": ps_agg["p"],
            "plan_has_hash_exchange":
                "Exchange hashpartitioning" in ps_plan,
        },
        "driver_rss_mb": round(rss_mb, 1),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

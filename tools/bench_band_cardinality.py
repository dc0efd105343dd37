"""Evidence for the similarity-band widening (r2 verdict ceiling #3):
at 10^6 synthetic docs, compare per-band bucket populations and
pair-block work for the old 8-bit bands (256 values) vs the new 15-bit
simhash bands / 16-bit embedding sign buckets.

The LSH band self-join materializes, per (band_idx, band_value) bucket,
a candidate block of n_b*(n_b-1)/2 pairs — total work ∝ sum(n_b²).
With B possible values and n uniform docs, sum(n_b²) ≈ n²/B: growing n
1000× grows the per-bucket blocks 10^6× unless B scales too. This
script measures exactly that, all JVM-side (xxhash64 fingerprints).

Run: python tools/bench_band_cardinality.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def bucket_stats(spark, n_docs: int, band_bits: int, n_bands: int) -> dict:
    """Per-band bucket stats for `n_bands` bands of `band_bits` bits over
    a uniform 60-bit fingerprint corpus."""
    vals = 1 << band_bits
    fp = spark.range(n_docs).select(
        (F.abs(F.xxhash64(F.col("id"))) % (2 ** 60)).alias("simhash"))
    bands = fp.select(F.posexplode(F.array(*[
        (F.shiftright("simhash", band_bits * i) % vals).cast("int")
        for i in range(n_bands)
    ])).alias("bi", "bv"))
    agg = (
        bands.groupBy("bi", "bv").agg(F.count("*").alias("n"))
        .agg(
            F.max("n").alias("max_bucket"),
            F.avg("n").alias("avg_bucket"),
            F.sum(F.col("n") * F.col("n")).alias("pair_work"),
            F.count("*").alias("n_buckets_used"),
        )
    ).first()
    return {
        "band_bits": band_bits,
        "n_bands": n_bands,
        "values_per_band": vals,
        "max_bucket": agg["max_bucket"],
        "avg_bucket": round(agg["avg_bucket"], 1),
        "sum_nsq_pair_work": int(agg["pair_work"]),
        "n_buckets_used": agg["n_buckets_used"],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_docs": n_docs, "configs": []}
    for bits, bands, label in [
        (8, 4, "r2 simhash bands (32-bit/4x8)"),
        (15, 4, "r3 simhash bands (60-bit/4x15)"),
        (8, 1, "r2 embedding sign bucket (8 planes)"),
        (16, 1, "r3 embedding sign bucket (16 planes)"),
    ]:
        t0 = time.monotonic()
        s = bucket_stats(spark, n_docs, bits, bands)
        s["label"] = label
        s["secs"] = round(time.monotonic() - t0, 1)
        out["configs"].append(s)
        print(f"{label}: max bucket {s['max_bucket']:,}, "
              f"avg {s['avg_bucket']:,}, pair work Σn² = "
              f"{s['sum_nsq_pair_work']:,}")
    r2, r3 = out["configs"][0], out["configs"][1]
    out["simhash_pair_work_ratio"] = round(
        r2["sum_nsq_pair_work"] / max(r3["sum_nsq_pair_work"], 1), 1)
    e2, e3 = out["configs"][2], out["configs"][3]
    out["emb_pair_work_ratio"] = round(
        e2["sum_nsq_pair_work"] / max(e3["sum_nsq_pair_work"], 1), 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale evidence for dedup_store.MinHashStore: the incremental claim
is that add_batch costs O(batch), not O(store) — a fixed-size batch
should cost ~the same against a 50k-doc store and an 800k-doc store
(the store side of the probe is a bucketed scan + join, no re-pairing,
no store-wide shuffle), while compaction (the only O(store) step) is
paid once per compact_every batches.

Protocol per store size N: fresh store, index_corpus(N synthetic docs)
[reported separately — bootstrap IS O(corpus)], then two timed
add_batch calls with a fixed 5k-doc batch (1% planted dups of stored
docs so the verify path runs), then one timed compaction. Deterministic
synthetic text: 25 md5-derived pseudo-words per doc, exact dups planted
by reusing a stored doc's generator id.

Writes BENCH/dedup_store_scale.json:
  {"points": [{"store_docs": N, "index_secs": ..., "add_secs": [a, b],
               "add_dups_found": ..., "compact_secs": ...,
               "driver_rss_mb": ...}], ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [50_000, 200_000, 800_000]
BATCH = 5_000
DUP_EVERY = 100          # 1% of batch docs duplicate a stored doc


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def synth_docs(spark, n: int, *, id_offset: int = 0,
               text_of=None):
    """n deterministic docs (doc_id, text): 25 pseudo-words derived
    from a generator id. text_of maps doc_id -> generator id (planted
    dups reuse a stored doc's generator id)."""
    from pyspark.sql import functions as F
    d = spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"), F.col("id").alias("g"))
    if text_of is not None:
        d = d.withColumn("g", text_of(F.col("doc_id"), F.col("g")))
    words = [F.md5(F.concat(F.col("g").cast("string"),
                            F.lit(f"|{w}"))).substr(1, 8)
             for w in range(25)]
    return d.select("doc_id", F.concat_ws(" ", *words).alias("text"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from risjbot_spark.dedup_store import MinHashStore

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dedup-store-scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    points = []
    for n in SIZES:
        root = tempfile.mkdtemp(prefix=f"mhstore_scale_{n}_")
        # compact_every high: isolate probe cost from the O(store)
        # compaction, which is timed separately below
        st = MinHashStore(spark, root, compact_every=1_000_000)
        corpus = synth_docs(spark, n).cache()
        corpus.count()
        t0 = time.monotonic()
        st.index_corpus(corpus, "doc_id", "text")
        index_secs = round(time.monotonic() - t0, 2)

        add_secs, dups = [], []
        for b in range(2):
            # 1% planted dups: generator id reuses a stored doc's
            dup = (lambda doc_id, g:
                   F.when(g % DUP_EVERY == 0,
                          F.pmod(g, F.lit(n))).otherwise(
                       g + n * (10 + b)))
            batch = synth_docs(spark, BATCH,
                               id_offset=n + BATCH * (b + 1) * 10,
                               text_of=dup).cache()
            batch.count()
            t0 = time.monotonic()
            out = st.add_batch(batch, "doc_id", "text",
                               corpus_df=corpus)
            add_secs.append(round(time.monotonic() - t0, 2))
            # per-batch, not overwritten: the evidence must show the
            # verify path found the planted dups during EVERY timed add
            dups.append(out["decisions"].filter("NOT kept").count())
        t0 = time.monotonic()
        st._compact()
        compact_secs = round(time.monotonic() - t0, 2)
        stored = st.n_stored_docs()
        st.close()
        pt = {"store_docs": n, "index_secs": index_secs,
              "add_secs": add_secs, "add_dups_found": dups,
              "stored_after": stored,
              "compact_secs": compact_secs, "driver_rss_mb": _rss_mb()}
        points.append(pt)
        print(pt, flush=True)
        shutil.rmtree(root, ignore_errors=True)
        corpus.unpersist()

    out = {"batch_docs": BATCH, "dup_fraction": 1.0 / DUP_EVERY,
           "cpus": cpus, "points": points,
           "claim": "add_batch cost is ~flat in store size (O(batch) "
                    "probe against the bucketed base); index/compact "
                    "are the O(store) steps, paid once / per cadence"}
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "dedup_store_scale.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

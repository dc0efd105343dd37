"""risjbot_spark — a from-scratch PySpark-native news-crawl analytics engine.

Capabilities mirror pmyteh/RISJbot (reference at /root/reference, studied
behaviorally — no code copied): URL-frontier management with seen-set dedup
and refetch control, per-host politeness + robots obedience, feed/sitemap
frontier sources, per-site article extraction with metadata batteries
(HTML meta / JSON-LD / schema.org / OpenGraph / Dublin Core / readability
fallback), NLP enrichment (wordcount, sentiment, reading age, named people),
and JSONLines/table sinks — all re-expressed as idiomatic Spark DataFrame
dataflow (Catalyst-optimized joins/windows/aggregations + vectorized
pandas/Arrow UDFs where DOM work is unavoidable).

Layout:
  html/      pure-stdlib HTML DOM + mini-XPath engine (no lxml in container)
  extract/   extraction semantics module — shared by the pandas UDFs AND the
             pytest oracle, so byte-identity is by construction
  frontier/  seen-set state machine, politeness scheduler, bloom pre-filter
  sources/   RSS/Atom/sitemap/CSV/URL-list frontier sources
  store/     parquet+manifest snapshot tables (Iceberg-semantics stand-in:
             the container ships no Iceberg runtime jar; production target
             is Iceberg MERGE/snapshots, same interface)
  crawl.py   the round-based crawl pipeline (one round = one commit)
  corpus.py  deterministic synthetic Common-Crawl-style pages corpus
  dedup.py   training-data dedup library over arbitrary DataFrames
             (exact / MinHash+LSH / SimHash / embedding near-dup,
             connected-components clustering, survivor selection)
  dedup_store.py  incremental cross-batch dedup: persisted MinHash
             signature store (bucketed base + delta/compaction LSM),
             new batches dedup vs the curated corpus in O(batch)
  ann.py     similarity-search library (brute cosine, sign-LSH,
             Lloyd k-means IVF build/search, kNN vote)
  ann_store.py  incremental IVF vector store: persisted k-means index,
             assignment-only adds, partition-pruned probe scans,
             imbalance-driven rebuild
"""

__version__ = "0.1.0"

"""Seen-set / refetch state machine as DataFrame dataflow.

Reimplements the reference's RefetchControl rules
(/root/reference/RISJbot/spmiddlewares/refetchcontrol.py) on a columnar
`seen` table — the crawl's core join (SURVEY.md §2.3 J1-J3):

  J1 seen_filter      _process_request   (refetchcontrol.py:227-279)
  J2 merge_seen       _process_item      (refetchcontrol.py:281-316)
  J3 trawl/trim       spider_idle        (refetchcontrol.py:132-195)

Scale notes (the 100 TB story):
  * J1 is an equi join on url_hash — hash-partitioned both sides; AQE
    converts to broadcast when the frontier round is small. The bloom
    pre-filter (frontier.bloom) removes definite-new URLs *before* this
    shuffle.
  * J2 is expressed as union + hash aggregation (map-side combinable)
    rather than a full-outer join — one shuffle, no join, and exactly the
    Iceberg `MERGE INTO ... WHEN MATCHED UPDATE fetches+1` in SQL form.
  * All time arithmetic uses a round timestamp passed as a LITERAL —
    never current_timestamp() inside distributed expressions — so rounds
    are deterministic and resumable (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RefetchConfig:
    """Defaults mirror settings.py:130-135 (8 fetches, ≥3h apart)."""
    maxfetches: int = 8
    refetchsecs: int = 10800
    agelimit: int = 0  # 0 → maxfetches * refetchsecs (refetchcontrol.py:56-57)
    refetchfromdb: bool = True
    trimdb: bool = True

    @property
    def age_limit_secs(self) -> int:
        return self.agelimit or (self.maxfetches * self.refetchsecs)


def _age_secs(round_ts: datetime):
    return lambda col: F.lit(round_ts).cast("timestamp").cast("long") - col.cast("long")


def seen_filter(
    frontier: DataFrame, seen: DataFrame, cfg: RefetchConfig, round_ts: datetime
) -> DataFrame:
    """J1 — the skip-before-fetch join. Keeps frontier rows that are
    first fetches, or refetch-eligible; annotates `previousfetches`.

    Predicate order matches _process_request: drop when
    fetches >= maxfetches OR age < refetchsecs OR age > agelimit."""
    age = _age_secs(round_ts)
    j = frontier.join(
        seen.select("url_hash", "fetches", "last_fetch"), "url_hash", "left_outer"
    )
    first_fetch = F.col("fetches").isNull()
    refetch_ok = (
        (F.col("fetches") < cfg.maxfetches)
        & (age(F.col("last_fetch")) >= cfg.refetchsecs)
        & (age(F.col("last_fetch")) <= cfg.age_limit_secs)
    )
    return (
        j.filter(first_fetch | refetch_ok)
        .withColumn("previousfetches", F.coalesce(F.col("fetches"), F.lit(0)).cast("int"))
        .drop("fetches", "last_fetch")
    )


def seen_updates(fetched: DataFrame, round_ts: datetime) -> DataFrame:
    """One round's seen-table delta: (url_hash, url, host, 1, round_ts)
    per fetched key. This is the merge-on-read write unit — O(round
    keys), never O(table)."""
    return (
        fetched.select(
            "url_hash",
            F.col("url_canon").alias("url"),
            "host",
            F.lit(1).cast("int").alias("fetches"),
            F.lit(round_ts).cast("timestamp").alias("last_fetch"),
        )
        .dropDuplicates(["url_hash"])  # one fetch per key per round
    )


def seen_state(rows: DataFrame) -> DataFrame:
    """Resolve (base ∪ deltas) rows into current per-key state — the
    merge-on-read view. Associative and idempotent (a compacted base is
    a fixed point), so it applies uniformly whether the table holds one
    compacted snapshot or base + K round deltas. Ties cannot occur on
    last_fetch across deltas (round timestamps strictly increase) so
    max_by is deterministic."""
    return (
        rows.groupBy("url_hash")
        .agg(
            F.max_by("url", "last_fetch").alias("url"),
            F.max_by("host", "last_fetch").alias("host"),
            F.sum("fetches").cast("int").alias("fetches"),
            F.max("last_fetch").alias("last_fetch"),
        )
        .select("url_hash", "url", "host", "fetches", "last_fetch")
    )


def merge_seen(
    seen: DataFrame, fetched: DataFrame, round_ts: datetime
) -> DataFrame:
    """J2 — fetch-history upsert: `INSERT OR REPLACE ... fetches+1, now()`
    (refetchcontrol.py:302-313) as a single hash aggregation — the
    compaction path (copy-on-write form of the MERGE).

    Iceberg SQL equivalent (production):
      MERGE INTO seen s USING fetched f ON s.url_hash = f.url_hash
      WHEN MATCHED THEN UPDATE SET fetches = s.fetches + 1, last_fetch = :ts
      WHEN NOT MATCHED THEN INSERT (url_hash, url, host, fetches, last_fetch)
      VALUES (f.url_hash, f.url_canon, f.host, 1, :ts)
    """
    return seen_state(seen.unionByName(seen_updates(fetched, round_ts)))


def trawl_candidates(
    seen: DataFrame, cfg: RefetchConfig, round_ts: datetime
) -> DataFrame:
    """J3a — idle re-trawl: rows with cutoffold < last_fetch <= cutofft
    and fetches < maxfetches get rescheduled (refetchcontrol.py:152-179)."""
    if not cfg.refetchfromdb:
        return seen.limit(0)
    age = _age_secs(round_ts)
    return seen.filter(
        (age(F.col("last_fetch")) >= cfg.refetchsecs)
        & (age(F.col("last_fetch")) < cfg.age_limit_secs)
        & (F.col("fetches") < cfg.maxfetches)
    )


def trim_seen(
    seen: DataFrame, requested: DataFrame, cfg: RefetchConfig, round_ts: datetime
) -> DataFrame:
    """J3b — state compaction: delete rows too old to refetch that were
    not requested this run (refetchcontrol.py:180-193; the VACUUM becomes
    snapshot replacement). left_anti = `key not in keysrqd`."""
    if not cfg.trimdb:
        return seen
    age = _age_secs(round_ts)
    stale = F.col("_stale")
    marked = seen.withColumn(
        "_stale", age(F.col("last_fetch")) >= cfg.age_limit_secs
    )
    keep_fresh = marked.filter(~stale)
    stale_requested = (
        marked.filter(stale)
        .join(requested.select("url_hash").distinct(), "url_hash", "left_semi")
    )
    return keep_fresh.unionByName(stale_requested).drop("_stale")

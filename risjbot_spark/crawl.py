"""The round-based crawl pipeline (SURVEY.md §3 "Spark redesign").

One crawl round = one batch dataflow ending in snapshot commits:

  seeds/trawl → canonicalize (JVM exprs) → robots filter (broadcast rules)
  → bloom pre-filter → seen anti-join (J1) → politeness window (W1/W3)
  → salted-host repartition → fetch (corpus join here; HTTP mapInPandas in
  production) → extract_article pandas UDF (incl. fake404/NLP) → MERGE
  seen (J2) → append articles → lineage → commit = resumable checkpoint.

The reference runs this as an event loop over one process + sqlite
(/root/reference/RISJbot/settings.py middleware order; SURVEY.md §3); here
every arrow is a DataFrame op Catalyst can push down / reorder / broadcast,
and the round loop is the only driver-side control flow.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frontier.bloom import PartitionedBloom
from .frontier.politeness import (
    build_rules_map,
    fetch_order_key,
    host_budgets,
    host_budgets_df,
    parse_rules_df,
    politeness_schedule,
    robots_filter,
    robots_filter_df,
    salted_repartition,
)
from .frontier.state import (
    RefetchConfig,
    merge_seen,
    seen_filter,
    seen_state,
    seen_updates,
    trawl_candidates,
    trawl_candidates_pruned,
    trim_seen,
)
from .schema import HTTP_DATE_FMT, SEEN_SCHEMA
from .store import SnapshotTable
from .udfs import extract_article_udf
from .urlnorm import with_canonical


def _footer_row_counts(data_dir: str) -> dict:
    """Per-write-task row counts from the parquet footers of one commit
    dir — driver-side metadata reads, NO Spark job. File names carry the
    writing task's partition id (part-00007-<uuid>...), so this
    reproduces the old groupBy(spark_partition_id()) per-partition
    lineage exactly for non-empty partitions (empty partitions write no
    data file and were absent from the groupBy output too; the schema
    placeholder file of an all-empty commit has num_rows=0 and is
    skipped)."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(data_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            try:
                pid = int(fn.split("-")[1])
            except (IndexError, ValueError):
                continue
            n = pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
            if n:
                out[str(pid)] = out.get(str(pid), 0) + n
    return out


@dataclass(frozen=True)
class CrawlConfig:
    refetch: RefetchConfig = field(default_factory=RefetchConfig)
    default_budget: int = 1_000_000      # per-host per-round cap (W3)
    round_seconds: int = 3600            # politeness budget horizon
    num_partitions: int = 32
    salt: int = 0                 # >0 → salted-host fetch layout (HTTP mode)
    # Scale-backend selection (the four flags below): every flag accepts
    # an explicit value as an override, but the DEFAULT is auto — the
    # engine picks the 100×-safe backend from observed scale (bloom key
    # count vs a driver budget, frontier rows vs a broadcast budget,
    # robots host count) and records each choice + the evidence in
    # `engine.backend_choices`. A 10^10-frontier run that keeps the
    # defaults therefore gets the table bloom / SMJ fetch / DataFrame
    # robots path WITHOUT asking; the sandbox-scale defaults resolve to
    # the broadcast/driver fast paths. (r3 verdict item #3: the manual
    # flags were the last way to OOM the driver by default.)
    broadcast_frontier: bool | None = None   # None → auto per round
    use_bloom: bool = True
    # "driver": PartitionedBloom — bitmaps in a driver dict, broadcast
    #   probe; right while the filter fits comfortably in driver memory.
    # "table": DistributedBloomTable — bitmaps as a bucket-keyed parquet
    #   table, built/merged/probed distributed; the 10^10-key path (the
    #   driver holds only n_buckets/m/n_keys). Output-identical
    #   (parity-tested); per-round cost adds one small Spark job.
    # "cuckoo": PartitionedCuckoo (frontier/cuckoo.py) — the north_star's
    #   literal filter: driver-resident fingerprint tables that support
    #   DELETION, so trim rounds remove trimmed keys from the filter
    #   exactly instead of leaving false-positive fodder until a
    #   rebuild. Explicit opt-in only (auto picks driver/table); size
    #   cuckoo_slots_per_bucket for the expected live keys.
    # "auto": driver below driver_bloom_max_keys expected keys, table at
    #   or above it; a driver-backed warehouse that outgrows the budget
    #   is promoted to the table backend at the next engine construction
    #   (rebuild from the seen snapshot — durable, one-time).
    bloom_backend: str = "auto"
    # cuckoo geometry: slots/shard (power of two; ×4 16-bit lanes each).
    # Capacity ≈ n_buckets × slots × 4 × 0.84 live keys before the
    # overfull() grow-4× rebuild.
    cuckoo_slots_per_bucket: int = 1 << 13
    # partition-aligned bloom probe (bucket-shipped bitmaps via cogroup)
    # instead of broadcasting the whole filter — for when the filter
    # outgrows what executors can hold broadcast (the table backend
    # always probes aligned). None → auto: aligned once the driver
    # filter's bitmap bytes exceed bloom_broadcast_max_bytes.
    bloom_aligned_probe: bool | None = None
    # auto-mode thresholds. driver_bloom_max_keys: a driver bloom at
    # ~10 bits/key costs n_keys×1.25 B broadcast every round — 20M keys
    # ≈ 25 MB is comfortable, 10^8+ belongs in the table.
    driver_bloom_max_keys: int = 20_000_000
    # frontier rows above which the fetch join stops broadcasting the
    # scheduled side (~100 B/row → 1M rows ≈ 100 MB per-round broadcast;
    # beyond that the SMJ on the bucketed pages side wins — the shape
    # scale_path_10m benched).
    broadcast_frontier_max_rows: int = 1_000_000
    bloom_broadcast_max_bytes: int = 64 << 20
    # robots host count at which rules stop being a driver dict
    robots_scale_hosts: int = 200_000
    bloom_buckets: int = 64
    bloom_bits_per_bucket: int = 1 << 18  # adaptive: grows 4× when full
    trim_every: int = 4                  # J3b cadence (rounds)
    # snapshot retention: expire seen snapshots beyond the newest K after
    # each compaction (SURVEY §4 maintenance action; 0 → keep forever).
    # Generous default so time-travel resume stays available across
    # recent rounds; the checkpoint a rollback targets must still exist.
    expire_keep_last: int = 8
    collect_lineage: bool = True
    # S6 link following: discovered outlinks feed the next round's frontier
    follow_links: bool = False
    link_allow: str = ""                 # regex; empty → allow all
    link_deny: str = ""                  # regex; empty → deny none
    # W1+ link-graph prioritization (frontier/rank.py): each committed
    # round appends its outlink edges to <warehouse>/link_edges; every
    # link_rank_every rounds the engine recomputes fixed-point PageRank
    # over the accumulated graph into <warehouse>/link_ranks; subsequent
    # frontiers merge authority into `priority` —
    # greatest(existing, rank div link_rank_unit) — so hand-pinned
    # spider priorities still win while unpinned URLs schedule by global
    # authority. Per-round cost: one O(round-outlinks) append + one
    # rank-keyed left join on the deduped frontier; the rank job itself
    # is edge-list-sized and runs only on the cadence. Ranks are
    # advisory state: a crash mid-refresh leaves no _SUCCESS marker and
    # the next round simply schedules without authority.
    link_rank: bool = False
    link_rank_every: int = 1             # rank-refresh cadence (rounds)
    link_rank_iterations: int = 3
    link_rank_unit: int = 10_000         # rank mass per priority point
    link_rank_checkpoint_dir: str = ""   # reliable ckpt for rank iters
    # robots/budget scale path: keep parsed rules in a DataFrame joined
    # on host instead of a driver dict + plan literal. Output-identical
    # (parity-tested); needed when hosts outgrow driver memory
    # (10^6-10^8 hosts — a 10^10-URL frontier). None → auto by host
    # count (robots_scale_hosts); the dict path broadcasts once and
    # skips a join at sandbox host counts.
    robots_scale_path: bool | None = None
    # J3a via manifest-stat/partition pruning instead of resolving the
    # whole seen table each round (output-identical; parity-tested)
    pruned_trawl: bool = True
    # compact the seen base BUCKETED by url_hash (Iceberg bucket(N,col)
    # transform; day partitions kept for the trawl). The J1 gate and the
    # MoR resolve then run SPLIT — frontier × bucketed base with no
    # exchange on the base side + a small resolved-delta join — instead
    # of an O(table) groupBy+shuffle every round. Output-identical
    # (parity-tested); plan-asserted in tests.
    bucket_seen_base: bool = True
    seen_buckets: int = 32
    # S8 comment chase: when set (and a comments_api is injected into
    # the engine), pages on this host get their viafoura threads chased
    # before the articles commit — dropped/failed/ok semantics exactly
    # as the reference spider (comments.py). Bounded API parallelism +
    # optional inter-chase delay stand in for Scrapy's per-domain
    # download slot.
    comments_host: str = ""
    comments_site: str = "www.liverpoolecho.co.uk"
    comments_limit: int = 100
    comments_parallelism: int = 4
    comments_delay_secs: float = 0.0
    # pages-table canonicalization contract. None → infer: a table
    # carrying a `page_url` column is treated as already canonicalized
    # at ingest (bucketing.write_bucketed_pages' contract — re-deriving
    # the key through expressions would discard the bucket spec and
    # force the fetch join to shuffle the pages side). True → REQUIRE
    # page_url (raise if absent). False → always canonicalize `url`,
    # even when an unrelated page_url column happens to exist — set
    # this when your corpus has its own page_url with different
    # semantics.
    pages_precanonicalized: bool | None = None
    # corpus-join dedup contract: the per-round survivor dedup exchanges
    # the html-bearing join output (corpus-sized when a round fetches
    # everything). True declares the pages table holds exactly ONE row
    # per canonical URL (dedup happened at ingest — the production shape
    # for a bucketed CC table), skipping that shuffle; output-identical
    # under the guarantee. False (default) keeps the engine-side dedup.
    pages_unique_per_url: bool = False


class CrawlEngine:
    """Crawl over a Common-Crawl-style pages table.

    `pages` carries the fetchable universe (url, warc_ts, html, ...); the
    fetch stage joins against it — in a live deployment pass `fetcher`
    (a `url -> (status, body, date_header)` callable) and the engine runs
    the paced `fetch_stage` mapInPandas over the same salted layout
    instead; both modes share every other stage and produce the same
    output contract."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        pages: DataFrame | None,
        robots: DataFrame | None,
        cfg: CrawlConfig | None = None,
        fetcher=None,
        comments_api=None,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.fetcher = fetcher
        self._round_caches: list = []   # per-round persists, see run_round
        self._rules_bc = None           # robots dict Broadcast, built once
        # scale-backend auto-selection audit trail: each resolved flag
        # lands here as {"value", "auto", "why"} — tests and operators
        # read it to see WHICH backend ran and on what evidence
        self.backend_choices: dict[str, dict] = {}
        # per-round broadcast evidence: the previous round's frontier
        # row count (ridden off lineage/Observations — no extra job)
        self._last_frontier_rows: int | None = None
        # S8: comment-API chase — injectable `api(method, url) -> dict`
        # (comments.urllib_api for live deployments). Bootstrap runs
        # ONCE per engine, driver-side, like the reference's
        # start_requests gate; a failed bootstrap crawls without
        # comments (liverpoolecho.py:42-47).
        self.comments_api = comments_api
        self._comments_site_uuid = None
        if comments_api is not None and self.cfg.comments_host:
            from .comments import bootstrap_site_uuid

            self._comments_site_uuid = bootstrap_site_uuid(
                comments_api, self.cfg.comments_site)
        if pages is None and fetcher is None:
            raise ValueError("need a pages corpus or a fetcher")
        # the engine's determinism contract (literal round timestamps,
        # lf_day partition values, oracle parity) assumes UTC session
        # time: to_date()/date arithmetic silently use the session zone,
        # so a non-UTC session would shift day partitions and window
        # bounds. Fail loudly rather than compute wrong trawls.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise RuntimeError(
                f"CrawlEngine requires spark.sql.session.timeZone=UTC "
                f"(got {tz!r}): set it on the SparkSession builder")
        self.seen_table = SnapshotTable(spark, warehouse, "seen")
        self.articles_table = SnapshotTable(spark, warehouse, "articles")
        # pages keyed by canonical URL once, up front (column-pruned scan).
        # A table already carrying page_url (bucketing.write_bucketed_pages
        # canonicalized at ingest) is used AS-IS: re-deriving the key
        # through expressions would discard the bucket spec and force the
        # fetch join to shuffle the pages side.
        pre = self.cfg.pages_precanonicalized
        if pages is None:
            self.pages = None
        elif pre is True and "page_url" not in pages.columns:
            raise ValueError(
                "pages_precanonicalized=True but the pages table has no "
                "page_url column — ingest it with "
                "bucketing.write_bucketed_pages (or pass "
                "pages_precanonicalized=False/None)")
        elif pre is not False and "page_url" in pages.columns:
            self.pages = pages.select("page_url", "warc_ts", "html")
        else:
            self.pages = with_canonical(pages).select(
                F.col("url_canon").alias("page_url"), "warc_ts", "html")
        self.rules_df = None
        self.budgets_df = None
        self._max_budget: int | None = None
        # robots backend: explicit override, else count hosts — the dict
        # path collects EVERY host's rules to the driver (build_rules_map)
        # so the count job is strictly cheaper than what it prevents
        if self.cfg.robots_scale_path is not None:
            robots_scale = self.cfg.robots_scale_path
            self.backend_choices["robots_scale_path"] = {
                "value": robots_scale, "auto": False, "why": "explicit"}
        elif robots is None:
            robots_scale = False
            self.backend_choices["robots_scale_path"] = {
                "value": False, "auto": True, "why": "no robots table"}
        else:
            n_hosts = robots.count()
            robots_scale = n_hosts >= self.cfg.robots_scale_hosts
            self.backend_choices["robots_scale_path"] = {
                "value": robots_scale, "auto": True,
                "why": (f"{n_hosts} robots hosts vs threshold "
                        f"{self.cfg.robots_scale_hosts}")}
        if robots is not None and robots_scale:
            # scale path: rules stay distributed — parse once per host
            # (persisted so the parse runs once per engine, not per
            # round), budgets join on host. The only driver-side scalar
            # is max(budget), one agg at init for the presplit decision.
            self.rules_map = {}
            self.budgets = {}
            self.rules_df = parse_rules_df(robots).persist()
            self.budgets_df = host_budgets_df(
                self.rules_df, self.cfg.round_seconds)
            row = self.budgets_df.agg(F.max("budget")).first()
            self._max_budget = max(self.cfg.default_budget, row[0] or 0)
        else:
            self.rules_map = build_rules_map(robots) if robots is not None else {}
            self.budgets = host_budgets(
                self.rules_map, self.cfg.round_seconds, self.cfg.default_budget
            )
        # seen-table format gate: deltas switched from +1 increments to
        # RESOLVED rows (latest-wins). An increment-format warehouse
        # would silently resolve to wrong fetch counts under the new
        # seen_state, so refuse it loudly instead.
        self._check_seen_format()
        # crash recovery BEFORE bloom setup: if a prior run died between
        # the articles commit and the seen commit, roll the round forward
        self._recover_incomplete_round()
        # bloom: reload from checkpoint; rebuild from the seen snapshot when
        # missing OR when the checkpoint was taken against a different seen
        # snapshot (time-travel resume / rollback). A bloom MISSING seen
        # keys is a correctness bug — false negatives bypass the
        # authoritative join and re-fetch early — so staleness in either
        # direction forces a rebuild; empty table → empty filter.
        self._bloom_dir = os.path.join(warehouse, "bloom")
        # W1+ link-graph state (config link_rank): the edge log and the
        # latest rank snapshot live beside the other warehouse tables
        self._link_edges_dir = os.path.join(warehouse, "link_edges")
        self._link_ranks_dir = os.path.join(warehouse, "link_ranks")
        self.bloom = None
        self.bloom_backend = self._resolve_bloom_backend()
        if self.cfg.use_bloom:
            cur = self.seen_table.current_snapshot_id()
            if self.bloom_backend == "table":
                from .frontier.bloom_table import DistributedBloomTable

                loaded = (self._preloaded_bloom
                          if isinstance(self._preloaded_bloom,
                                        DistributedBloomTable)
                          else DistributedBloomTable.load(
                              spark, self._bloom_dir))
                if (loaded is not None
                        and self._bloom_marker() == (cur, "table")):
                    self.bloom = loaded
                elif loaded is not None:
                    # stale vs the seen snapshot (rollback/time travel):
                    # rebuild IN PLACE — next version on the same table,
                    # grown size kept, old versions GC'd by the commit
                    loaded.rebuild_from(self.seen().select("url_hash"))
                    self.bloom = loaded
                    # the rebuild is DURABLE (unlike the driver backend's
                    # in-memory one): stamp the marker now, or every
                    # later engine construction that doesn't reach a
                    # round commit repeats the full seen scan + version
                    # rewrite
                    self._write_bloom_marker()
                else:
                    # fresh table sized for the keys it is about to hold
                    # (auto promotion knows the driver checkpoint's
                    # n_keys / the seen count — arriving saturated would
                    # burn grow-4x rebuilds immediately)
                    self.bloom = DistributedBloomTable(
                        spark, self._bloom_dir, self.cfg.bloom_buckets,
                        self._bloom_bits_for(self._bloom_est_keys,
                                             self.cfg.bloom_buckets))
                    if cur is not None:
                        self.bloom.rebuild_from(
                            self.seen().select("url_hash"))
                        self._write_bloom_marker()
            elif self.bloom_backend == "cuckoo":
                from .frontier.cuckoo import PartitionedCuckoo

                loaded = PartitionedCuckoo.load(self._bloom_dir)
                self.bloom = loaded
                if (self.bloom is not None
                        and self._bloom_marker() != (cur, "cuckoo")):
                    self.bloom = None
                if self.bloom is None:
                    # a stale checkpoint's grown geometry is still the
                    # right geometry (same rationale as the bloom reload)
                    nb = (loaded.n_buckets if loaded
                          else self.cfg.bloom_buckets)
                    slots = (loaded.slots if loaded
                             else self.cfg.cuckoo_slots_per_bucket)
                    if cur is not None:
                        # size to the keys about to be inserted (the
                        # table branch's _bloom_bits_for rationale): a
                        # default-geometry build over a big existing
                        # seen table would stash millions of keys on
                        # the driver and burn grow-4× rebuilds
                        n = self.seen().count()
                        slots = self._cuckoo_slots_for(n, nb, slots)
                        self.bloom = PartitionedCuckoo.from_seen(
                            self.seen().select("url_hash"), nb, slots)
                    else:
                        self.bloom = PartitionedCuckoo(nb, slots)
            else:
                loaded = (self._preloaded_bloom
                          if isinstance(self._preloaded_bloom,
                                        PartitionedBloom)
                          else PartitionedBloom.load(self._bloom_dir))
                self.bloom = loaded
                if (self.bloom is not None
                        and self._bloom_marker() != (cur, "driver")):
                    self.bloom = None
                if self.bloom is None:
                    # a stale checkpoint's SIZE is still the right size:
                    # the filter grew adaptively to fit this table, and
                    # rebuilding at the small configured default would
                    # produce a saturated (useless) filter that burns a
                    # full seen scan per 4x re-growth step
                    nb = loaded.n_buckets if loaded else self.cfg.bloom_buckets
                    m = loaded.m if loaded else self.cfg.bloom_bits_per_bucket
                    self.bloom = PartitionedBloom(nb, m)
                    if cur is not None:
                        self.bloom.add_df(self.seen().select("url_hash"))
        # link-following resume: the last committed articles delta seeds
        # discovered_frontier() so a resumed run's first round still
        # unions the previous invocation's outlinks
        a_man = self.articles_table.manifest()
        if a_man is not None and a_man["files"]:
            self.last_delta_dir = a_man["files"][-1]

    SEEN_FORMAT = 2   # 1 = increment deltas (sum-resolve); 2 = resolved rows

    def _check_seen_format(self) -> None:
        man = self.seen_table.manifest()
        if man is None:
            return
        fmt = man.get("lineage", {}).get("seen_format", 1)
        if fmt != self.SEEN_FORMAT:
            raise RuntimeError(
                f"seen table at {self.seen_table.dir} was written in "
                f"format {fmt} (increment deltas); this engine writes "
                f"format {self.SEEN_FORMAT} (resolved rows) and cannot "
                f"resolve mixed history — recrawl into a fresh warehouse "
                f"or compact with the old engine version first")

    def _recover_incomplete_round(self) -> None:
        """Roll-forward recovery for the round's two-commit sequence.

        run_round commits articles FIRST (carrying round + round_ts in
        its manifest — the write-ahead record), then seen (carrying the
        SAME round_ts). A crash in between leaves the articles commit's
        round_ts absent from seen: on resume the URLs would count as
        unfetched, get re-fetched, and append a duplicate delta.

        The round_ts TOKEN, not the round ordinal, detects the gap —
        ordinals restart at 0 when a warehouse is reused across
        invocations, which masked a crash in the second invocation's
        round 0 (old s_round=2 >= new a_round=0). The gap must be
        exactly one articles commit (seen's token == the parent articles
        commit's token); a wider or asymmetric divergence cannot be
        repaired by replaying one delta, so it raises instead of
        silently corrupting fetch counts. Replaying the delta is
        idempotent (resolved rows + latest-wins resolution).

        Known limitation: if the crashed round was a COMPACTION round,
        recovery restores the STATE (the delta) but not the round's
        maintenance — trim_seen needs the scheduled-key set, which is
        not persisted. Stale keys the crashed round would have trimmed
        survive until the next compaction round (round numbering resumes
        from the warehouse, so that round arrives on cadence); deletion
        timing is maintenance, not state semantics."""
        a_man = self.articles_table.manifest()
        if a_man is None:
            return
        a_round = a_man.get("lineage", {}).get("round")
        a_ts = a_man.get("lineage", {}).get("round_ts")
        if a_round is None or a_ts is None:
            return
        s_man = self.seen_table.manifest()
        s_ts = (s_man or {}).get("lineage", {}).get("round_ts")
        if s_ts == a_ts:
            return                      # both commits landed
        prev_man = (self.articles_table.manifest(a_man["parent"])
                    if a_man.get("parent") is not None else None)
        prev_ts = (prev_man or {}).get("lineage", {}).get("round_ts")
        if s_ts != prev_ts:
            raise RuntimeError(
                f"seen/articles diverged by more than one commit "
                f"(seen round_ts={s_ts!r}, articles parent "
                f"round_ts={prev_ts!r}); roll both tables back to a "
                f"matching snapshot pair before resuming")
        delta_dir = a_man["files"][-1]
        fetched_keys = self.spark.read.parquet(delta_dir).select(
            "url_hash", "url_canon", "host", "previousfetches")
        self.seen_table.commit(
            seen_updates(fetched_keys, datetime.fromisoformat(a_ts)),
            lineage={"round": a_round, "round_ts": a_ts,
                     "recovered": True, "seen_format": self.SEEN_FORMAT},
            mode="append",
            stats={"last_fetch_range": [a_ts, a_ts]},
        )

    def _resolve_bloom_backend(self) -> str:
        """Pick "driver" vs "table" for bloom_backend="auto".

        Evidence, cheapest first: an existing TABLE checkpoint is sticky
        (its bitmaps are already distributed; demoting would pull them
        into the driver for nothing); a driver checkpoint knows its own
        n_keys from meta; otherwise an empty seen table means zero keys,
        and only a non-empty table with no checkpoint at all pays a
        one-time count — which the subsequent rebuild scans anyway.
        A driver-backed warehouse whose keys crossed the budget resolves
        to "table" here: the table path then finds no table checkpoint,
        rebuilds from the seen snapshot once (durable), and the marker
        records the promotion. Whatever checkpoint this method loads is
        stashed (_preloaded_bloom) so __init__ reuses the object instead
        of paying a second full bitmap read, and the key-count evidence
        is kept (_bloom_est_keys) so fresh table construction can size
        its bitmaps to the keys it is about to hold."""
        self._preloaded_bloom = None
        self._bloom_est_keys = 0
        if self.cfg.bloom_backend != "auto":
            self.backend_choices["bloom_backend"] = {
                "value": self.cfg.bloom_backend, "auto": False,
                "why": "explicit"}
            return self.cfg.bloom_backend
        budget = self.cfg.driver_bloom_max_keys

        def pick(est: int, why: str) -> str:
            val = "table" if est > budget else "driver"
            self._bloom_est_keys = est
            self.backend_choices["bloom_backend"] = {
                "value": val, "auto": True,
                "why": f"{why} vs driver budget {budget} keys"}
            return val

        if not self.cfg.use_bloom:
            self.backend_choices["bloom_backend"] = {
                "value": "driver", "auto": True, "why": "bloom disabled"}
            return "driver"
        from .frontier.bloom_table import DistributedBloomTable

        t = DistributedBloomTable.load(self.spark, self._bloom_dir)
        if t is not None:
            self._preloaded_bloom = t
            self.backend_choices["bloom_backend"] = {
                "value": "table", "auto": True,
                "why": f"existing table checkpoint ({t.n_keys} keys) "
                       "is sticky"}
            return "table"
        d = PartitionedBloom.load(self._bloom_dir)
        if d is not None:
            self._preloaded_bloom = d
            return pick(d.n_keys, f"driver checkpoint n_keys={d.n_keys}")
        if self.seen_table.current_snapshot_id() is None:
            return pick(0, "empty seen table")
        n = self.seen().count()
        return pick(n, f"seen-table count={n}")

    def _bloom_bits_for(self, n_keys: int, n_buckets: int) -> int:
        """bits_per_bucket sized for n_keys at ~10 bits/key (the
        overfull() threshold), floor = the configured default, rounded
        up to a power of two — a fresh table built for keys ALREADY
        known (promotion, big-warehouse rebuild) must not arrive
        saturated and burn grow-4× full-table rebuilds (same trap the
        driver reload path documents: a stale checkpoint's grown SIZE
        is the right size)."""
        m = self.cfg.bloom_bits_per_bucket
        need = (10 * max(0, n_keys)) // max(1, n_buckets) + 1
        while m < need:
            m *= 4
        return m

    def _cuckoo_slots_for(self, n_keys: int, n_buckets: int,
                          floor_slots: int) -> int:
        """slots/shard sized so n_keys fit under the 0.84 overfull load
        (4 lanes per slot), power-of-two, floored at the configured or
        checkpointed geometry — the cuckoo twin of _bloom_bits_for."""
        slots = floor_slots
        while n_buckets * slots * 4 * 0.84 < n_keys:
            slots *= 4
        return slots

    def _resolve_broadcast_frontier(self) -> bool:
        """Per-round broadcast-vs-SMJ choice for the fetch join when
        broadcast_frontier=None. Evidence costs no extra job: the
        previous round's frontier size (the frontier_in Observation that
        rode that round's commit — created for auto mode even with
        lineage collection off); a first round with no evidence
        broadcasts — the frontier is the seed list then, and seed lists
        that already exceed the budget warrant an explicit override."""
        if self.cfg.broadcast_frontier is not None:
            self.backend_choices["broadcast_frontier"] = {
                "value": self.cfg.broadcast_frontier, "auto": False,
                "why": "explicit"}
            return self.cfg.broadcast_frontier
        est = self._last_frontier_rows
        if est is None:
            val, why = True, "no frontier estimate yet (first round)"
        else:
            val = est <= self.cfg.broadcast_frontier_max_rows
            why = (f"frontier ≈ {est} rows vs broadcast budget "
                   f"{self.cfg.broadcast_frontier_max_rows}")
        self.backend_choices["broadcast_frontier"] = {
            "value": val, "auto": True, "why": why}
        return val

    def _resolve_aligned_probe(self) -> bool:
        """Aligned (bucket-shipped cogroup) vs broadcast bloom probe for
        the driver backend when bloom_aligned_probe=None: broadcast
        while the bitmaps fit bloom_broadcast_max_bytes, aligned beyond
        it. The table backend always probes aligned regardless."""
        if self.cfg.bloom_aligned_probe is not None:
            self.backend_choices["bloom_aligned_probe"] = {
                "value": self.cfg.bloom_aligned_probe, "auto": False,
                "why": "explicit"}
            return self.cfg.bloom_aligned_probe
        bitmaps = getattr(self.bloom, "bitmaps", None)
        tables = getattr(self.bloom, "tables", None)
        if bitmaps is None and tables is None:
            # table backend: split IS aligned
            val, why = False, "table backend probes aligned by design"
        else:
            shards = bitmaps if bitmaps is not None else tables
            bm_bytes = len(shards) * (self.bloom.m // 8)
            val = bm_bytes > self.cfg.bloom_broadcast_max_bytes
            why = (f"driver filter ≈ {bm_bytes} B vs broadcast budget "
                   f"{self.cfg.bloom_broadcast_max_bytes}")
        self.backend_choices["bloom_aligned_probe"] = {
            "value": val, "auto": True, "why": why}
        return val

    def _bloom_marker(self) -> "tuple[int | None, str | None]":
        """(seen-snapshot id, backend) the bloom checkpoint was written
        against. The id is None when the marker was stamped over an
        empty/rolled-back table (current_snapshot_id() was None) — it
        must round-trip as None, not fail int(), or an engine over an
        empty table repeats the full rebuild on every construction."""
        try:
            with open(os.path.join(self._bloom_dir, "seen_snapshot")) as f:
                parts = f.read().split()
            sid = None if parts[0] == "None" else int(parts[0])
            backend = parts[1] if len(parts) > 1 else None
            return sid, backend
        except (FileNotFoundError, ValueError, IndexError):
            return None, None

    def _write_bloom_marker(self) -> None:
        # the marker records WHICH backend's checkpoint it validates:
        # the two backends keep separate on-disk state (meta.json vs
        # bloom.npz) in the same dir, and a backend switch mid-warehouse
        # would otherwise accept the OTHER backend's stale filter as
        # fresh — keys fetched under the other backend would read
        # definite-new and bypass the authoritative seen join
        path = os.path.join(self._bloom_dir, "seen_snapshot")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{self.seen_table.current_snapshot_id()}\n"
                    f"{self.bloom_backend}")
        os.replace(tmp, path)

    # ------------------------------------------------------------------
    _SEEN_COLS = ["url_hash", "url", "host", "fetches", "last_fetch"]

    def _seen_parts(self) -> tuple[DataFrame, DataFrame | None] | None:
        """(bucketed base, post-compaction deltas) when the current seen
        snapshot has that shape — a url_hash-bucketed compacted base as
        its first data dir, flat round deltas after it. None otherwise
        (fresh table, pre-bucketing warehouse, bucket_seen_base off) —
        callers fall back to the generic groupBy resolve."""
        man = self.seen_table.manifest()
        if man is None or not man["files"]:
            return None
        meta = man.get("file_meta", {})
        first, rest = man["files"][0], man["files"][1:]
        if not meta.get(first, {}).get("bucket_table"):
            return None
        if any(meta.get(d, {}).get("bucket_table")
               or meta.get(d, {}).get("partition_by") for d in rest):
            return None                     # unexpected shape: be generic
        base = self.seen_table.read_dir(first, man).select(*self._SEEN_COLS)
        if not rest:
            return base, None
        # ONE multi-path relation, not a reduce of per-dir unions: a
        # union chain grows the plan by a node per round, re-analyzed by
        # every consumer on the round critical path. The multi-path read
        # samples ONE footer for the schema, so a deficient dir (older /
        # divergent writer missing a _SEEN_COL) would silently null-fill
        # instead of failing analysis — check each dir's columns once
        # here (driver-side footer read, ≤ trim_every dirs) to keep the
        # per-dir read's loud failure mode
        expected = set(self._SEEN_COLS)
        for d in rest:
            missing = expected - set(self.spark.read.parquet(d).columns)
            if missing:
                raise RuntimeError(
                    f"seen delta dir {d} lacks column(s) {sorted(missing)}"
                    " — written by an incompatible engine version?")
        deltas = self.spark.read.parquet(*rest).select(*self._SEEN_COLS)
        return base, deltas

    def seen(self) -> DataFrame:
        """Current per-key seen state — merge-on-read: the table holds a
        compacted base plus per-round update deltas (Iceberg MoR
        pattern). With a url_hash-bucketed base the resolve runs SPLIT —
        deltas resolve among themselves (O(delta) shuffle) and anti-join
        into the base with no exchange on the base side — instead of
        re-shuffling the whole table through `seen_state`'s groupBy
        every round. Both forms are row-identical (parity-locked)."""
        return self._seen_from_parts(self._seen_parts())

    def _seen_from_parts(
        self, parts: tuple[DataFrame, DataFrame | None] | None
    ) -> DataFrame:
        """seen() given an already-resolved _seen_parts() — the round
        loop resolves parts ONCE and feeds both this and the gate."""
        if parts is None:
            return seen_state(self.seen_table.read(schema=SEEN_SCHEMA))
        base, deltas = parts
        if deltas is None:
            return base                     # freshly compacted: resolved
        from .frontier.state import resolve_split

        return resolve_split(base, seen_state(deltas))

    def run_round(
        self,
        seeds: DataFrame,          # url, priority, discovered_ts?
        round_no: int,
        round_ts: datetime,
        with_order_audit: bool = False,
        perf: dict | None = None,  # optional phase-timing sink (debug)
    ) -> dict:
        """Execute one crawl round; commits seen+articles snapshots and
        returns the round's lineage dict.

        Unpersist is exception-safe: every DataFrame the round persists
        registers in `_round_caches`, released in the finally — a round
        that throws mid-commit (transient executor loss) must not pin its
        html-bearing cached blocks for the engine's remaining lifetime."""
        self._round_caches: list = []
        try:
            return self._run_round(seeds, round_no, round_ts,
                                   with_order_audit, perf)
        finally:
            for df in self._round_caches:
                try:
                    df.unpersist()       # no-op if already released
                except Exception:
                    pass
            self._round_caches = []

    def _run_round(
        self,
        seeds: DataFrame,
        round_no: int,
        round_ts: datetime,
        with_order_audit: bool = False,
        perf: dict | None = None,
    ) -> dict:
        import time as _time

        def _mark(label, _last=[_time.monotonic()]):
            now = _time.monotonic()
            if perf is not None:
                perf[label] = round(now - _last[0], 2)
            _last[0] = now

        # coerce round_ts to tz-AWARE UTC once, at entry: a naive
        # datetime literal converts through the driver's OS timezone
        # (time.mktime) on its way into the plan, shifting every age
        # predicate and stored last_fetch on a non-UTC machine
        if round_ts.tzinfo is None:
            round_ts = round_ts.replace(tzinfo=timezone.utc)
        cfg = self.cfg
        # parts resolved ONCE per round: seen(), the J1 gate, and the
        # compaction merge all read the same split (or generic) view —
        # no duplicate manifest reads / per-delta plan rebuilding
        parts = self._seen_parts() if cfg.bucket_seen_base else None
        seen = (self._seen_from_parts(parts) if cfg.bucket_seen_base
                else self.seen())
        lineage: dict[str, int] = {}

        # ---- frontier assembly: seeds ∪ trawl (J3a), canonical, deduped
        fr = seeds
        if "priority" not in fr.columns:
            fr = fr.withColumn("priority", F.lit(0))
        if "discovered_ts" not in fr.columns:
            fr = fr.withColumn("discovered_ts", F.lit(round_ts).cast("timestamp"))
        fr = with_canonical(fr.select("url", "priority", "discovered_ts"))

        # pruned path: reads only manifest-stat / day-partition files the
        # window can touch instead of resolving the whole table (identical
        # output — parity-locked in tests); the unpruned resolve remains
        # for tables without manifests (ad-hoc seen DataFrames)
        if cfg.pruned_trawl:
            trawl_rows = trawl_candidates_pruned(
                self.spark, self.seen_table, cfg.refetch, round_ts)
        else:
            trawl_rows = trawl_candidates(seen, cfg.refetch, round_ts)
        trawl = trawl_rows.select(
            F.col("url").alias("url"),
            F.lit(0).alias("priority"),
            F.col("last_fetch").alias("discovered_ts"),
            F.col("url").alias("url_canon"),
            "url_hash",
            "host",
        )
        fr = fr.unionByName(trawl)

        # dedup by key, keeping the best-ordered row (deterministic agg,
        # not dropDuplicates — partition-arrival order must not matter)
        fr = (
            fr.withColumn(
                "_ord",
                F.struct(
                    (-F.col("priority")).alias("np"),
                    F.col("discovered_ts").alias("ts"),
                ),
            )
            .groupBy("url_hash")
            .agg(
                # keep the single best-ordered ROW (priority DESC, ts ASC) —
                # never mix columns from different candidate rows, so engine
                # and oracle agree on the scheduled tuple exactly
                F.min_by("url_canon", "_ord").alias("url_canon"),
                F.min_by("priority", "_ord").alias("priority"),
                F.min_by("discovered_ts", "_ord").alias("discovered_ts"),
                F.min_by("host", "_ord").alias("host"),
            )
        )
        # ---- W1+ link-graph authority merge (frontier/rank.py): ranks
        # computed from PREVIOUS rounds' committed outlinks — this join
        # runs on the deduped frontier (unique keys), after the best-row
        # agg so it costs one rank-keyed left join, never the pre-dedup
        # candidate multiset. Explicit spider pins (priority ≥ rank/unit)
        # survive via greatest(); URLs absent from the graph keep their
        # existing priority.
        if cfg.link_rank:
            _ranks = self._load_link_ranks()
            if _ranks is not None:
                from .frontier.rank import prioritize_frontier

                fr = prioritize_frontier(
                    fr, _ranks, url_col="url_canon",
                    unit=cfg.link_rank_unit)
        # lineage counters: EVERY count attaches as an Observation metric
        # riding the commit action (eager .count()s re-ran the whole
        # frontier assembly per counter). frontier_in's observe node
        # lives INSIDE the cached frontier plan: the bloom split's
        # union-of-filters evaluates its upstream once per branch, but
        # both branches read the cache, so the metrics fire exactly once
        # at materialization. (Caveat: a lost executor recomputing
        # evicted cache blocks would re-fire them — lineage counters are
        # metrics, not state, and tolerate that.)
        observations = {}

        def _observe(df, name):
            if not cfg.collect_lineage:
                return df
            from pyspark.sql import Observation

            obs = Observation(name)
            observations[name] = obs
            return df.observe(obs, F.count(F.lit(1)).alias("n"))

        # cache the assembled frontier whenever something downstream will
        # evaluate it more than once: the bloom split's union-of-filters
        # executes its upstream once per branch, and trim rounds read it
        # again via trim_seen's requested-keys protection — without the
        # cache the whole canonicalize+trawl+dedup assembly re-runs per
        # consumer (worse: requested_keys would re-evaluate AFTER this
        # round's articles commit, so a frontier that reads crawl state
        # could protect a different key set than was actually requested)
        fr_cached = None
        trim_round = (cfg.refetch.trimdb and cfg.trim_every > 0
                      and round_no > 0 and round_no % cfg.trim_every == 0)
        if (cfg.collect_lineage or trim_round
                or (cfg.use_bloom and self.bloom is not None)
                or cfg.broadcast_frontier is None):
            if cfg.collect_lineage or cfg.broadcast_frontier is None:
                # frontier_in rides the round's commit as an Observation
                # INSIDE the cached plan: the cache materializes once (a
                # consumer under the commit action), the CollectMetrics
                # node fires with it, and later cache readers (bloom
                # split branches, trim's requested_keys) never re-fire
                # it — the r3 shape paid an eager count() job here
                from pyspark.sql import Observation

                obs_fr = Observation("frontier_in")
                observations["frontier_in"] = obs_fr
                fr = fr.observe(obs_fr, F.count(F.lit(1)).alias("n"))
            fr_cached = fr.cache()
            self._round_caches.append(fr_cached)
            fr = fr_cached
        # keysrqd parity (refetchcontrol.py:231-232): the reference
        # registers every key the spider REQUESTS — before its own gate,
        # before robots, before download slots — and trim protects that
        # set. Capture the requested keys here (pre-robots, pre-gate):
        # protecting only post-gate `scheduled` keys would let trim
        # delete a stale-but-still-seeded key's row, resetting its fetch
        # history and re-fetching it from scratch every agelimit cycle
        requested_keys = fr.select("url_hash")

        # ---- robots (F11/J5)
        if self.rules_map:
            if self._rules_bc is None:
                # broadcast ONCE per engine, not per round: re-shipping
                # the full host→rules dict every round is repeated
                # driver/executor work plus a leaked Broadcast per round
                from .frontier.politeness import broadcast_rules

                self._rules_bc = broadcast_rules(self.spark, self.rules_map)
            fr = robots_filter(fr, self.rules_map, self.spark,
                               bc=self._rules_bc)
        elif self.rules_df is not None:
            fr = robots_filter_df(fr, self.rules_df)

        # ---- seen-set gate: bloom pre-filter + authoritative join (J1).
        # Definite-new URLs skip the join shuffle entirely; the filter is
        # maintained incrementally across rounds (no per-round rebuild).
        # With a bucketed compacted base the gate runs SPLIT (frontier ×
        # base with no exchange on the base side + small resolved-delta
        # join) instead of joining the union-resolved table; `parts` was
        # resolved once at round start.
        if parts is not None:
            from .frontier.state import seen_filter_split

            base, deltas = parts
            newer = (seen_state(deltas) if deltas is not None
                     else self.spark.createDataFrame([], SEEN_SCHEMA))

            def gate(f):
                return seen_filter_split(f, base, newer, cfg.refetch,
                                         round_ts)
        else:
            def gate(f):
                return seen_filter(f, seen, cfg.refetch, round_ts)

        if cfg.use_bloom and self.bloom is not None:
            split = (self.bloom.split_aligned
                     if self._resolve_aligned_probe()
                     else self.bloom.split)
            maybe, fresh = split(fr, self.spark)
            gated = gate(maybe)
            eligible = gated.unionByName(
                fresh.withColumn("previousfetches", F.lit(0).cast("int"))
            )
        else:
            eligible = gate(fr)
        eligible = _observe(eligible, "after_seen_gate")

        # ---- politeness (W1/W3) + deterministic order. Live-fetch mode
        # rides crawl_delay on the budget join (one budgets_df join per
        # round, not two keyed by the same normalized host)
        scheduled = politeness_schedule(
            eligible, self.budgets, cfg.default_budget, self.spark,
            budgets_df=self.budgets_df, max_budget=self._max_budget,
            keep_crawl_delay=(self.fetcher is not None
                              and self.budgets_df is not None),
        )
        if with_order_audit:
            scheduled = fetch_order_key(scheduled)
        scheduled = _observe(scheduled, "scheduled")

        # ---- fetch stage. Corpus-join mode (this harness): the per-round
        # frontier (bounded by politeness budgets) broadcasts into the
        # pages scan — pages NEVER shuffle (the 100 TB side stays put),
        # and the join output inherits the scan's uniform partitioning,
        # so extraction balances on file splits, not host skew. Left to
        # itself AQE broadcast the PAGES (html!) side here. At frontier
        # sizes beyond broadcast limits set broadcast_frontier=False →
        # shuffled hash join (or pre-bucket both sides by url_canon).
        if self.fetcher is not None:
            # paced-fetch mode: salted layout + in-task Crawl-delay pacing;
            # non-2xx responses drop here (Scrapy's HttpError default —
            # they never reach the spider, so no item and no seen upsert).
            # Scale path: the per-row crawl_delay rides the politeness
            # budget join (keep_crawl_delay above — Crawl-delay hosts
            # only, small) instead of a second join or a host→delay
            # dict shipped to every task.
            fetched = (
                fetch_stage(
                    scheduled, self.fetcher, rules_map=self.rules_map,
                    num_partitions=cfg.num_partitions, salt=cfg.salt or 8,
                )
                .filter((F.col("status") >= 200) & (F.col("status") < 300))
                .drop("status")
            )
            if self.budgets_df is not None:
                fetched = fetched.drop("crawl_delay")
            # RFC-1123 Date header → timestamp; weekday prefix stripped
            # ('EEE' is a format-only symbol — Spark's parser rejects it)
            fetched = fetched.withColumn(
                "warc_ts",
                F.to_timestamp(
                    F.substring_index("fetchtime_str", ", ", -1),
                    "dd MMM yyyy HH:mm:ss 'GMT'"))
        else:
            bcast = self._resolve_broadcast_frontier()
            sched_side = F.broadcast(scheduled) if bcast else scheduled
            fetched = self.pages.join(
                sched_side, self.pages.page_url == sched_side.url_canon,
                "inner",
            ).drop("page_url")
            # one fetch per key per round: a Common-Crawl-style corpus
            # can hold several rows for one canonical URL (snapshots over
            # time; raw-URL variants collapsing under canonicalization),
            # and the join would emit one article per copy. Keep a
            # deterministic survivor — newest warc_ts, content hash as
            # tiebreak (the reference fetches live: one response per
            # request). The dedup shuffles the JOIN OUTPUT, O(round
            # keys), never the 100 TB pages side — but the rows carry
            # the html payload, so at full-corpus rounds this exchange
            # is corpus-sized. An ingest that already guarantees ONE
            # row per canonical URL (dedup at ingest into the bucketed
            # table — what a production CC pipeline does) can declare
            # it with pages_unique_per_url=True and skip the shuffle
            # entirely; output-identical under the guarantee
            # (parity-tested).
            if not cfg.pages_unique_per_url:
                others = [c for c in fetched.columns
                          if c not in ("url_hash", "_ord")]
                fetched = (
                    fetched.withColumn(
                        "_ord", F.struct(F.col("warc_ts"), F.md5("html")))
                    .groupBy("url_hash")
                    .agg(*[F.max_by(c, "_ord").alias(c) for c in others])
                )
            # corpus-join mode skips the salted shuffle unless asked
            # (salt>0) — it would only move the html payload
            if cfg.salt > 0:
                fetched = salted_repartition(
                    fetched, cfg.num_partitions, cfg.salt)
            # HTTP Date header analogue: the page's warc_ts (fetch time)
            fetched = fetched.withColumn(
                "fetchtime_str",
                F.date_format("warc_ts", HTTP_DATE_FMT),
            )
        fetched = fetched.withColumn(
            "meta_json",
            F.to_json(
                F.struct(F.col("url_canon").alias("originalurl"),
                         F.col("previousfetches").alias("refetchcontrol_previous"))
            ),
        )

        # ---- S8 gate decided up front: the chase needs the bootstrap
        # uuid — a failed bootstrap crawls WITHOUT comment collection
        # (liverpoolecho.py:42-47), it must not stamp every host article
        # with a false 'No comments section' note via chase_one's
        # uuid-missing short-circuit
        chase_active = (self.comments_api is not None
                        and bool(cfg.comments_host)
                        and self._comments_site_uuid is not None)
        fetched_cached = None
        if chase_active:
            # the chase adds a second consumer of the fetch stage
            # (extraction + chase), and the eager chase materialization
            # below is an extra action on top of the commit. Cache the
            # stage so each URL is fetched (live mode: an HTTP side
            # effect) or joined (corpus mode: the pages join + dedup
            # shuffle) exactly once per round, whichever branch
            # materializes first (MEMORY_AND_DISK — spills, never
            # recomputes)
            fetched_cached = fetched.persist()
            self._round_caches.append(fetched_cached)
            fetched = fetched_cached

        # ---- extraction (one vectorized UDF: fake404/prune/batteries/NLP)
        extracted = fetched.withColumn(
            "article",
            extract_article_udf(
                F.col("html"), F.col("url_canon"),
                F.col("fetchtime_str"), F.col("meta_json"),
            ),
        )
        audit_cols = ["fetch_seq"] if with_order_audit else []
        articles = extracted.select(
            "url_canon", "url_hash", "host", "priority", "discovered_ts",
            "warc_ts", *audit_cols, "article.*",
        ).withColumn("round", F.lit(round_no))
        # Items = everything that produced a NewsItem. fake404 responses
        # raise before the item path in the reference, so they neither
        # export nor upsert the seen DB (fake404.py:48-58 +
        # refetchcontrol.py:281-316) — they will be re-tried next round.
        items = articles.filter(F.col("status") != "fake404")
        art_obs = None
        if cfg.collect_lineage:
            # the four article counters RIDE the commit write as one
            # Observation (resolved by the commit's lineage_fn) — the r3
            # shape cached the whole html-bearing articles table just to
            # run a separate agg job over it; now the write is the only
            # consumer, so no cache and no extra job. no_bodytext is F9
            # CheckContent (pipelines/checkcontent.py:6-12): items
            # without bodytext unless the URL is picture/video/gallery
            from pyspark.sql import Observation

            not404 = F.col("status") != "fake404"
            art_obs = Observation("article_counts")
            articles = articles.observe(
                art_obs,
                F.count(F.lit(1)).alias("fetched"),
                F.sum((F.col("status") == "ok").cast("long"))
                .alias("extracted"),
                F.sum((~not404).cast("long")).alias("fake404_dropped"),
                F.sum((not404 & F.col("bodytext").isNull()
                       & ~F.col("url_canon").rlike("picture|video|gallery"))
                      .cast("long")).alias("no_bodytext"),
            )
            observations["article_counts"] = art_obs
            items = articles.filter(F.col("status") != "fake404")

        # ---- S8 comment chase (host-gated): runs BEFORE the commit, as
        # the reference chases inline before yielding the item — so a
        # 'dropped' chase (bad contentcontainer payload) removes the
        # article from the round exactly like the reference's
        # StopIteration. The chase re-derives the host subset from
        # `fetched` (it needs the raw html); a single-host subset of the
        # round is small, and the API parallelism is bounded
        # (comments.chase_comments politeness notes).
        chased_cached = None
        if chase_active:
            from .comments import chase_comments, join_comments

            chased = chase_comments(
                fetched.select("url_canon", "host", "html", "warc_ts"),
                self.comments_api, self._comments_site_uuid,
                host_filter=cfg.comments_host,
                limit=cfg.comments_limit,
                max_parallelism=cfg.comments_parallelism,
                delay_secs=cfg.comments_delay_secs,
            )
            # the chase issues live API requests — it must run EXACTLY
            # once per round. items is evaluated by up to two actions
            # (the per-partition lineage collect and the commit), so
            # persist+count materializes the chase here and both actions
            # read the cached rows instead of re-issuing every
            # container/comments GET
            chased_cached = chased.persist()
            self._round_caches.append(chased_cached)
            chased_cached.count()
            items = join_comments(items, chased_cached)

        # ---- commit articles FIRST, then derive the seen MERGE input from
        # the committed files: extraction runs exactly once per round (the
        # Iceberg pattern — MERGE reads the committed table, no recompute).
        _mark("plan_build")

        def _resolve_lineage(data_dir: str) -> dict:
            """Runs inside commit(), after the data write and before the
            manifest write: every Observation riding the round's plan is
            resolvable now, and the freshly written files' parquet
            footers give exact per-write-task item counts driver-side —
            collect_lineage=True adds ZERO extra Spark jobs per round
            (the r3 shape paid three: an eager frontier count, an
            article-counters agg, and a per-partition groupBy+collect)."""
            if not cfg.collect_lineage:
                return {}
            for name, obs in observations.items():
                try:
                    row = obs.get      # dict of this obs's metric values
                except Exception:
                    # AQE's empty-stage propagation can replace an
                    # all-empty runtime subtree with an EmptyRelation,
                    # eliminating its CollectMetrics node — obs.get then
                    # yields an empty row (seen under the aligned bloom
                    # probe's cogroup when a round gates every URL). The
                    # write action DID execute the plan, so the faithful
                    # count for the vanished node is 0.
                    row = {}
                if name == "article_counts":
                    for k in ("fetched", "extracted", "fake404_dropped",
                              "no_bodytext"):
                        lineage[k] = int(row.get(k) or 0)
                else:
                    lineage[name] = int(row.get("n") or 0)
            lineage["per_partition_extracted"] = _footer_row_counts(
                data_dir)
            return dict(lineage)

        # round_ts rides the manifest: the articles commit doubles as the
        # round's write-ahead record, and crash recovery (see
        # _recover_incomplete_round) replays the seen MERGE from it
        self.articles_table.commit(
            items, lineage={"round": round_no,
                            "round_ts": round_ts.isoformat()},
            lineage_fn=_resolve_lineage,
            mode="append",
        )
        _mark("extract_and_commit_articles")
        # next round's broadcast-frontier evidence, off counters already
        # paid for (the frontier_in Observation riding the commit)
        est = lineage.get("frontier_in", lineage.get("after_seen_gate"))
        if est is None and "frontier_in" in observations:
            # collect_lineage off but broadcast_frontier auto: the
            # observation was still attached (free) — read it directly
            try:
                est = observations["frontier_in"].get.get("n")
            except Exception:
                est = None
        if est is not None:
            self._last_frontier_rows = int(est)
        # fr_cached stays persisted until after the seen commit: trim
        # rounds read it again via `requested_keys`; it is unpersisted
        # at the end of the round
        delta_dir = self.articles_table.manifest()["files"][-1]
        self.last_delta_dir = delta_dir
        fetched_keys = self.spark.read.parquet(delta_dir).select(
            "url_hash", "url_canon", "host",
            "previousfetches")  # column-pruned delta scan

        # ---- seen MERGE (J2): merge-on-read. Normal rounds append only
        # this round's delta — the write is O(round keys), never
        # O(table) (at 10^10 keys a full rewrite per round is the
        # dominant cost; Iceberg MoR has the same shape). Trim rounds
        # (J3b) materialize full state anyway, so they double as the
        # compaction: one replace-commit folds base + deltas back into
        # a single snapshot.
        # trim_every=0 → never compact (like expire_keep_last=0's
        # keep-forever), not a ZeroDivisionError
        compact = (cfg.trim_every > 0 and round_no > 0
                   and round_no % cfg.trim_every == 0)
        trimmed_keys_df = None    # set on cuckoo-backend trim rounds
        trimmed_keys_arr = None   # collected right after the commit
        if compact:
            if parts is not None:
                # split-form MERGE: this round's resolved updates are
                # strictly newer than every pre-round row, so the
                # compacted state is updates ∪ (seen ∖ update-keys) —
                # skips re-shuffling the full table through the groupBy
                # (the bucketed WRITE below clusters it once anyway).
                # Row-identical to merge_seen (parity-locked).
                from .frontier.state import resolve_split

                new_seen = resolve_split(
                    seen, seen_updates(fetched_keys, round_ts))
            else:
                new_seen = merge_seen(seen, fetched_keys, round_ts)
            if cfg.refetch.trimdb:
                # protect REQUESTED keys, as the reference's keysrqd does
                # (refetchcontrol.py:150-193, updated at :231-232 BEFORE
                # the gate decision) — the protection set is the
                # PRE-GATE frontier, not post-gate `scheduled`: a
                # stale-but-still-seeded key is gate-dropped every round
                # (age > agelimit), and protecting only scheduled keys
                # would trim its row, reset its fetch history, and
                # re-fetch it from scratch each agelimit cycle — the
                # reference keeps such keys alive and never re-fetches.
                # `requested_keys` reads the cached frontier (trim
                # rounds always cache it — see trim_round above): no
                # pipeline recompute, and the protected set is exactly
                # what this round requested even if the frontier
                # assembly reads state the round has since committed.
                if (self.bloom is not None
                        and self.bloom_backend == "cuckoo"):
                    # the cuckoo backend DELETES trimmed keys from the
                    # filter (the capability the blooms lack) — keep the
                    # deleted-key plan; it is collected after the seen
                    # commit (its inputs are snapshot files that the
                    # replace-commit does not remove)
                    from .frontier.state import trim_seen_with_deletes

                    new_seen, trimmed_keys_df = trim_seen_with_deletes(
                        new_seen, requested_keys, cfg.refetch, round_ts)
                else:
                    new_seen = trim_seen(
                        new_seen, requested_keys, cfg.refetch, round_ts)
            # base partitions by last-fetch day (the pruned trawl skips
            # day directories outside its window — SURVEY §4) and, on
            # the bucketed path, clusters by url_hash so next rounds'
            # gate joins and resolves read it exchange-free
            self.seen_table.commit(
                new_seen.withColumn("lf_day", F.to_date("last_fetch")),
                lineage={"round": round_no,
                         "round_ts": round_ts.isoformat(),
                         "seen_format": self.SEEN_FORMAT,
                         "counters": lineage, "compacted": True},
                mode="replace",
                partition_by=["lf_day"],
                bucket_by="url_hash" if cfg.bucket_seen_base else None,
                n_buckets=cfg.seen_buckets,
            )
            if trimmed_keys_df is not None:
                # cuckoo backend: pull the trimmed keys NOW — after the
                # commit (the replace leaves prior snapshot files on
                # disk) but BEFORE expire_snapshots below physically
                # deletes the pre-compaction files this plan reads
                # (expire_keep_last=1 made a post-expire collect throw
                # FileNotFound on every trim round)
                # Arrow batch transfer, not row pickling — trim deltas
                # are bounded by trim_every but can still reach millions
                # of keys on a big table
                trimmed_keys_arr = (trimmed_keys_df
                                    .select("url_hash").toArrow()
                                    .column("url_hash").to_numpy())
            if cfg.expire_keep_last > 0:
                # maintenance rides the compaction commit: pre-compaction
                # delta snapshots age out once K newer ones exist
                self.seen_table.expire_snapshots(cfg.expire_keep_last)
        else:
            # delta stats: every row's last_fetch IS round_ts, so the
            # manifest range enables whole-delta skips on pruned reads
            rts_iso = round_ts.isoformat()
            self.seen_table.commit(
                seen_updates(fetched_keys, round_ts),
                lineage={"round": round_no, "round_ts": rts_iso,
                         "seen_format": self.SEEN_FORMAT,
                         "counters": lineage},
                mode="append",
                stats={"last_fetch_range": [rts_iso, rts_iso]},
            )
        _mark("seen_merge_commit")
        if self.bloom is not None:
            # incremental, this round's keys only; small rounds update on
            # the driver (no extra Spark job). The cuckoo backend adds
            # FIRST-fetch keys only: refetched keys are already in the
            # filter, and the exactly-once insert discipline is what
            # makes its deletions safe (frontier/cuckoo.py).
            if self.bloom_backend == "cuckoo":
                self.bloom.add_df(
                    fetched_keys.filter(F.col("previousfetches") == 0),
                    driver_threshold=2_000_000)
                if trimmed_keys_arr is not None and len(trimmed_keys_arr):
                    self.bloom.delete_local(trimmed_keys_arr)
            else:
                self.bloom.add_df(fetched_keys, driver_threshold=2_000_000)
            if (cfg.bloom_backend == "auto"
                    and self.bloom_backend == "driver"
                    and self.bloom.n_keys > cfg.driver_bloom_max_keys):
                # MID-RUN promotion driver→table: a brand-new big crawl
                # starts with an empty seen table (auto resolves driver)
                # and can cross the driver budget inside round 0 — don't
                # wait for the next engine construction to stop growing
                # driver-resident bitmaps. One seen scan rebuilds the
                # distributed table from the authoritative key set; the
                # marker records the new backend so resume is sticky.
                from .frontier.bloom_table import DistributedBloomTable

                nb = max(self.cfg.bloom_buckets, self.bloom.n_buckets)
                t = DistributedBloomTable(
                    self.spark, self._bloom_dir, nb,
                    self._bloom_bits_for(self.bloom.n_keys, nb))
                t.rebuild_from(self.seen().select("url_hash"))
                self.bloom = t
                self.bloom_backend = "table"
                self.backend_choices["bloom_backend"] = {
                    "value": "table", "auto": True,
                    "why": (f"promoted mid-run: driver bloom n_keys="
                            f"{t.n_keys} crossed budget "
                            f"{cfg.driver_bloom_max_keys}")}
            if self.bloom.overfull():
                # adaptive growth: rebuild 4× larger from the seen
                # snapshot (one scan, amortized over the rounds the
                # quadrupling buys); keeps the per-round broadcast +
                # checkpoint sized to the table, not worst-case
                if self.bloom_backend == "table":
                    self.bloom.rebuild_from(
                        self.seen().select("url_hash"),
                        bits_per_bucket=self.bloom.m * 4)
                elif self.bloom_backend == "cuckoo":
                    from .frontier.cuckoo import PartitionedCuckoo

                    self.bloom = PartitionedCuckoo.from_seen(
                        self.seen().select("url_hash"),
                        self.bloom.n_buckets, self.bloom.slots * 4)
                else:
                    self.bloom = PartitionedBloom.from_seen(
                        self.seen(), self.bloom.n_buckets, self.bloom.m * 4)
            _mark("bloom_update")
            self.bloom.save(self._bloom_dir)  # checkpointed with the round
            self._write_bloom_marker()        # ties bloom ↔ seen snapshot
            _mark("bloom_save")
        if cfg.link_rank:
            self._update_link_graph(round_no)
            _mark("link_rank")
        return lineage

    # ---- W1+ link-graph state (config link_rank) ---------------------
    def _load_link_ranks(self) -> DataFrame | None:
        """Latest committed rank snapshot, or None before the first
        refresh (and after a crash mid-overwrite — no _SUCCESS, no
        authority this round; the next cadence rewrites it)."""
        if not os.path.exists(os.path.join(self._link_ranks_dir,
                                           "_SUCCESS")):
            return None
        return self.spark.read.parquet(self._link_ranks_dir)

    def _update_link_graph(self, round_no: int) -> None:
        """Append the committed round's outlink edges; refresh ranks on
        the cadence. The append is O(this round's outlinks); the rank
        job reads the accumulated edge log distinct()-ed (crash-replayed
        rounds may append duplicate edges — distinct absorbs them) and
        iterates edge-sized shuffles only (frontier/rank.py scale
        notes). Runs after the seen commit: a crash here loses at most
        advisory priority signal, never crawl state."""
        import shutil

        from .frontier.rank import link_graph_ranks, outlink_edges

        # recover an interrupted compaction swap (below) before touching
        # the log: a crash between the two renames leaves the old log
        # parked at .trash with no live dir — restore it; a crash after
        # the second rename leaves a redundant .trash — drop it
        trash = self._link_edges_dir + ".trash"
        if os.path.exists(trash):
            if not os.path.exists(self._link_edges_dir):
                os.rename(trash, self._link_edges_dir)
            else:
                shutil.rmtree(trash, ignore_errors=True)

        delta = self.spark.read.parquet(self.last_delta_dir)
        if "links" not in delta.columns:
            return
        (outlink_edges(delta.select("url_canon", "links"))
         .write.mode("append").parquet(self._link_edges_dir))
        if (round_no + 1) % max(1, self.cfg.link_rank_every) != 0:
            return
        # one distinct-graph materialization shared by the rank job and
        # the compaction write (persist = compute once, spill not
        # recompute)
        edges = (self.spark.read.parquet(self._link_edges_dir)
                 .distinct().persist())
        try:
            edges.count()
            ranks = link_graph_ranks(
                edges, iterations=self.cfg.link_rank_iterations,
                num_partitions=self.cfg.num_partitions,
                checkpoint_dir=self.cfg.link_rank_checkpoint_dir or None)
            ranks.write.mode("overwrite").parquet(self._link_ranks_dir)
            # compact the edge log to the distinct graph: refetch rounds
            # re-append the same (src,dst) pairs every cycle, so without
            # this the log — and every refresh's scan+distinct — grows
            # O(rounds × outlinks) on a crawl whose distinct graph is
            # static. The compacted graph is written to a SIBLING temp
            # dir and swapped in (the seen table's replace-commit
            # idiom), never overwritten in place: an in-place overwrite
            # deletes the source files this plan reads, and a lost
            # executor's cache-block recompute against the deleted
            # parquet would fail the job with the log truncated —
            # permanently losing edges from pages never refetched.
            tmp = self._link_edges_dir + ".compact.tmp"
            edges.write.mode("overwrite").parquet(tmp)
            os.rename(self._link_edges_dir, trash)
            os.rename(tmp, self._link_edges_dir)
            shutil.rmtree(trash, ignore_errors=True)
        finally:
            edges.unpersist()

    # ------------------------------------------------------------------
    def export_jsonl(self, path: str, strip_raw_page: bool = True) -> None:
        """S9 — RISJbot-compatible JSONLines export of the articles table
        (see risjbot_spark.sinks for the raw-page option)."""
        from .sinks import write_jsonl

        write_jsonl(self.articles_table.read(), path,
                    strip_raw_page=strip_raw_page)

    def export_warc(self, out_dir: str, *, n_files: int = 16,
                    cdx: bool = True,
                    missing_ts: "datetime | None" = datetime(
                        1970, 1, 1, tzinfo=timezone.utc)) -> DataFrame:
        """Interchange export: the crawl's fetched pages as
        Common-Crawl-convention .warc.gz files (+ sorted .cdx sidecars)
        via sources.warc.write_warc. The articles table names what was
        actually fetched; the raw bytes come from the pages table by
        canonical url — the same strip-raw-page inverse as the JSONL
        sink — with the newest capture winning when several raw pages
        share one canonical URL (max_by total order, so repeated
        exports are byte-identical). Returns the manifest DataFrame
        (file, n_records, n_bytes).

        Pages whose warc_ts is NULL (a source WARC with a missing or
        unparseable WARC-Date — the engine itself tolerates them) get
        `missing_ts` (default: the epoch, the archive convention for
        "capture date unknown") so a successful crawl is always
        exportable; pass missing_ts=None to fail loudly instead."""
        from .sources.warc import write_warc

        if self.pages is None:
            raise ValueError("engine has no pages table to export")
        fetched = (self.articles_table.read()
                   .select(F.col("url_canon").alias("_u")).distinct())
        pages = self.pages
        if missing_ts is not None:
            pages = pages.withColumn(
                "warc_ts", F.coalesce("warc_ts", F.lit(missing_ts)))
        ord_ = F.struct(F.col("warc_ts"), F.md5(F.col("html").cast("binary")))
        pg = (pages
              .join(fetched, pages.page_url == F.col("_u"), "inner")
              .groupBy("page_url")
              .agg(F.max_by(
                  F.struct(F.col("warc_ts"),
                           F.col("html").cast("binary").alias("html")),
                  ord_).alias("_w"))
              .select(F.col("page_url").alias("url"),
                      F.col("_w.warc_ts").alias("warc_ts"),
                      F.col("_w.html").alias("payload")))
        return write_warc(pg, out_dir, n_files=n_files, cdx=cdx)

    def discovered_frontier(self) -> DataFrame | None:
        """S6 — outlinks of the last round's items as next-round seeds:
        explode the committed delta's `links`, distinct, allow/deny regex
        (F1, the LinkExtractor allow/deny of
        /root/reference/RISJbot/spiders/base/buzzfeednewscrawlspider.py:
        15-19). Offsite filtering already happened in the extraction UDF."""
        cfg = self.cfg
        if not getattr(self, "last_delta_dir", None):
            return None
        links = (
            self.spark.read.parquet(self.last_delta_dir)
            .select(F.explode("links").alias("url"))
            .distinct()
        )
        if cfg.link_allow:
            links = links.filter(F.col("url").rlike(cfg.link_allow))
        if cfg.link_deny:
            links = links.filter(~F.col("url").rlike(cfg.link_deny))
        return links.withColumn("priority", F.lit(0))

    def run(self, seeds: DataFrame, rounds: int,
            start_ts: datetime | None = None,
            round_gap_secs: int | None = None) -> list[dict]:
        """Multi-round driver loop. Round timestamps advance by
        `round_gap_secs` (default: refetchsecs, so refetches become
        eligible each round) and are passed as literals — determinism."""
        start_ts = start_ts or datetime(2017, 4, 1, tzinfo=timezone.utc)
        gap = round_gap_secs or self.cfg.refetch.refetchsecs
        # normalize the seed shape ONCE: run_round accepts bare-url seeds
        # (it defaults priority/discovered_ts), so the link-following
        # union must too — selecting a missing priority column crashed,
        # and re-selecting url+priority dropped a caller's discovered_ts
        keep = [c for c in ("url", "priority", "discovered_ts")
                if c in seeds.columns]
        seeds = seeds.select(*keep)
        if "priority" not in seeds.columns:
            seeds = seeds.withColumn("priority", F.lit(0))
        # resume round numbering AND the round clock from the warehouse:
        # restarting numbering at 0 would skew lineage (and pre-token,
        # mask crash recovery); deriving resumed timestamps from the
        # caller's start_ts would SHIFT them when a CLI rerun passes a
        # fresh wall-clock start (ts = now + start_round×gap aged every
        # stored key past agelimit — the next compaction then wiped the
        # whole fetch history). The recorded last round_ts anchors the
        # clock instead, so a resumed run continues exactly where an
        # uninterrupted one would be; start_ts only seeds a FRESH
        # warehouse. A resumed first round also keeps link-following
        # (gate on the absolute round, with last_delta_dir seeded from
        # the manifest at init).
        last = self.articles_table.manifest()
        start_round = 0
        base_ts = start_ts
        if last is not None and last.get("lineage", {}).get("round") is not None:
            start_round = last["lineage"]["round"] + 1
            last_ts = last.get("lineage", {}).get("round_ts")
            if last_ts is not None:
                base_ts = (datetime.fromisoformat(last_ts)
                           - timedelta(seconds=(start_round - 1) * gap))
        out = []
        for i in range(rounds):
            r = start_round + i
            ts = base_ts + timedelta(seconds=r * gap)
            round_seeds = seeds
            if self.cfg.follow_links and r > 0:
                disc = self.discovered_frontier()
                if disc is not None:
                    sd = seeds
                    if "discovered_ts" in sd.columns:
                        # outlinks carry no discovery time; stamp with the
                        # round literal so the union stays deterministic
                        disc = disc.withColumn(
                            "discovered_ts", F.lit(ts).cast("timestamp"))
                    round_seeds = sd.unionByName(disc)
            out.append(self.run_round(round_seeds, r, ts))
        return out


def fetch_stage(
    scheduled: DataFrame,
    fetcher,
    rules_map: dict | None = None,
    num_partitions: int = 32,
    salt: int = 8,
    default_delay: float = 0.0,
    sleep_fn=None,
) -> DataFrame:
    """The paced fetch stage (W3 pacing inside the task): `mapInPandas`
    over the salted-host layout, fetching each partition's rows in the
    deterministic crawl order and sleeping Crawl-delay between
    consecutive same-host requests.

    `fetcher(url) -> (status:int, body:bytes, date_header:str)` is
    injected — a live deployment passes an HTTP client; tests pass a
    corpus-backed fake (this sandbox has no network, so the engine's
    corpus join remains the default fetch, same output contract).

    Politeness accounting: the salted layout spreads one host over at
    most `salt` tasks, each sleeping `salt × crawl_delay` between its
    same-host fetches, and a task's FIRST same-host fetch is staggered
    by its salt lane (url_hash % salt) × crawl_delay — so the global
    per-host request rate honors ≤ 1/crawl_delay instantaneously, not
    just amortized (without the stagger, stage start could burst one
    request per lane at once). `sleep_fn` is injectable so pacing is
    unit-testable without wall-clock sleeps."""
    import time as _t

    from pyspark.sql import types as T

    from .frontier.politeness import _norm_host

    do_sleep = sleep_fn or _t.sleep
    # normalize both the rule keys and (below) the row hosts the same way
    # every other robots consumer does — an un-normalized 'www.' mismatch
    # would silently zero the Crawl-delay and break the rate bound
    delays = {
        _norm_host(host): (r.crawl_delay or default_delay)
        for host, r in (rules_map or {}).items()
    }
    out_schema = T.StructType(
        scheduled.schema.fields
        + [T.StructField("status", T.IntegerType()),
           T.StructField("html", T.BinaryType()),
           T.StructField("fetchtime_str", T.StringType())]
    )
    in_cols = [f.name for f in scheduled.schema.fields]
    out_cols = [f.name for f in out_schema.fields]
    laid_out = salted_repartition(scheduled, num_partitions, salt)

    def run(batches):
        for pdf in batches:
            yield _paced_fetch_partition(
                pdf, in_cols, out_cols, delays, salt, default_delay,
                fetcher, do_sleep)

    return laid_out.mapInPandas(run, schema=out_schema)


def _paced_fetch_partition(pdf, in_cols, out_cols, delays, salt,
                           default_delay, fetcher, do_sleep):
    """One task's paced fetch loop (unit-testable without Spark): sort
    into the deterministic crawl order, fetch, sleep salt×Crawl-delay
    between consecutive same-host requests."""
    import time as _t

    import pandas as pd

    from .frontier.politeness import _norm_host

    pdf = pdf.sort_values(
        ["priority", "discovered_ts", "url_hash"],
        ascending=[False, True, True])
    last_fetch_at: dict[str, float] = {}
    task_start = _t.monotonic()
    rows = []
    for rec in pdf.to_dict("records"):
        host = rec["host"]
        # per-row crawl_delay column (scale path) beats the shipped dict
        cd = rec.get("crawl_delay")
        if cd is not None and not pd.isna(cd):
            delay = float(cd) * salt
        else:
            delay = delays.get(_norm_host(host or ""), default_delay) * salt
        if delay > 0 and host in last_fetch_at:
            wait = delay - (_t.monotonic() - last_fetch_at[host])
            if wait > 0:
                do_sleep(wait)
        elif delay > 0:
            # first same-host fetch in this task: separate salt lanes in
            # ABSOLUTE time — lane k's first fetch happens no earlier
            # than task_start + k × crawl_delay. Without it, stage start
            # could burst up to `salt` concurrent same-host requests
            # (one per lane) before the per-lane pacing kicks in; the
            # stagger makes the instantaneous rate honor the
            # 1/crawl_delay bound, not just the amortized one (Scrapy
            # download slots serialize per-domain — this is the
            # distributed analogue). Wall-clock already elapsed in this
            # task counts toward the offset, so a late-reached host
            # doesn't sleep for a burst window that has already passed.
            lane_offset = (rec["url_hash"] % salt) * (delay / salt)
            wait = lane_offset - (_t.monotonic() - task_start)
            if wait > 0:
                do_sleep(wait)
        status, body, date_hdr = fetcher(rec["url_canon"])
        last_fetch_at[host] = _t.monotonic()
        rows.append({**{c: rec[c] for c in in_cols},
                     "status": int(status), "html": body,
                     "fetchtime_str": date_hdr})
    return pd.DataFrame(rows, columns=out_cols)

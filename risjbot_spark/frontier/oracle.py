"""In-memory crawl oracle (SURVEY.md §5.2, FIXTURES.md §6).

A straightforward single-process reimplementation of the frontier state
machine — RefetchControl's rules
(/root/reference/RISJbot/spmiddlewares/refetchcontrol.py:227-316,
132-195) plus canonicalization, robots obedience and the per-host
politeness budget — against which the Spark engine's crawl ordering and
final seen-set are property-tested: same seed list + politeness budget ⇒
identical (url_canon, round, fetch order) and identical final seen state
(north_rule invariant)."""

from __future__ import annotations

from datetime import datetime
from urllib.parse import urlparse

from ..urlnorm import canonicalize_py, host_py
from .politeness import RobotsRules, _norm_host as _norm
from .state import RefetchConfig
from .xxhash import xxhash64


class CrawlOracle:
    def __init__(
        self,
        pages: set[str],                       # canonical URLs that exist
        rules_map: dict[str, RobotsRules],
        cfg: RefetchConfig,
        default_budget: int,
        round_seconds: int,
        fake404: set[str] | None = None,       # fetched but never itemized
    ):
        self.pages = pages
        self.fake404 = fake404 or set()
        self.rules = { _norm(h): r for h, r in rules_map.items() }
        self.cfg = cfg
        self.default_budget = default_budget
        self.round_seconds = round_seconds
        self.seen: dict[str, tuple[int, datetime]] = {}

    def _budget(self, host: str) -> int:
        r = self.rules.get(_norm(host))
        if r is not None and r.crawl_delay:
            return max(1, int(self.round_seconds / r.crawl_delay))
        return self.default_budget

    def _robots_allowed(self, url: str, host: str) -> bool:
        r = self.rules.get(_norm(host))
        if r is None:
            return True
        path = urlparse(url).path or "/"
        return r.allowed(path)

    def _refetch_eligible(self, url: str, round_ts: datetime) -> bool:
        rec = self.seen.get(url)
        if rec is None:
            return True
        nf, t = rec
        age = (round_ts - t).total_seconds()
        return not (
            nf >= self.cfg.maxfetches
            or age < self.cfg.refetchsecs
            or age > self.cfg.age_limit_secs
        )

    def run_round(
        self,
        seeds: list[dict],  # url, priority, discovered_ts
        round_no: int,
        round_ts: datetime,
    ) -> list[tuple[int, str, int]]:
        # trawl: rows eligible for refetch rejoin the frontier (J3)
        cand: dict[str, dict] = {}
        if self.cfg.refetchfromdb:
            for url, (nf, t) in self.seen.items():
                age = (round_ts - t).total_seconds()
                if (age >= self.cfg.refetchsecs
                        and age < self.cfg.age_limit_secs
                        and nf < self.cfg.maxfetches):
                    cand[url] = {"url_canon": url, "priority": 0,
                                 "discovered_ts": t,
                                 "url_hash": xxhash64(url)}
        for s in seeds:
            u = canonicalize_py(s["url"])
            prev = cand.get(u)
            row = {"url_canon": u, "priority": s.get("priority", 0),
                   "discovered_ts": s.get("discovered_ts", round_ts),
                   "url_hash": xxhash64(u)}
            if prev is None or _better(row, prev):
                cand[u] = row

        # robots + seen-set filters
        rows = []
        for row in cand.values():
            u = row["url_canon"]
            host = host_py(u)
            if not self._robots_allowed(u, host):
                continue
            if not self._refetch_eligible(u, round_ts):
                continue
            row["host"] = host
            rows.append(row)

        # politeness: per-host rank by (priority DESC, discovered_ts, hash)
        rows.sort(key=_order_key)
        taken: list[dict] = []
        per_host: dict[str, int] = {}
        for row in rows:
            h = row["host"]
            if per_host.get(h, 0) >= self._budget(h):
                continue
            per_host[h] = per_host.get(h, 0) + 1
            taken.append(row)

        # fetch (page must exist) + J2 upsert. fake404 pages are fetched
        # (consume budget) but raise before the item path — no article, no
        # seen upsert (fake404.py:48-58 + refetchcontrol.py:281-316).
        log = []
        for seq, row in enumerate(taken, start=1):
            # seq numbers ALL scheduled rows — the engine's fetch_seq is
            # a row_number over the scheduled frontier BEFORE the pages
            # join, so failed/fake404 slots leave gaps in both sides
            # identically (a fetched-only counter diverged from the
            # engine whenever a failure preceded a success in-round)
            u = row["url_canon"]
            if u not in self.pages or u in self.fake404:
                continue
            nf, _ = self.seen.get(u, (0, None))
            self.seen[u] = (nf + 1, round_ts)
            log.append((round_no, u, seq))
        return log

    def trim(self, requested: set[str], round_ts: datetime) -> None:
        if not self.cfg.trimdb:
            return
        stale = [
            u for u, (nf, t) in self.seen.items()
            if (round_ts - t).total_seconds() >= self.cfg.age_limit_secs
            and u not in requested
        ]
        for u in stale:
            del self.seen[u]


def _order_key(row: dict):
    return (-row["priority"], row["discovered_ts"], row["url_hash"])


def _better(a: dict, b: dict) -> bool:
    return _order_key(a) < _order_key(b)


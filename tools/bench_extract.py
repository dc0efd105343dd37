"""Single-threaded per-page extraction microbench — no Spark.

Times `udfs._extract_one` (the full parse → prune → selector battery →
NLP row path) over pages from the shared bench corpus, best-of-K
passes. This is the regression adjudicator for the extraction hot path:
whole-round numbers on this shared VM swing ±50% with co-tenant load
(BENCH/BASELINE.md methodology), but a single-threaded pure-Python loop
is far less exposed — two engine versions reading within ~1% here means
the extraction inner loop did not regress, whatever the round timings
say. (Adjudicated exactly that way in rounds 2 and 3: round-over-round
crawl deltas that looked like 15-25% regressions read <1% here and
vanished in clean-window re-runs.)

Usage:
    python tools/bench_extract.py [corpus_dir] [n_pages]
Defaults: /tmp/risjbot_bench_pages_192000 (bench.py's cache; run
bench.py once to materialize it) and 3000 pages.
"""

from __future__ import annotations

import glob
import os
import sys
import time

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from risjbot_spark.udfs import _extract_one  # noqa: E402


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/risjbot_bench_pages_192000"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    files = sorted(glob.glob(os.path.join(corpus, "part-*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files under {corpus} — run bench.py "
                         f"once to materialize the corpus cache")
    rows: list[tuple[str, str]] = []
    for f in files:
        t = pq.read_table(f, columns=["url", "html"])
        rows.extend(zip(t.column("url").to_pylist(),
                        t.column("html").to_pylist()))
        if len(rows) >= n_pages:
            break
    rows = rows[:n_pages]
    print(f"{len(rows)} pages from {corpus}")

    best = None
    for p in range(3):
        t0 = time.perf_counter()
        ok = 0
        for u, h in rows:
            r = _extract_one(h, u, "2017-04-01T00:00:00+00:00", None)
            ok += r["status"] == "ok"
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"pass {p}: {dt:.3f}s  ({dt / len(rows) * 1000:.4f} ms/page, "
              f"ok={ok})")
    print(f"BEST: {best / len(rows) * 1000:.4f} ms/page")


if __name__ == "__main__":
    main()

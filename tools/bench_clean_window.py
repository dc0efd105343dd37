"""Clean-window 4/16 scaling campaign (r3 verdict item #7, automated).

The box is a shared VM whose CPU delivery to 16+-thread Spark work swings
2-3× with co-tenant load — AND the raw busy-loop ceiling alone is not a
sufficient cleanliness signal (2026-08-18 09:00 UTC: busy-loop read a
clean 169/504 Mops while Spark's warm local[16] leg delivered 2,850
URLs/s vs its clean-window 9,700 — the contention was in memory/cache
bandwidth the register-only loop never touches). So the probe here is
two-stage, and the SPARK probe gates the run:

  1. busy-loop ceiling (tools/bench_scaling.py `ceiling` stage);
  2. a short real crawl probe at local[16] (2 rounds, warm round is the
     signal) — the exact workload whose scaling we want to measure.

Only when the Spark probe clears `--spark-min` (default 7000 URLs/s,
i.e. inside the historical clean band of 8000-9700 minus headroom) does
the full campaign run: the steal-sensitive 4N leg FIRST, then the N leg,
then append the pair to BENCH/window_campaign_runs.jsonl and print the
verdict. BENCH/BASELINE.md is NOT rewritten here — promote a qualifying
pair by hand (or with bench_scaling.py `report`) so a degraded window
can never clobber the headline.

Usage:
    python tools/bench_clean_window.py [--spark-min 7000] [--probe-only]
Exit codes: 0 = pair recorded, 3 = window not clean (no legs run).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "window_campaign_runs.jsonl")
ENV_BASE = {
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
    "SPARK_GRAFT_BENCH_SUITE": "0",
    "SPARK_GRAFT_BENCH_MOR_ROUNDS": "0",
}


def _bench(cpus: int, rounds: int) -> dict:
    env = {**os.environ, **ENV_BASE,
           "SPARK_GRAFT_CPUS": str(cpus),
           "SPARK_GRAFT_BENCH_ROUNDS": str(rounds)}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed: {proc.stderr[-1000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _ceiling() -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
         "ceiling"], capture_output=True, text=True, timeout=600, cwd=REPO)
    if proc.returncode != 0:
        # NEVER fall back to a stale /tmp ceiling from a different load
        # window — it would silently skew the normalized efficiency this
        # tool exists to keep honest
        raise RuntimeError(f"ceiling probe failed: {proc.stderr[-500:]}")
    return json.load(open("/tmp/risjbot_scaling/ceiling.json"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spark-min", type=float, default=7000.0,
                    help="min warm local[16] URLs/s to call the window "
                         "clean (historical clean band: 8000-9700)")
    ap.add_argument("--probe-only", action="store_true")
    args = ap.parse_args()
    now = datetime.now(timezone.utc).isoformat(timespec="seconds")

    hw = _ceiling()
    hw_scaling = hw["hw_n4"] / (4 * hw["hw_n"])
    probe = _bench(16, rounds=2)
    probe_warm = probe["crawl_urls_per_sec_warm"]
    rec = {"ts": now, "hw_n": hw["hw_n"], "hw_n4": hw["hw_n4"],
           "hw_scaling": round(hw_scaling, 3),
           "probe_warm_16": probe_warm}
    clean = probe_warm >= args.spark_min
    rec["clean"] = clean
    if not clean or args.probe_only:
        rec["result"] = "probe-only" if clean else "window-not-clean"
        os.makedirs(os.path.dirname(RUNS), exist_ok=True)
        with open(RUNS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        return 0 if clean else 3

    # clean window: 4N leg first (steal-sensitive), then N
    leg16 = _bench(16, rounds=6)
    leg4 = _bench(4, rounds=6)
    t16, t4 = (leg16["crawl_urls_per_sec_warm"],
               leg4["crawl_urls_per_sec_warm"])
    eff = t16 / (4 * t4)
    rec.update({
        "leg16_warm": t16, "leg4_warm": t4,
        "raw_eff": round(eff, 3),
        "norm_eff": round(min(1.0, eff / hw_scaling), 3),
        "result": "RAW-PAIR-MET" if eff >= 0.8 else "pair-recorded",
        "leg16": leg16["queries"], "leg4": leg4["queries"],
    })
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    with open(RUNS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

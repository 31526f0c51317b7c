"""Regression pinning under calm windows (round-3 VERDICT item 3).

BENCH_r03 showed a sub-2x regression cluster vs BENCH_r02
(downsample_average +26%, cell_histogram +13%, knn +11%, merge_first
+11%, pip_join_sort_merge +8%) that ROUND_NOTES attributed to host
phases. This tool decides: each cycle probes the host (numpy), then
times ONLY those queries in a fresh bench subprocess, then probes
again. Cycles append to BENCH/regression_pin.jsonl; the report
compares calm-cycle minima against the r2/r3 artifacts.

Protocol notes (review finding, r4). The rN artifacts are single-shot
timings taken INSIDE a warm full-suite run, so neither subset mode
here is 1:1 comparable with them:
- repeats>=2 (steady-state minima) removes JIT the artifacts paid —
  a LOWER bound on operator cost;
- repeats=1 subset cycles OVERWEIGHT JIT: the first selected query
  absorbs the session warm-up the full suite amortizes into the
  headline/earlier queries (measured: cell_histogram 4.35 s as the
  subset's first query vs 1.20 s inside a full suite on the same
  tree minutes apart).
The artifact-comparable protocol is a FULL `python bench.py` rerun;
this round's full-suite self-checks are stored as
BENCH/selfcheck_r4_run*.json (60.5 s / 61.1 s calm, 71.3 s in a
degraded phase — per-query 0.79-1.08x of BENCH_r03 on the calm
runs). Subset cycles remain useful for RELATIVE claims across calm
windows; the report labels each pool by protocol.

Usage:
    python tools/bench_pin.py [cycles]      # default 3
    python tools/bench_pin.py --report
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
LOG = os.path.join(REPO, "BENCH", "regression_pin.jsonl")

QUERIES = [
    q
    for q in os.environ.get(
        "BENCH_PIN_QUERIES",
        "downsample_average,cell_histogram,knn,merge_first,pip_join_sort_merge",
    ).split(",")
    if q
]


def host_probe(reps: int = 3) -> float:
    from scaling_hunt import host_probe as hp

    return hp(reps)


def cycle(c: int) -> dict:
    p0 = host_probe()
    repeats = os.environ.get("BENCH_PIN_REPEATS", "1")
    env = dict(
        os.environ,
        BENCH_ONLY=",".join(QUERIES),
        BENCH_REPEATS=repeats,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--suite-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    p1 = host_probe()
    rec = {
        "cycle": c,
        "repeats": int(repeats),
        "probe_before": round(p0, 3),
        "probe_after": round(p1, 3),
        "queries": r["queries"],
        "ts": time.strftime("%H:%M:%S"),
    }
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def report() -> None:
    recs = [json.loads(l) for l in open(LOG)]
    out = {"cycles": len(recs)}
    for proto, match in (
        ("single_shot", lambda r: r.get("protocol") != "headline" and r.get("repeats", 3) == 1),
        ("steady_state", lambda r: r.get("protocol") != "headline" and r.get("repeats", 3) > 1),
        ("headline", lambda r: r.get("protocol") == "headline"),
    ):
        sub = [r for r in recs if match(r)]
        if not sub:
            continue
        calm = [r for r in sub if max(r["probe_before"], r["probe_after"]) <= 0.05]
        pool = calm if calm else sub
        names = (
            sorted({q for r in pool for q in r["queries"]})
            if proto == "headline"
            else QUERIES
        )
        out[proto] = {
            "cycles": len(sub),
            "calm_cycles": len(calm),
            "pinned_min": {
                q: min(
                    (r["queries"][q] for r in pool if q in r["queries"]),
                    default=None,
                )
                for q in names
            },
        }
    # artifact-comparable ratios use the single-shot protocol only
    best = out.get("single_shot") or out.get("steady_state")
    if best is None:
        print(json.dumps({"cycles": 0, "note": "no cycles logged yet"}))
        return
    pinned = best["pinned_min"]
    for tag in ("r02", "r03"):
        path = os.path.join(REPO, f"BENCH_{tag}.json")
        if os.path.exists(path):
            doc = json.load(open(path))
            ref = (doc.get("parsed") or doc).get("queries", {})
            out[f"vs_{tag}"] = {
                q: round(pinned[q] / ref[q], 3)
                for q in QUERIES
                if q in ref and pinned.get(q) is not None
            }
    print(json.dumps(out, indent=2))


def headline_cycle(c: int) -> dict:
    """Pin the headline job itself (r4 verdict item 1): probe ->
    `bench.py --headline-only` (warm-up + best/median of 4 at the full
    suite's n) -> probe. Appends protocol='headline' records; these are
    artifact-comparable to BENCH_rN's headline seconds up to the rN
    single-shot-inside-full-suite position (the headline is the FIRST
    timed job there too, so both pay session JIT the same way — and
    --headline-only additionally takes best-of-4, a lower bound)."""
    p0 = host_probe()
    env = dict(os.environ, BENCH_N="600000")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    p1 = host_probe()
    rec = {
        "cycle": c,
        "protocol": "headline",
        "probe_before": round(p0, 3),
        "probe_after": round(p1, 3),
        "queries": {
            "headline_tile_pip_join": round(r["sec"], 3),
            "headline_median": round(r["median_sec"], 3),
        },
        "rows": r["rows"],
        "ts": time.strftime("%H:%M:%S"),
    }
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    if "--report" in sys.argv:
        report()
    elif "--headline" in sys.argv:
        args = [a for a in sys.argv[1:] if a.isdigit()]
        for c in range(int(args[0]) if args else 3):
            headline_cycle(c)
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
        for c in range(n):
            cycle(c)
            time.sleep(5)

"""Wait for a calm host window, then run the full bench suite once.

The sandbox host has multi-minute degraded phases (BENCH/BASELINE.md
r1 forensics) in which every JVM query slows uniformly 1.2-3x; a
full-suite self-check started inside one reads as a fake regression
cluster (this bit rounds 3 AND 4). This tool probes the host every
--interval seconds and only launches `python bench.py` once the probe
is at the calm floor, then records the probe before and after next to
the suite JSON so the run is classifiable.

Usage: python tools/calm_bench.py [out.json] [--threshold 0.05]
       [--attempts 30] [--interval 120]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    from scaling_hunt import host_probe

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else os.path.join(REPO, "BENCH", "selfcheck_calm.json")

    def opt(name: str, default: float) -> float:
        return float(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    threshold = opt("--threshold", 0.05)
    attempts = int(opt("--attempts", 30))
    interval = opt("--interval", 120)

    for i in range(attempts):
        p = host_probe()
        print(f"attempt {i}: probe {p:.3f}", flush=True)
        if p <= threshold:
            t0 = time.strftime("%H:%M:%S")
            run = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True,
                text=True,
                timeout=3600,
                cwd=REPO,
            )
            line = [l for l in run.stdout.strip().splitlines() if l.startswith("{")][-1]
            doc = json.loads(line)
            p_after = host_probe()
            rec = {
                "probe_before": round(p, 3),
                "probe_after": round(p_after, 3),
                "started": t0,
                "finished": time.strftime("%H:%M:%S"),
                "parsed": doc,
            }
            with open(out_path, "w") as f:
                json.dump(rec, f, indent=2)
            print(json.dumps({k: rec[k] for k in ("probe_before", "probe_after")} | {"suite_sec": doc["value"]}), flush=True)
            return
        time.sleep(interval)
    print("no calm window found", flush=True)


if __name__ == "__main__":
    main()

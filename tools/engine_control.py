"""JVM compute-bound scaling control: a pure-codegen Spark job with
negligible I/O and shuffle (spark.range -> transcendental math -> one
scalar agg). Whatever efficiency THIS job achieves between local[8]
and local[32] is the ceiling any Spark job can reach on this host —
run it next to the headline to separate engine limits from host
(memory-bus / vCPU-steal) limits.

Usage: python tools/engine_control.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def one(cpus: int, rows: int) -> float:
    code = f"""
import sys, time, json
sys.path.insert(0, {REPO!r})
from rasterio_spark.plans.session import get_session
from pyspark.sql import functions as F
spark = get_session(app_name="ectl", cores={cpus}, shuffle_partitions={cpus})
df = spark.range(0, {rows}, 1, {cpus * 4})
expr = F.sqrt(F.abs(F.sin(F.col("id") * 1e-7) + F.cos(F.col("id") * 3e-7)))
def run():
    t0 = time.perf_counter()
    df.select(F.sum(expr)).collect()
    return time.perf_counter() - t0
run()
print(json.dumps({{"sec": min(run() for _ in range(3))}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["sec"]


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000_000
    s8 = one(8, rows)
    s32 = one(32, rows)
    print(
        json.dumps(
            {
                "rows": rows,
                "sec8": round(s8, 2),
                "sec32": round(s32, 2),
                "jvm_control_eff": round((s8 / s32) / 4.0, 4),
                "ts": time.strftime("%H:%M:%S"),
            }
        )
    )

"""Build the spark-submit --py-files artifact (north_rule: "ships as a
spark-submit --py-files package").

    python tools/package_pyfiles.py [out.zip]

Zips the rasterio_spark package (source only, no caches/tests) so a
cluster job runs as:

    spark-submit --py-files rasterio_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "rasterio_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "rasterio_spark.zip")
    print(build(out))

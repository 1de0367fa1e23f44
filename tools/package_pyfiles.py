"""Build the --py-files artifact: dist/gliner_spark.zip.

The north rule runs the job "via spark-submit --py-files on a
multi-executor cluster" (BASELINE.json:north_rule). This packages the
library (pure Python — no build step) so executors can import it:

    python tools/package_pyfiles.py
    spark-submit --master yarn --py-files dist/gliner_spark.zip \\
        jobs/run_kg.py --input s3://crawl/pages --output s3://kg/out

Usage: python tools/package_pyfiles.py [out_dir]
Prints the artifact path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "gliner_spark.zip")
    pkg = os.path.join(REPO, "gliner_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))

"""Secondary scaling evidence: a SHUFFLE-HEAVY job at N vs 4N cores.

bench.py's scaling proxy measures the flagship NER job, which is
embarrassingly parallel (scan → one Python stage → sink). The north
rule also demands that partitioning/shuffle-heavy stages scale — this
probe times **MinHash-LSH dedup** (shingle explode → map-side-combined
128-perm signature aggregation → band-key shuffle → band self-join →
shingle re-join + exact verification: three shuffles, two joins) on a
deterministic synthetic corpus at two parallelism levels in separate
JVMs, using the same protocol as bench.py (interleaved windows,
min-of-two per window, min over windows per level — additive-noise
argument in BENCH.md).

Usage:
  python tools/scale_probe.py                 # 2 vs 8 cores, 100k pages
  SCALE_PROBE_PAGES=50000 SCALE_PROBE_N=2 SCALE_PROBE_WINDOWS=2 \\
    python tools/scale_probe.py

Prints one JSON line; paste the numbers into BASELINE.md's measured
section. Not part of the driver bench contract (bench.py's output and
runtime stay stable across rounds).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = int(os.environ.get("SCALE_PROBE_PAGES", "100000"))
N = int(os.environ.get("SCALE_PROBE_N", "2"))
WINDOWS = int(os.environ.get("SCALE_PROBE_WINDOWS", "2"))


def run_worker(cores: int, pages: int) -> float:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from gliner_spark.operators.dedup import minhash_dups
    from gliner_spark.session import build_session
    from gliner_spark.sources.pages import synthesize_pages

    spark = build_session(app_name=f"scale-probe-{cores}", cores=cores)
    # FIXED split count at both levels: on a real cluster the input
    # files/splits are identical at N and 4N executors — sizing splits
    # to the core count would hand the small cluster artificially
    # coarse (lower-overhead) tasks and bias efficiency downward
    n_splits = int(os.environ.get("SCALE_PROBE_SPLITS", "16"))
    docs = synthesize_pages(
        spark, pages, num_partitions=n_splits
    ).select(F.xxhash64("url").alias("doc_id"), "text")

    def job():
        minhash_dups(docs).write.format("noop").mode("overwrite").save()

    job()  # warm: JIT, codegen, shuffle service
    times = []
    for _ in range(2):
        t0 = time.monotonic()
        job()
        times.append(time.monotonic() - t0)
    spark.stop()
    return round(min(times), 3)


def spawn(cores: int) -> float:
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cores), str(PAGES)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-2000:])
    return float(res.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        print(run_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2])))
        return
    t_lo = t_hi = None
    for _ in range(WINDOWS):
        a = spawn(N)
        b = spawn(N * 4)
        t_lo = a if t_lo is None else min(t_lo, a)
        t_hi = b if t_hi is None else min(t_hi, b)
    eff = round((PAGES / t_hi) / (4 * PAGES / t_lo), 3)
    print(json.dumps({
        "job": "minhash_lsh_dedup",
        "pages": PAGES,
        "cores_n": N,
        "cores_4n": N * 4,
        "sec_n": t_lo,
        "sec_4n": t_hi,
        "pages_per_sec_n": round(PAGES / t_lo, 1),
        "pages_per_sec_4n": round(PAGES / t_hi, 1),
        "efficiency": eff,
    }))


if __name__ == "__main__":
    main()

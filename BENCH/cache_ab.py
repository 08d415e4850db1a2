"""cache=False contract A/B (VERDICT r5 task 5).

``cache=False`` is the production-representative 100 TB path (SURVEY §4.3:
one shared scan fused across check families, no persist — a 100 TB
snapshot does not fit in cluster storage memory), but it had no committed
throughput number. This records a quiet interleaved A/B at one parallelism
level on the big bench fixture:

  A: cache=True + pre-count + overlapped write/collect (the bench default)
  B: cache=False + sequential actions (overlap auto-disables: two cold
     actions would double-compute the scan — measured r5)

Each leg is a fresh JVM (subprocess) with a 120k-fixture warm-up and ONE
timed run, interleaved A,B,A,B... so co-tenant drift hits both arms
equally. Also records the Spark job-count per mode (driver-side proxy for
the extra actions the cached mode runs) via the status tracker.

Writes BENCH/cache_ab_result.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB_FILES = int(os.environ.get("CACHE_AB_FILES", "9600000"))
AB_CORES = int(os.environ.get("CACHE_AB_CORES", "8"))
AB_REPS = int(os.environ.get("CACHE_AB_REPS", "3"))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from raqc_spark.session import get_spark
import bench
cache = sys.argv[1] == "1"
root = bench.bench_fixture_dir({files})
nbytes = 0
for dirpath, _dn, fns in os.walk(root):
    for f in fns:
        if f.endswith(".parquet"):
            nbytes += os.path.getsize(os.path.join(dirpath, f))
split = max(2 << 20, nbytes // {splits})
spark = get_spark("raqc_cache_ab", master="local[{cores}]",
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.sql.files.maxPartitionBytes": str(split)}})
bench.run_contract_once(spark, bench.bench_fixture_dir(120_000), cache=cache)
tracker = spark.sparkContext.statusTracker()
jobs_before = len(tracker.getJobIdsForGroup(None) or [])
rows, wall = bench.run_contract_once(spark, root, cache=cache)
jobs_after = len(tracker.getJobIdsForGroup(None) or [])
print(json.dumps({{"cache": cache, "rows": rows, "wall": round(wall, 3),
                   "n_jobs": jobs_after - jobs_before}}))
"""


def _run(cache: bool) -> dict:
    script = CHILD.format(repo=REPO, files=AB_FILES, splits=8 * AB_CORES,
                          cores=AB_CORES)
    out = subprocess.run(
        [sys.executable, "-c", script, "1" if cache else "0"],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sys.path.insert(0, REPO)
    from BENCH.scaling import wait_for_quiet

    reps = []
    for i in range(AB_REPS):
        wait_for_quiet()
        a = _run(True)
        b = _run(False)
        reps.append({"cached_overlap": a, "nocache_seq": b})
        print(f"rep {i}: cache=True {a['wall']:.1f}s ({a['n_jobs']} jobs) | "
              f"cache=False {b['wall']:.1f}s ({b['n_jobs']} jobs)",
              flush=True)

    best_a = min(r["cached_overlap"]["wall"] for r in reps)
    best_b = min(r["nocache_seq"]["wall"] for r in reps)
    rows = reps[0]["cached_overlap"]["rows"]
    result = {
        "metric": f"contract wall local[{AB_CORES}], cache=True+overlap vs "
                  "cache=False sequential (shared-scan fusion)",
        "rows": rows,
        "fixture_files": AB_FILES,
        "reps": reps,
        "cached_overlap_best_sec": best_a,
        "nocache_seq_best_sec": best_b,
        "nocache_penalty": round(best_b / best_a, 3),
        "rows_per_sec_cached": round(rows / best_a, 1),
        "rows_per_sec_nocache": round(rows / best_b, 1),
    }
    with open(os.path.join(REPO, "BENCH", "cache_ab_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "reps"}))


if __name__ == "__main__":
    main()

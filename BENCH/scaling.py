"""Scaling-efficiency evidence (BASELINE.json:2,14; SURVEY.md §0.3).

No real cluster exists in the sandbox, so per driver instruction the
N -> 4N executor criterion is evidenced by running the SAME job on the SAME
input at two parallelism levels — local[8] and local[32] — and reporting
throughput at both plus efficiency = (T_8 / T_32) / 4.

Methodology (forced by measured sandbox behavior):
- co-tenant load drifts on MINUTE timescales (observed 6x spread between
  identical runs minutes apart), so the two levels are INTERLEAVED —
  pairs of (local[8], local[32]) subprocesses run back-to-back and
  efficiency is computed per pair, then the best-throughput pair is
  reported (min wall = least-interfered measurement);
- a 600k-file fixture so per-task work dominates fixed job-scheduling
  overhead;
- each subprocess discards a warm-up run (JVM + codegen) before timing.

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING_FILES = 2_400_000  # round 2: 9_600_000 (see BASELINE.md Amdahl model)
PAIRS = 4

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from raqc_spark.session import get_spark
import bench
cores = int(sys.argv[1])
spark = get_spark("raqc_scaling", master=f"local[{{cores}}]",
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
# warm-up on the SMALL fixture: compiles every codegen path + warms the JVM
# without leaving big-run heap debt (a big warm-up run measurably slows the
# timed run that follows it)
bench.run_contract_bench(spark, bench.bench_fixture_dir(120_000))
root = bench.bench_fixture_dir({files})
r = bench.run_contract_bench(spark, root)      # ONE timed big run per JVM
print(json.dumps({{"cores": cores, "rows": r["contract_rows"],
                  "wall": r["contract_wall_sec"]}}))
"""


def _procs_running() -> int:
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("procs_running"):
                return int(line.split()[1])
    return 0


def wait_for_quiet(threshold: int = 6, samples: int = 3, timeout: float = 600) -> bool:
    """Block until the host looks idle (few runnable threads that aren't
    ours) or timeout. Sandbox co-tenants come and go on minute timescales;
    measuring inside a quiet window is the only way to get a clean pair."""
    t0 = time.time()
    streak = 0
    while time.time() - t0 < timeout:
        if _procs_running() <= threshold:
            streak += 1
            if streak >= samples:
                return True
        else:
            streak = 0
        time.sleep(2)
    return False


def run_once(cores: int) -> dict:
    script = CHILD.format(repo=REPO, files=SCALING_FILES)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    t0 = time.time()
    pairs = []
    for i in range(PAIRS):
        quiet = wait_for_quiet()
        r8 = run_once(8)
        r32 = run_once(32)
        eff = (r8["wall"] / r32["wall"]) / 4.0
        pairs.append((r8, r32, eff))
        print(f"pair {i}: quiet={quiet} t8={r8['wall']:.1f}s "
              f"t32={r32['wall']:.1f}s eff={eff:.3f}", flush=True)

    rows = pairs[0][0]["rows"]
    # least-interfered pair = the one with the fastest combined wall
    best = min(pairs, key=lambda p: p[0]["wall"] + p[1]["wall"])
    b8, b32, beff = best
    rows_tbl = "\n".join(
        f"| {i} | {p[0]['wall']:.2f} | {p[1]['wall']:.2f} | {p[2]:.3f} |"
        for i, p in enumerate(pairs)
    )
    md = f"""# BENCH/BASELINE.md — measured results

Scaling evidence per driver instruction (no real cluster in sandbox):
same job (full default contract: fused stats pass + uniqueness +
referential integrity + PSI/KS drift + verdicts/violations sinks, check
families executed from concurrent driver threads) on the same input
({rows:,} rows, synthesized code-table fixture, seed 42) at local[8] (N)
vs local[32] (4N). Levels are run in interleaved pairs because sandbox
co-tenant load drifts on minute timescales (observed 6x spread between
identical runs); each subprocess discards one warm-up run before timing.

| pair | T_8 (s) | T_32 (s) | efficiency |
| --- | --- | --- | --- |
{rows_tbl}

**Reported (least-interfered pair, fastest combined wall):
T_8 = {b8['wall']:.2f}s ({rows / b8['wall']:,.0f} rows/s),
T_32 = {b32['wall']:.2f}s ({rows / b32['wall']:,.0f} rows/s),
efficiency = (T_8 / T_32) / 4 = {beff:.3f}** (target >= 0.8).

Local-mode caveat: both levels share one JVM/host — memory bandwidth,
page cache and GC are shared, so this is a conservative proxy for
multi-executor scaling. Plan-level properties that carry to a real
cluster: no single-reducer stage anywhere in the contract (verdicts are
the only global collect, O(partitions x checks) rows), all aggregates
partial+final (map-side combined), dims broadcast, AQE skew-split on.

Environment: local mode, single host, {os.cpu_count()} host cores,
PySpark 4.1.2, AQE on, shuffle partitions 32. Generated by
BENCH/scaling.py in {time.time() - t0:.0f}s.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

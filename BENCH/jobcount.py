"""Diagnostic: count Spark jobs per contract run (the non-scaling floor).

BENCH/BASELINE.md traced the ~16s fixed floor at local[2] to 43 AQE
query-stage / broadcast-materialization sub-jobs per run; each job pays a
fixed scheduling latency that no parallelism removes. This script counts
them via a job-group-scoped status tracker so floor work is measurable:
run before/after any plan change that claims to cut the floor.
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from raqc_spark.contract import default_contract
    from raqc_spark.runner import run_contract
    from raqc_spark.session import get_spark

    files = int(os.environ.get("JOBCOUNT_FILES", "120000"))
    cores = int(os.environ.get("JOBCOUNT_CORES", "8"))
    spark = get_spark(
        "raqc_jobcount", master=f"local[{cores}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = bench.bench_fixture_dir(files)
    s1 = spark.read.parquet(f"{root}/code_files_s1.parquet")
    s2 = spark.read.parquet(f"{root}/code_files_s2.parquet")
    commits = spark.read.parquet(f"{root}/commits.parquet")
    # warm-up (untimed, uncounted)
    run_dir = tempfile.mkdtemp(prefix="raqc_jobs_warm_")
    run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                 run_dir=run_dir, resume=False, granularity="run")
    shutil.rmtree(run_dir, ignore_errors=True)

    sc = spark.sparkContext
    sc.setJobGroup("contract", "jobcount probe")
    run_dir = tempfile.mkdtemp(prefix="raqc_jobs_")
    t0 = time.perf_counter()
    res = run_contract(spark, default_contract(), s2, s1=s1,
                       commits_dim=commits, run_dir=run_dir, resume=False,
                       granularity="run")
    res.verdicts.collect()
    wall = time.perf_counter() - t0
    sc.setJobGroup("", "")
    ids = sc.statusTracker().getJobIdsForGroup("contract")
    print(f"files={files} cores={cores} jobs={len(ids)} wall={wall:.2f}s")
    tracker = sc.statusTracker()
    for jid in sorted(ids):
        ji = tracker.getJobInfo(jid)
        if ji:
            print(f"  job {jid}: stages={list(ji.stageIds)} status={ji.status}")
    shutil.rmtree(run_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

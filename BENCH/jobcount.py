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
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # REST attribution needs the UI; engine default disables it
            "spark.ui.enabled": "true",
        },
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
    ids = set(sc.statusTracker().getJobIdsForGroup("contract"))
    print(f"files={files} cores={cores} jobs={len(ids)} wall={wall:.2f}s")
    # attribute each job via the UI REST API (name + duration)
    try:
        import json as _json
        import urllib.request

        base = sc.uiWebUrl
        app = sc.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
            jobs = _json.load(r)
        for j in sorted(jobs, key=lambda x: x["jobId"]):
            if j["jobId"] in ids:
                dur = ""
                if j.get("submissionTime") and j.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t0_ = datetime.strptime(j["submissionTime"][:-3], fmt.replace("%Z", ""))
                    t1_ = datetime.strptime(j["completionTime"][:-3], fmt.replace("%Z", ""))
                    dur = f" {(t1_ - t0_).total_seconds():.2f}s"
                print(f"  job {j['jobId']}{dur}: {j['name'][:110]}")
    except Exception as e:  # pragma: no cover
        print("REST attribution unavailable:", e)
    shutil.rmtree(run_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

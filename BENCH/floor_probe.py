"""Floor probe: where do the non-scaling seconds go?

Runs the full default contract (run-mode) on a small fixture at local[8]
with the Spark event log enabled, then decomposes wall time into
per-job execution time + inter-job driver gaps (planning/AQE/codegen/
Python orchestration). The inter-job gap is pure non-scaling floor; job
time on a tiny fixture is mostly per-job scheduling floor too.

Usage: python BENCH/floor_probe.py [n_files] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    evdir = "/tmp/raqc_eventlog"
    import shutil
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    import bench
    from raqc_spark.session import get_spark

    spark = get_spark(
        "raqc_floor_probe",
        master=f"local[{cores}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.dir": evdir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    root = bench.bench_fixture_dir(n_files)
    bench.run_contract_once(spark, root)  # warm-up (JIT + codegen)
    t0_epoch = time.time() * 1000.0
    t0 = time.perf_counter()
    rows, wall = bench.run_contract_once(spark, root)
    total = time.perf_counter() - t0
    spark.stop()

    jobs: dict[int, dict] = {}
    ev_files = []
    for dirpath, _dn, filenames in os.walk(evdir):
        ev_files.extend(os.path.join(dirpath, f) for f in filenames)
    for path in ev_files:
        with open(path, errors='ignore') as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": ev.get("Properties", {}).get(
                            "spark.job.description", ""
                        )[:90],
                        "stages": len(ev.get("Stage Infos", [])),
                        "tasks": sum(
                            s.get("Number of Tasks", 0)
                            for s in ev.get("Stage Infos", [])
                        ),
                    }
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]

    ordered = sorted(jobs.items())
    # keep only jobs inside the SECOND (timed) contract run: the timed run is
    # the last contiguous burst; approximate by taking jobs whose start is
    # within the last `wall` seconds of the final job end
    window = [
        (jid, j) for jid, j in ordered if "end" in j and j["end"] >= t0_epoch
    ]
    prev_end = None
    job_time = 0.0
    gap_time = 0.0
    print(f"timed contract: rows={rows} wall={wall:.2f}s (outer {total:.2f}s)")
    print(f"{'job':>4} {'t_rel':>7} {'dur_s':>7} {'gap_s':>7} {'stages':>6} {'tasks':>6}  desc")
    for jid, j in window:
        dur = (j["end"] - j["start"]) / 1000.0
        gap = 0.0 if prev_end is None else max(0.0, (j["start"] - prev_end) / 1000.0)
        prev_end = max(j["end"], prev_end or 0)
        job_time += dur
        gap_time += gap
        print(
            f"{jid:>4} {(j['start'] - t0_epoch) / 1000.0:>7.2f} {dur:>7.3f} "
            f"{gap:>7.3f} {j['stages']:>6} {j['tasks']:>6}  {j['desc']}"
        )
    print(
        f"jobs={len(window)} job_time={job_time:.2f}s inter_job_gaps="
        f"{gap_time:.2f}s wall={wall:.2f}s "
        f"unaccounted={wall - job_time - gap_time:.2f}s"
    )


if __name__ == "__main__":
    main()

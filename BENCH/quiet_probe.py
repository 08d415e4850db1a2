"""Quiet-window probe for flagged headline-query regressions.

Re-measures named ``queries()`` entries under the same conditions bench.py
uses (sf0.1, local[$SPARK_GRAFT_CPUS]) but with a STRICT idle gate before
every repetition and a procs_running sample around each, so a number can be
attributed to the engine or to co-tenant load instead of guessed at
(VERDICT r4 "What's wrong" #3: align_snapshots 6.57s and
simsearch_cosine_topk 2.21s were flagged by the self-report and never
cleared).

Usage: python BENCH/quiet_probe.py [query ...]   (default: the r4 flagged
pair). Writes BENCH/regression_probe_r<N>.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _procs_running, _round_no, wait_for_quiet  # noqa: E402

DEFAULT = ["align_snapshots", "simsearch_cosine_topk"]
REPS = 5


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    from raqc_spark.session import get_spark

    spark = get_spark("raqc_quiet_probe", master=f"local[{cpus}]")
    queries = entry_mod.queries()
    # warm-up: JVM + codegen + parquet footers, never timed
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        queries[name](spark, sf_dir).count()

    out: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        reps = []
        for _ in range(REPS):
            quiet = wait_for_quiet(threshold=5, samples=3, timeout=120)
            p0 = _procs_running()
            t0 = time.perf_counter()
            q(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            reps.append({"sec": round(dt, 3), "quiet": quiet,
                         "procs": [p0, _procs_running()]})
        quiet_secs = [r["sec"] for r in reps if r["quiet"]]
        out[name] = {
            "reps": reps,
            "best_sec": round(min(r["sec"] for r in reps), 3),
            "best_quiet_sec": round(min(quiet_secs), 3) if quiet_secs else None,
            "n_quiet": len(quiet_secs),
        }

    doc = {"sf_dir": sf_dir, "cpus": int(cpus), "reps": REPS, "results": out}
    path = os.path.join(REPO, "BENCH", f"regression_probe_r{_round_no()}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

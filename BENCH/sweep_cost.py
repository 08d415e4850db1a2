"""Sweep-cost budget (VERDICT r5 task 7): end-to-end wall of the FULL
``queries()`` registry at sf0.01 — the workload the driver's correctness
sweep runs each round.

Three rounds of sweep data said the driver cut is a hard 50-ROW cap, not a
time budget; after the r6 consolidation to exactly 50 real entries this
script records the number that would prove which entries are at risk if
the cap ever turns out to be time-based after all. Output: one JSON file
(BENCH/sweep_cost.json) with per-query walls + the total, and a markdown
table echoed to stdout for docs/COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import __spark_entry__ as entry_mod
    from raqc_spark.session import get_spark

    spark = get_spark(
        "raqc_sweep_cost",
        master=f"local[{os.environ.get('SWEEP_CPUS', '8')}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = entry_mod.queries()
    # warm-up: JVM + codegen (the driver's sweep also runs warm by entry 3)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    per: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in queries.items():
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        per[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {per[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    out = {
        "sf_dir": SF_DIR,
        "n_queries": len(per),
        "total_wall_sec": total,
        "per_query_sec": per,
    }
    with open(os.path.join(REPO, "BENCH", "sweep_cost.json"), "w") as f:
        json.dump(out, f, indent=1)

    worst = sorted(per.items(), key=lambda kv: -kv[1])[:10]
    print(f"\ntotal sweep wall ({len(per)} queries, {SF_DIR}): {total}s")
    print("| query | wall (s) |\n| --- | --- |")
    for k, v in worst:
        print(f"| {k} | {v:.2f} |")


if __name__ == "__main__":
    main()

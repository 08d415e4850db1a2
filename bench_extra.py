"""Round-7 optimization measurement harness (bench.py is FROZEN — this file
holds all extra instrumentation: per-query noop-sink isolation, plan dumps,
count-vs-noop timing at an arbitrary SF dir).

Usage:
  python bench_extra.py plans  [out_suffix] [sf_dir] [q1 q2 ...]
  python bench_extra.py time   [sf_dir]     [q1 q2 ...]

`plans` writes plans/r07/<query>_<suffix>.txt with explain("formatted").
`time` prints one JSON line: {"sf_dir":..., "queries": {name: {"count": s,
"noop": s}}} using best-of-3 like the frozen bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "pricing_summary", "check_col_stats", "check_length_quantiles",
    "check_uniqueness", "check_ref_integrity", "align_snapshots",
    "hist2d", "hist_outlier", "drift_psi", "drift_ks", "verdict_rollup",
    "report_cube", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "simsearch_cosine_topk", "simsearch_ivf", "text_token_count",
    "text_quality", "doc_fingerprint", "media_bounds",
]


def _spark():
    from raqc_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark("raqc_bench_extra", master=f"local[{cpus}]")


def dump_plans(suffix: str, sf_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    spark = _spark()
    queries = entry.queries()
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


def time_queries(sf_dir: str, names: list[str], reps: int = 3) -> None:
    import __spark_entry__ as entry

    spark = _spark()
    queries = entry.queries()
    # same warmup as frozen bench
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        spark.sparkContext.setJobDescription(f"r07 {name}")
        best_c = best_n = None
        for _ in range(reps):
            t0 = time.perf_counter()
            q(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best_c = dt if best_c is None else min(best_c, dt)
        for _ in range(reps):
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best_n = dt if best_n is None else min(best_n, dt)
        out[name] = {"count": round(best_c, 3), "noop": round(best_n, 3)}
        print(f"# {name}: count={best_c:.3f}s noop={best_n:.3f}s",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        names = sys.argv[4:] or HEADLINE
        dump_plans(suffix, sf_dir, names)
    else:
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        names = sys.argv[3:] or HEADLINE
        time_queries(sf_dir, names)

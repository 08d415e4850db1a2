"""Benchmark harness (driver contract: ONE JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the full validation contract over a cached
synthesized code-table fixture (the primary metric: constraint-check
throughput rows/s, BASELINE.json:2).

Extra keys beyond the required schema: contract_rows_per_sec, contract_rows.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_FIXTURE_FILES = 120_000
HEADLINE = [
    "pricing_summary",
    "check_col_stats",
    "check_length_quantiles",
    "check_uniqueness",
    "check_ref_integrity",
    "align_snapshots",
    "hist2d",
    "drift_psi",
    "drift_ks",
    "verdict_rollup",
    "report_cube",
    "dedup_minhash_lsh",
    "simsearch_cosine_topk",
    "text_quality",
    "doc_fingerprint",
]


def bench_fixture_dir(n_files: int = BENCH_FIXTURE_FILES) -> str:
    """Generate-once cache of the bench-scale code fixture."""
    root = os.path.join(REPO, "BENCH", "fixtures", f"code_{n_files}")
    marker = os.path.join(root, "_complete")
    if not os.path.exists(marker):
        from fixtures.generate import generate, write_fixture

        if os.path.isdir(root):
            shutil.rmtree(root)
        fx = generate(n_files=n_files, n_repos=64, seed=42)
        write_fixture(fx, root)
        open(marker, "w").write("ok")
    return root


def run_contract_bench(spark, fixture_root: str) -> dict:
    from raqc_spark.contract import default_contract
    from raqc_spark.runner import run_contract

    s1 = spark.read.parquet(f"{fixture_root}/code_files_s1.parquet")
    s2 = spark.read.parquet(f"{fixture_root}/code_files_s2.parquet")
    commits = spark.read.parquet(f"{fixture_root}/commits.parquet")
    n_rows = s2.count()
    run_dir = tempfile.mkdtemp(prefix="raqc_bench_")
    t0 = time.perf_counter()
    res = run_contract(
        spark, default_contract(), s2, s1=s1, commits_dim=commits,
        run_dir=run_dir, resume=False, granularity="run",
    )
    res.verdicts.collect()
    wall = time.perf_counter() - t0
    shutil.rmtree(run_dir, ignore_errors=True)
    return {
        "contract_rows": n_rows,
        "contract_wall_sec": round(wall, 3),
        "contract_rows_per_sec": round(n_rows / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry_mod
    from raqc_spark.session import get_spark

    spark = get_spark("raqc_bench", master=f"local[{cpus}]")
    queries = entry_mod.queries()

    # JVM warm-up on a trivial action
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    fixture_root = bench_fixture_dir()
    contract = run_contract_bench(spark, fixture_root)

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        q = queries[name]
        best = None
        for _ in range(2):  # best-of-2: damp sandbox noise + codegen warmup
            t0 = time.perf_counter()
            q(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_query[name] = round(best, 3)
    total = round(sum(per_query.values()) + contract["contract_wall_sec"], 3)

    out = {
        "metric": "validation-suite wall time (contract + headline queries)",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        **contract,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

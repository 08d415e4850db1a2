"""run_contract — lifecycle orchestration with checkpoint/resume.

Analogue of RAQC's eager CLI pipeline (SURVEY.md §3.1), but lazy and
resumable (BASELINE.json:14 "resumable from checkpoint with per-partition
lineage + metrics"):

- each check *family* (shared-scan group, plan.compile_plan) executes as one
  Spark job writing its violations to ``<run_dir>/violations/family=<id>/``;
- after a family completes, a manifest entry is appended **atomically**
  (write-tmp-then-rename, SURVEY.md §7.3.4) carrying per-partition lineage:
  n_rows, n_violations, metric and pass per (check, partition_id);
- re-running with the same run_dir skips completed families (their verdicts
  are reconstructed from the manifest — no recompute, no rescan).
"""

from __future__ import annotations

import json
import os
import re
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from raqc_spark.contract import Contract
from raqc_spark.plan import CompiledFamily, compile_plan, prepare, union_verdicts
from raqc_spark.results import VERDICT_SCHEMA


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


@dataclass
class RunResult:
    verdicts: DataFrame
    run_dir: str
    families_run: list[str]
    families_skipped: list[str]

    @property
    def passed(self) -> bool:
        return self.verdicts.filter("NOT pass").count() == 0


class Manifest:
    """Append-only JSON checkpoint manifest, atomically swapped per entry.
    Thread-safe: families complete concurrently (run_contract pool)."""

    def __init__(self, run_dir: str) -> None:
        self.path = os.path.join(run_dir, "manifest.json")
        self._lock = threading.Lock()

    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {"families": {}}
        with open(self.path) as f:
            return json.load(f)

    def complete_family(self, family: str, verdict_rows: list[dict]) -> None:
        with self._lock:
            data = self.load()
            data["families"][family] = {"verdicts": verdict_rows}
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(data, f, sort_keys=True)
            os.replace(tmp, self.path)

    def completed(self) -> dict[str, list[dict]]:
        return {k: v["verdicts"] for k, v in self.load()["families"].items()}


def _run_family(
    fam: CompiledFamily, run_dir: str, manifest: Manifest
) -> list[dict]:
    verdicts, violations = fam.build()
    if violations is not None:
        out = os.path.join(run_dir, "violations", f"family={_safe(fam.name)}")
        # parquet overwrite of the family dir is idempotent; the manifest
        # entry (written only after success) is the commit point.
        violations.write.mode("overwrite").parquet(out)
    rows = [r.asDict() for r in verdicts.collect()]  # tiny: P × checks rows
    manifest.complete_family(fam.name, rows)
    return rows


def _run_batched(
    families: list[CompiledFamily], run_dir: str, manifest: Manifest
) -> list[dict]:
    """granularity='run': union every family's violations into ONE write and
    every family's verdicts into ONE collect (two actions total), then split
    the collected rows back out into per-family manifest entries."""
    from pyspark.sql import functions as F

    verdict_parts, viol_parts = [], []
    for fam in families:
        v, viol = fam.build()
        verdict_parts.append(v)
        if viol is not None:
            viol_parts.append(viol.withColumn("family", F.lit(_safe(fam.name))))
    if viol_parts:
        allv = viol_parts[0]
        for p in viol_parts[1:]:
            allv = allv.unionByName(p)
        out = os.path.join(run_dir, "violations")
        allv.write.mode("overwrite").partitionBy("family").parquet(out)
    rows = [r.asDict() for r in union_verdicts(verdict_parts).collect()]
    by_check: dict[str, list[dict]] = {}
    for r in rows:
        by_check.setdefault(r["check_name"], []).append(r)
    for fam in families:
        fam_rows = [r for c in fam.checks for r in by_check.get(c.name, [])]
        manifest.complete_family(fam.name, fam_rows)
    return rows


def run_contract(
    spark: SparkSession,
    contract: Contract,
    s2: DataFrame,
    s1: DataFrame | None = None,
    commits_dim: DataFrame | None = None,
    run_dir: str = "/tmp/raqc_spark_run",
    resume: bool = True,
    cache: bool = True,
    granularity: str = "family",
) -> RunResult:
    """Run the full contract; returns verdicts + writes violation sinks.

    ``cache=True`` persists the prepared snapshot across check families
    (right call in local/bench mode; on a 100 TB cluster rely on the
    shared-scan fusion instead and pass cache=False).

    ``granularity`` — checkpoint/action granularity:
      * ``"family"``: one violations write + one verdict collect per check
        family; resumable at family level (the default).
      * ``"run"``: the whole contract executes as TWO actions — one union
        violations write, one union verdict collect. ~5x fewer job barriers,
        the right mode for throughput runs; the manifest still records
        per-family (and per-partition) lineage afterwards, so a re-run
        resumes family-wise either way.
    """
    os.makedirs(run_dir, exist_ok=True)
    manifest = Manifest(run_dir)
    done = manifest.completed() if resume else {}

    s2p = prepare(s2, contract)
    s1p = prepare(s1, contract) if s1 is not None else None
    if cache:
        s2p = s2p.persist()

    families = compile_plan(spark, contract, s2p, s1p, commits_dim, raw_schema=s2.schema)
    all_rows: list[dict] = []
    ran, skipped = [], []
    to_run = []
    for fam in families:
        if fam.name in done:
            all_rows.extend(done[fam.name])
            skipped.append(fam.name)
        else:
            to_run.append(fam)
    try:
        if cache and to_run:
            s2p.count()  # materialize the cache once before fan-out
        if granularity == "run" and to_run:
            all_rows.extend(_run_batched(to_run, run_dir, manifest))
            ran.extend(f.name for f in to_run)
        else:
            # Families are independent DAGs -> submit them from concurrent
            # driver threads; Spark's scheduler interleaves their stages so
            # small stages don't serialize the whole contract (FAIR-ish use
            # of the cluster without touching scheduler pools).
            workers = int(os.environ.get("RAQC_FAMILY_WORKERS", "0")) or max(
                1, len(to_run)
            )
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futures = [
                    pool.submit(_run_family, fam, run_dir, manifest)
                    for fam in to_run
                ]
                for fam, fut in zip(to_run, futures, strict=True):
                    all_rows.extend(fut.result())
                    ran.append(fam.name)
    finally:
        if cache:
            s2p.unpersist()

    verdicts = spark.createDataFrame(
        [tuple(r[f.name] for f in VERDICT_SCHEMA.fields) for r in all_rows],
        schema=VERDICT_SCHEMA,
    )
    return RunResult(verdicts, run_dir, ran, skipped)

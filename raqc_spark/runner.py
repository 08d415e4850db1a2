"""run_contract — lifecycle orchestration with checkpoint/resume.

Analogue of RAQC's eager CLI pipeline (SURVEY.md §3.1), but lazy and
resumable (BASELINE.json:14 "resumable from checkpoint with per-partition
lineage + metrics"):

- each check *family* (shared-scan group, plan.compile_plan) executes as one
  Spark job writing its violations to ``<run_dir>/violations/family=<id>/``,
  physically partitioned by ``partition_id`` and written with DYNAMIC
  partition overwrite — a retry replaces exactly the partitions it
  recomputed, never a sibling family's (or partition's) checkpointed output;
- after each unit of work completes, a manifest entry is appended
  **atomically** (write-tmp-then-rename, SURVEY.md §7.3.4) carrying
  per-partition lineage: n_rows, n_violations, metric and pass per
  (check, partition_id), plus a ``complete`` flag per family;
- the manifest also pins a **fingerprint** of (contract, input files); a
  resume against a run_dir checkpointed under a different contract or input
  refuses instead of silently reusing stale verdicts;
- re-running with the same run_dir skips completed families outright and,
  for a partially-completed splittable family, recomputes ONLY the missing
  partition_ids (the completed partitions' verdicts are reconstructed from
  the manifest — no recompute, no rescan);
- ``partition_batches > 1`` runs each splittable family as several partition
  batches with a manifest commit after each — bounded retry blast radius at
  10^12-file scale, and the unit a mid-family crash resumes from.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import threading
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raqc_spark.contract import Contract
from raqc_spark.plan import CompiledFamily, compile_plan, prepare, union_verdicts
from raqc_spark.results import VERDICT_SCHEMA


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


#: RFC 3986 scheme followed by "://" — distinguishes real URIs (decode the
#: percent-encoding) from bare filesystem paths (never decode; ADVICE r4).
_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


@dataclass
class RunResult:
    verdicts: DataFrame
    run_dir: str
    families_run: list[str]
    families_skipped: list[str]
    # families that resumed mid-way: name -> partition_ids recomputed
    partitions_resumed: dict[str, list[int]]

    @property
    def passed(self) -> bool:
        return self.verdicts.filter("NOT pass").count() == 0


def _file_stamp(uri: str) -> str:
    """path + size + mtime: a parquet file rewritten IN PLACE at the same
    path (same name, new data) must change the fingerprint, or resume would
    silently reuse stale checkpointed verdicts (ADVICE r2)."""
    # inputFiles() returns percent-encoded URIs (space -> %20); decode the
    # path component before stat, else those files silently fall back to the
    # path-only stamp and in-place rewrites go undetected again (ADVICE r3).
    if uri.startswith("file:"):
        parsed = urlparse(uri)
        path = unquote(parsed.path)
    elif _URI_SCHEME.match(uri):
        # recognized URI (scheme://...): decode the percent-encoding Spark
        # applied; os.stat will usually fail for remote schemes and fall
        # back to the path-only stamp below, which is correct for them
        path = unquote(urlparse(uri).path)
    else:
        # bare filesystem path: leave untouched — a literal '%2b' in a
        # directory name is part of the name, not an encoding (ADVICE r4)
        path = uri
    try:
        st = os.stat(path)
        return f"{uri}#{st.st_size}#{st.st_mtime_ns}"
    except OSError:  # pragma: no cover - remote/object-store URI: path only
        return uri


def contract_fingerprint(
    contract: Contract,
    s2: DataFrame,
    s1: DataFrame | None,
    commits_dim: DataFrame | None,
) -> str:
    """Identity of (contract spec, input files + their sizes/mtimes).
    Frozen-dataclass repr is deterministic; inputFiles() is scan metadata
    (no job). In-memory test DataFrames list no files — their fingerprint
    covers the contract only. A source that cannot enumerate files at all
    gets a unique token: such runs are NOT resumable (there is no way to
    prove the checkpointed data is the same data)."""
    parts = [repr(contract)]
    for df in (s2, s1, commits_dim):
        if df is None:
            parts.append("-")
        else:
            try:
                parts.append(
                    ",".join(sorted(_file_stamp(u) for u in df.inputFiles()))
                )
            except Exception:  # pragma: no cover - non-file sources
                parts.append(f"?nonresumable:{uuid.uuid4()}")
    return hashlib.sha256("||".join(parts).encode()).hexdigest()


class Manifest:
    """Per-partition checkpoint manifest, atomically swapped per entry.
    Thread-safe: families complete concurrently (run_contract pool).

    Layout: ``{"meta": {...}, "families": {name: {"verdicts": [...],
    "complete": bool}}}``. Verdict rows merge by (check_name, partition_id)
    so batch commits accumulate; ``complete`` marks the family fully done.
    Legacy (round-1) entries without the flag are treated as complete.
    """

    def __init__(self, run_dir: str) -> None:
        self.path = os.path.join(run_dir, "manifest.json")
        self._lock = threading.Lock()

    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {"meta": {}, "families": {}}
        with open(self.path) as f:
            data = json.load(f)
        data.setdefault("meta", {})
        return data

    def _swap(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, sort_keys=True)
        os.replace(tmp, self.path)

    def meta(self) -> dict:
        return self.load()["meta"]

    def set_meta(self, **kv) -> None:
        with self._lock:
            data = self.load()
            data["meta"].update(kv)
            self._swap(data)

    def record(
        self, family: str, verdict_rows: list[dict], complete: bool
    ) -> None:
        """Merge verdict rows into the family entry (keyed by
        (check_name, partition_id)) and set its complete flag."""
        with self._lock:
            data = self.load()
            entry = data["families"].setdefault(
                family, {"verdicts": [], "complete": False}
            )
            merged = {
                (r["check_name"], r["partition_id"]): r
                for r in entry.get("verdicts", [])
            }
            for r in verdict_rows:
                merged[(r["check_name"], r["partition_id"])] = r
            entry["verdicts"] = sorted(
                merged.values(), key=lambda r: (r["check_name"], r["partition_id"])
            )
            entry["complete"] = bool(complete)
            self._swap(data)

    def complete_family(self, family: str, verdict_rows: list[dict]) -> None:
        self.record(family, verdict_rows, complete=True)

    def state(self) -> dict[str, tuple[list[dict], bool]]:
        """family -> (verdict rows so far, complete?)."""
        out = {}
        for k, v in self.load()["families"].items():
            out[k] = (v.get("verdicts", []), bool(v.get("complete", True)))
        return out

    def completed(self) -> dict[str, list[dict]]:
        """Fully-completed families only (round-1 API, kept for callers)."""
        return {k: rows for k, (rows, done) in self.state().items() if done}


def _write_violations(
    violations: DataFrame, out: str, keys: tuple[str, ...] = ("partition_id",)
) -> None:
    """Partition-granular idempotent sink: dynamic overwrite replaces only
    the partition directories present in this write. Violations are
    repartitioned onto their sink partitioning first — one writer task per
    directory instead of every task writing every directory (at 10^12-file
    scale the latter is a small-files explosion AND a slow commit)."""
    (
        violations.repartition(*[F.col(k) for k in keys])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*keys)
        .parquet(out)
    )


def _batches(pids: frozenset[int], n: int) -> list[frozenset[int]]:
    ordered = sorted(pids)
    n = max(1, min(n, len(ordered)))
    size = (len(ordered) + n - 1) // n
    return [
        frozenset(ordered[i : i + size]) for i in range(0, len(ordered), size)
    ]


def _run_family(
    fam: CompiledFamily,
    run_dir: str,
    manifest: Manifest,
    pids: frozenset[int] | None = None,
    partition_batches: int = 1,
    all_pids: frozenset[int] | None = None,
) -> list[dict]:
    """Run one family (optionally restricted to ``pids``), committing the
    manifest per partition batch. Returns the verdict rows it computed."""
    if fam.splittable and partition_batches > 1:
        target = pids if pids is not None else (all_pids or frozenset())
        chunks: list[frozenset[int] | None] = list(
            _batches(target, partition_batches)
        ) or [None]
    else:
        chunks = [pids]

    out = os.path.join(run_dir, "violations", f"family={_safe(fam.name)}")
    all_rows: list[dict] = []
    for i, chunk in enumerate(chunks):
        verdicts, violations = fam.build(chunk)
        # NOT overlapped (unlike run mode, r5): family threads already run
        # concurrently, so doubling each thread's in-flight actions was
        # measured to oversubscribe the scheduler and SLOW batched mode
        # (quiet probe: 22.9-25.0s vs 17.4-20.7s sequential on the 600k
        # fixture at local[32]) — run mode wins from overlap because it has
        # exactly two actions total, not 2 x families x batches.
        if violations is not None:
            _write_violations(violations, out)
        rows = [r.asDict() for r in verdicts.collect()]  # tiny: P × checks
        manifest.record(fam.name, rows, complete=(i == len(chunks) - 1))
        all_rows.extend(rows)
    return all_rows


def _run_batched(
    work: list[tuple[CompiledFamily, frozenset[int] | None]],
    run_dir: str,
    manifest: Manifest,
    overlap: bool = True,
) -> list[dict]:
    """granularity='run': union every family's violations into ONE write and
    every family's verdicts into ONE collect (two actions total), then split
    the collected rows back out into per-family manifest entries. The union
    write is partitioned by (family, partition_id) with dynamic overwrite, so
    families absent from this run — e.g. already-checkpointed ones during a
    resume — keep their violation parquet intact."""
    verdict_parts, viol_parts = [], []
    for fam, pids in work:
        v, viol = fam.build(pids)
        verdict_parts.append(v)
        if viol is not None:
            viol_parts.append(viol.withColumn("family", F.lit(_safe(fam.name))))

    def _write() -> None:
        if not viol_parts:
            return
        allv = viol_parts[0]
        for p in viol_parts[1:]:
            allv = allv.unionByName(p)
        out = os.path.join(run_dir, "violations")
        _write_violations(allv, out, keys=("family", "partition_id"))

    def _collect() -> list[dict]:
        return [r.asDict() for r in union_verdicts(verdict_parts).collect()]

    # The two actions are independent DAGs over the same (cached) prepared
    # snapshot — submit them from concurrent driver threads, like family
    # mode already does per family, so each action's straggler tail and
    # inter-job driver gaps overlap with the other's work (the r4 event-log
    # decomposition charged ~7s of the 58s local[8] wall to packing slack).
    # Caveat measured in r5: with a COLD cache the two actions double-
    # compute the scan (cross-action cache fill is not cooperative the way
    # one action's AQE leaf stages are) — run_contract therefore
    # pre-materializes the cache before calling here (see the pre-count
    # above). Defaulted ON after the interleaved quiet 3-way A/B showed
    # pre-count+overlap fastest at both local[2] and local[8]
    # (BENCH/BASELINE.md r5); RAQC_RUN_OVERLAP=0 restores sequential.
    if overlap and os.environ.get("RAQC_RUN_OVERLAP", "1") == "1":
        with ThreadPoolExecutor(max_workers=2) as pool2:
            fut_w = pool2.submit(_write)
            fut_c = pool2.submit(_collect)
            rows = fut_c.result()
            fut_w.result()
    else:
        _write()
        rows = _collect()
    by_check: dict[str, list[dict]] = {}
    for r in rows:
        by_check.setdefault(r["check_name"], []).append(r)
    for fam, _pids in work:
        fam_rows = [r for c in fam.checks for r in by_check.get(c.name, [])]
        manifest.record(fam.name, fam_rows, complete=True)
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
    partition_batches: int = 1,
) -> RunResult:
    """Run the full contract; returns verdicts + writes violation sinks.

    ``cache=True`` persists the prepared snapshot across check families
    (right call in local/bench mode; on a 100 TB cluster rely on the
    shared-scan fusion instead and pass cache=False).

    ``granularity`` — checkpoint/action granularity:
      * ``"family"``: one violations write + one verdict collect per check
        family; resumable at family level, and at partition level when a
        family checkpointed partially (the default).
      * ``"run"``: the whole contract executes as TWO actions — one union
        violations write, one union verdict collect. ~5x fewer job barriers,
        the right mode for throughput runs; the manifest still records
        per-partition lineage afterwards, so a re-run resumes either way.

    ``partition_batches`` — with granularity='family', split each splittable
    family into this many partition_id batches, checkpointing the manifest
    after each: a crash loses at most one batch, and the resume recomputes
    only the partitions with no manifest entry.

    ``resume=False`` starts clean: prior manifest and violation sinks under
    ``run_dir`` are removed (a fresh run must not inherit stale partitions).
    """
    os.makedirs(run_dir, exist_ok=True)
    manifest = Manifest(run_dir)
    fingerprint = contract_fingerprint(contract, s2, s1, commits_dim)
    if resume:
        prior = manifest.meta().get("fingerprint")
        if prior is not None and prior != fingerprint:
            raise ValueError(
                f"run_dir {run_dir!r} was checkpointed with a different "
                "contract or inputs; refusing to resume (pass resume=False "
                "for a fresh run, or use a new run_dir)"
            )
    else:
        if os.path.exists(manifest.path):
            os.remove(manifest.path)
        shutil.rmtree(os.path.join(run_dir, "violations"), ignore_errors=True)
    manifest.set_meta(fingerprint=fingerprint)
    state = manifest.state() if resume else {}

    all_pids = frozenset(range(contract.partition_spec.num_partitions))
    s2p = prepare(s2, contract)
    persist_pool: list[DataFrame] = []  # tiny persisted intermediates
    s1p = None
    if s1 is not None:
        s1p = prepare(s1, contract)
        drift_cols = sorted(
            {
                c.column
                for c in contract.checks
                if c.kind in ("drift_psi", "drift_ks") and c.column
            }
        )
        if cache and drift_cols:
            # drift is the ONLY consumer of s1: cache the pruned projection
            # (partition_id + drift columns, ~30 B/row) so PSI and KS share
            # ONE scan of the previous snapshot instead of re-decompressing
            # its content column per check
            s1p = s1p.select("partition_id", *drift_cols).persist()
            persist_pool.append(s1p)
    if cache:
        if granularity == "family" and partition_batches > 1:
            # Local (no-shuffle) sort by partition_id before caching: the
            # in-memory columnar batches become runs of a single pid, so each
            # partition-batch build's `partition_id IN (...)` filter prunes
            # ~(1 - 1/batches) of the cache via batch min/max stats instead
            # of rescanning the whole table per chunk — the dominant cost of
            # batched family mode (VERDICT r3 task 5: 27.0s vs 15.5s run
            # mode on the same fixture).
            s2p = s2p.sortWithinPartitions("partition_id")
        s2p = s2p.persist()

    families = compile_plan(
        spark, contract, s2p, s1p, commits_dim, raw_schema=s2.schema,
        pool=persist_pool
    )
    all_rows: list[dict] = []
    ran, skipped = [], []
    resumed_parts: dict[str, list[int]] = {}
    work: list[tuple[CompiledFamily, frozenset[int] | None]] = []
    for fam in families:
        rows_done, complete = state.get(fam.name, ([], False))
        if complete:
            all_rows.extend(rows_done)
            skipped.append(fam.name)
        elif rows_done and fam.splittable:
            done_pids = {int(r["partition_id"]) for r in rows_done}
            remaining = frozenset(all_pids - done_pids)
            all_rows.extend(rows_done)
            if remaining:
                resumed_parts[fam.name] = sorted(remaining)
                work.append((fam, remaining))
            else:
                manifest.record(fam.name, [], complete=True)
                skipped.append(fam.name)
        else:
            # untouched, or partial-but-unsplittable: (re)run fully
            work.append((fam, None))
    try:
        precount_done = False
        if cache and work and (
            granularity != "run"
            or os.environ.get("RAQC_RUN_PRECOUNT", "1") == "1"
        ):
            # materialize the cache once before the concurrent-action
            # fan-out (family threads, or run mode's write∥collect pair).
            # History: r4 measured a pre-count at +13%/local[2] against the
            # then-SEQUENTIAL run mode (one action's AQE leaf stages fill
            # the cache cooperatively, so the pre-count only added a
            # barrier). With r5's overlapped actions the trade inverts:
            # cross-action fill is NOT cooperative — two cold actions
            # double-compute the scan (measured 229s vs 174s seq at
            # local[2]) — while pre-count + overlap beats sequential at
            # BOTH levels (local[2] 156.5s vs 173.8s; local[8] 50.7s vs
            # 55.4s; interleaved quiet A/B, BENCH/BASELINE.md r5).
            s2p.count()
            precount_done = True
        if granularity == "run" and work:
            # overlap only when the prepared snapshot is cached AND the
            # pre-count actually ran: either miss means the two concurrent
            # actions fill a cold cache non-cooperatively and double-
            # compute the scan (measured 229s vs 174s seq at local[2], r5).
            # Gating on precount_done (not just cache) closes the ADVICE
            # r5 env-combination hazard RAQC_RUN_PRECOUNT=0 +
            # RAQC_RUN_OVERLAP=1, which previously composed into exactly
            # that known-bad mode.
            all_rows.extend(
                _run_batched(
                    work, run_dir, manifest, overlap=cache and precount_done
                )
            )
            ran.extend(f.name for f, _ in work)
        else:
            # Families are independent DAGs -> submit them from concurrent
            # driver threads; Spark's scheduler interleaves their stages so
            # small stages don't serialize the whole contract (FAIR-ish use
            # of the cluster without touching scheduler pools).
            workers = int(os.environ.get("RAQC_FAMILY_WORKERS", "0")) or max(
                1, len(work)
            )
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futures = [
                    pool.submit(
                        _run_family, fam, run_dir, manifest, pids,
                        partition_batches, all_pids,
                    )
                    for fam, pids in work
                ]
                for (fam, _), fut in zip(work, futures, strict=True):
                    all_rows.extend(fut.result())
                    ran.append(fam.name)
    finally:
        if cache:
            s2p.unpersist()
        for t in persist_pool:
            t.unpersist()

    verdicts = spark.createDataFrame(
        [tuple(r[f.name] for f in VERDICT_SCHEMA.fields) for r in all_rows],
        schema=VERDICT_SCHEMA,
    )
    return RunResult(verdicts, run_dir, ran, skipped, resumed_parts)

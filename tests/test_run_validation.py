"""End-to-end CLI test: run_validation.main() over the snapshot-table
adapter, including the --contract YAML path (SURVEY.md §3.2 entry point 3)."""

from __future__ import annotations

import json
import os

from raqc_spark.contract import default_contract
from raqc_spark.sources.table_adapter import ParquetSnapshotAdapter

import run_validation


def _snapshot_table(spark, snapshots, tmp_path):
    s1, s2, commits = snapshots
    root = str(tmp_path / "code_table")
    adapter = ParquetSnapshotAdapter(root)
    adapter.write_snapshot(s1, "s1")
    adapter.write_snapshot(s2, "s2")
    commits_path = str(tmp_path / "commits.parquet")
    commits.write.mode("overwrite").parquet(commits_path)
    return root, commits_path


def test_cli_end_to_end_with_yaml_contract(spark, snapshots, tmp_path, capsys):
    root, commits_path = _snapshot_table(spark, snapshots, tmp_path)
    cpath = str(tmp_path / "contract.yaml")
    with open(cpath, "w") as f:
        f.write(default_contract().to_yaml())

    rc = run_validation.main([
        "--table", root,
        "--snapshot1", "s1",
        "--snapshot2", "s2",
        "--commits", commits_path,
        "--run-dir", str(tmp_path / "run"),
        "--contract", cpath,
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # fixture injects violations -> exit code 1, every family executed
    assert rc == 1
    assert out["n_failing"] > 0
    assert out["n_verdicts"] > 0
    assert not out["families_skipped"]
    assert os.path.isdir(os.path.join(str(tmp_path / "run"), "violations"))

    # resume over the same run_dir: everything skipped, same verdict count
    rc2 = run_validation.main([
        "--table", root,
        "--snapshot1", "s1",
        "--snapshot2", "s2",
        "--commits", commits_path,
        "--run-dir", str(tmp_path / "run"),
        "--contract", cpath,
    ])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 1
    assert not out2["families_run"]
    assert out2["n_verdicts"] == out["n_verdicts"]


def test_cli_violations_parquet_matches_golden(
    spark, snapshots, code_fixture, tmp_path
):
    """The one lifecycle seam (CLI -> adapter -> contract -> sinks) as a
    single golden (VERDICT r2 task 10): the violation parquet a CLI run
    leaves behind carries exactly the fixture's injected uniqueness
    violations, readable with partition discovery over the
    family=/partition_id= sink layout."""
    fx, _ = code_fixture
    root, commits_path = _snapshot_table(spark, snapshots, tmp_path)
    rd = str(tmp_path / "run_g")
    rc = run_validation.main([
        "--table", root,
        "--snapshot1", "s1",
        "--snapshot2", "s2",
        "--commits", commits_path,
        "--run-dir", rd,
    ])
    assert rc == 1
    viol = spark.read.parquet(os.path.join(rd, "violations"))
    got = {
        tuple(r)
        for r in viol.filter("check_name = 'uniqueness'")
        .select("repo", "path", "commit", "content_sha")
        .collect()
    }
    assert got == fx.golden["uniqueness"]
    ref = {
        tuple(r)
        for r in viol.filter("check_name = 'ref_integrity'")
        .select("repo", "path", "commit", "content_sha")
        .collect()
    }
    assert ref == fx.golden["ref_integrity"]

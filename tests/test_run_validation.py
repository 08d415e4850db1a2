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

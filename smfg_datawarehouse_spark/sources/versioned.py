"""Snapshot-versioned parquet tables — durable MERGE target + time travel.

The reference's declared DW-load stage upserts on key columns
(``DW_Output_Column_Config.IsKey``, ``1. Metadata Creation.sql:133``); on a
real lake that is Delta ``MERGE INTO``. This container has no Delta, and
plain parquet directories can't be updated in place safely — so the engine
provides the minimal transactional core those systems share:

- every write lands a COMPLETE new snapshot under ``path/v=N/``;
- a snapshot is visible only once its ``_SUCCESS`` marker exists (Spark
  writes it last), so readers never observe partial data — crash mid-write
  leaves a dead directory that the next write supersedes;
- readers resolve the latest committed version at call time (or pin an
  older one — time travel);
- ``merge`` = read current + ``merge_upsert`` + write next version: the
  reference's key-based upsert with atomic visibility and rollback for
  free.

Version listing is a driver-side directory scan — O(versions), metadata
only, never data. At warehouse scale this is exactly what table formats
do (Delta/Iceberg keep the version log in metadata files); the snapshot
data itself stays fully distributed.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^v=(\d+)$")


class VersionedTable:
    """A parquet table with atomic snapshot versions under ``path/v=N/``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- version bookkeeping (driver-side, metadata only) -------------------

    def versions(self) -> list[int]:
        """Committed versions (ascending): ``v=N`` dirs holding _SUCCESS."""
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            m = _V_RE.match(name)
            if m and os.path.exists(os.path.join(self.path, name, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    # -- read / write -------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or a pinned older one (time travel)."""
        v = self.current_version() if version is None else version
        if v is None or v not in self.versions():
            raise FileNotFoundError(
                f"no committed version {version!r} at {self.path}"
            )
        return self.spark.read.parquet(self._version_dir(v))

    def write(self, df: DataFrame) -> int:
        """Land ``df`` as the next snapshot; returns the new version.

        Visibility is atomic: the snapshot joins ``versions()`` only when
        Spark finishes the directory and drops ``_SUCCESS``.
        """
        cur = self.current_version()
        nxt = 0 if cur is None else cur + 1
        df.write.mode("errorifexists").parquet(self._version_dir(nxt))
        return nxt

    def merge(self, updates: DataFrame, keys: list[str]) -> int:
        """Key-based MERGE (J3): updates win on key match, unmatched target
        rows survive, new keys insert — as a new atomic snapshot."""
        from smfg_datawarehouse_spark.transform import merge_upsert

        cur = self.current_version()
        if cur is None:
            return self.write(updates)
        merged = merge_upsert(self.read(cur), updates, keys)
        return self.write(merged)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` committed snapshots (and
        any uncommitted debris); returns removed versions."""
        keep = set(self.versions()[-keep_last:]) if keep_last > 0 else set()
        removed = []
        if not os.path.isdir(self.path):
            return removed
        for name in os.listdir(self.path):
            m = _V_RE.match(name)
            if m and int(m.group(1)) not in keep:
                shutil.rmtree(os.path.join(self.path, name))
                removed.append(int(m.group(1)))
        return sorted(removed)

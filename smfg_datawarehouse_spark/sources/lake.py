"""Three-zone parquet lake (RAW → STAGING → CURATED) + compaction.

Mirrors the reference's zone layout (``config/config.yaml:64-69``:
RAW_ZONE/STAGING_ZONE/CURATED_ZONE/LOGS_PATH) with per-table directories.

The reference writes pandas chunks as ``{table}_part_{n}.parquet`` then
consolidates to ONE file (``staging_data_extraction.py:30-80``). Spark
writes part-files natively; consolidation here is *sizing*, not gluing:
:func:`compact` rewrites a directory to ``max(1, bytes/target)`` files —
at 100 TB you want ~128-512 MB files, not one giant file, so single-file
output is a parameter, not a hard-coded behavior.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class LakeZones:
    base_dir: str

    @property
    def raw(self) -> str:
        return os.path.join(self.base_dir, "raw")

    @property
    def staging(self) -> str:
        return os.path.join(self.base_dir, "staging")

    @property
    def curated(self) -> str:
        return os.path.join(self.base_dir, "curated")

    @property
    def logs(self) -> str:
        return os.path.join(self.base_dir, "logs")

    def staging_table_dir(self, schema_name: str, table_name: str) -> str:
        return os.path.join(self.staging, schema_name, table_name)

    def curated_table_dir(self, schema_name: str, table_name: str) -> str:
        return os.path.join(self.curated, schema_name, table_name)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    min_files: int = 1,
) -> str:
    """Rewrite a parquet dir into size-targeted files (snappy, Spark default).

    Equivalent of the reference's consolidate-to-one-file step but
    scale-aware; pass ``target_file_bytes`` large to force a single file at
    test scale.
    """
    n_files = max(min_files, _dir_bytes(path) // target_file_bytes or min_files)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (local fs; object stores would use a manifest commit)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def write_staging(
    df: DataFrame,
    zones: LakeZones,
    schema_name: str,
    table_name: str,
    mode: str = "overwrite",
    drop_all_na: bool = True,
) -> str:
    """Staging-zone write. ``drop_all_na`` replicates the reference's
    consolidation-time row-quality filter (all-NA rows skipped,
    ``staging_data_extraction.py:53-56``) as ``na.drop("all")``."""
    path = zones.staging_table_dir(schema_name, table_name)
    out = df.na.drop("all") if drop_all_na else df
    out.write.mode(mode).parquet(path)
    return path


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> str:
    """Hive-style partitioned layout (``path/col=value/``) — the lake-side
    enabler of partition pruning: a query filtering on ``partition_cols``
    scans only matching directories (shows as ``PartitionFilters`` in the
    plan), which at 100 TB is the difference between reading one day and
    reading three years. Choose low-cardinality, always-filtered columns
    (load date, region); never high-cardinality keys (small-file explosion).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Bucketed managed table: pre-shuffles data into ``num_buckets`` files
    by hash of ``bucket_cols`` at WRITE time, so every later join/agg on
    those keys skips its exchange entirely (plan shows a sort-merge join
    with NO shuffle on the bucketed sides). The classic amortization for
    fact tables joined repeatedly on the same key at scale; pair with
    ``spark.sql.sources.bucketing.enabled`` (on by default).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
    return table_name

"""T1 — watermark-managed incremental loads (SURVEY §2.9).

The reference declares incremental extraction as a free-form
``IncrementalFilter`` predicate chosen by hand per table
(``1. Metadata Creation.sql:65,67``, applied at
``Staging_Extraction_Metadata_Query.sql:49-51``). This module supplies the
piece the reference leaves manual: *watermark bookkeeping*. Each
incremental table tracks the max value of a monotonically-advancing column
(event time, CDC sequence); the next run extracts strictly-greater rows
and advances the stored watermark.

State lives in an append-only parquet ledger (latest-wins on sequence
number), the same event-sourced pattern as the audit ledger — no
read-modify-write on the lake, safe to re-run (an aborted run never
advances the watermark because the new value is written only after the
extraction succeeds).

At scale the watermark predicate is pushed into the source scan (JDBC
remote WHERE / parquet row-group skipping / Delta data skipping), so an
incremental run touches only new data — the property that matters at
100 TB where a full rescan is not an option.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from smfg_datawarehouse_spark.session import local_rows_df

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("TableName", T.StringType(), False),
        T.StructField("WatermarkValue", T.StringType(), True),
        T.StructField("Seq", T.LongType(), False),
    ]
)


class WatermarkStore:
    """Append-only watermark ledger; latest Seq per table wins."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.path = os.path.join(state_dir, "watermarks.parquet")
        self._seq = 0

    def _read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def get(self, table: str) -> str | None:
        df = self._read()
        if df is None:
            return None
        rows = (
            df.where(F.col("TableName") == table)
            .orderBy(F.col("Seq").desc())
            .limit(1)
            .collect()
        )
        return rows[0]["WatermarkValue"] if rows else None

    def advance(self, table: str, value: Any) -> None:
        """Record a new watermark (stringified; lexicographic-safe for ISO
        timestamps/dates and zero-padded sequences)."""
        self._seq += 1
        row = [(table, str(value), self._seq)]
        local_rows_df(self.spark, row, _STATE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)


def incremental_slice(
    df: DataFrame, ts_col: str, last_watermark: str | None
) -> DataFrame:
    """Rows strictly past the stored watermark (everything on first run).

    The comparison is on the raw column so Catalyst pushes it to the
    source (JDBC WHERE / parquet min-max skipping).
    """
    if last_watermark is None:
        return df
    return df.where(F.col(ts_col) > F.lit(last_watermark).cast(df.schema[ts_col].dataType))


def run_incremental_extract(
    df: DataFrame,
    ts_col: str,
    store: WatermarkStore,
    table: str,
) -> tuple[DataFrame, str | None]:
    """One incremental run: slice past the watermark, compute the new
    high-water mark from the slice, advance the store. Returns
    (slice, new_watermark). The slice DataFrame stays lazy; the single
    ``max`` aggregation is the only extra action."""
    last = store.get(table)
    sliced = incremental_slice(df, ts_col, last)
    new_wm = sliced.agg(F.max(ts_col).alias("wm")).first()["wm"]
    if new_wm is not None:
        # ISO format keeps string comparison == timestamp comparison
        store.advance(table, new_wm.isoformat(sep=" ") if hasattr(new_wm, "isoformat") else new_wm)
        return sliced, str(new_wm)
    return sliced, last

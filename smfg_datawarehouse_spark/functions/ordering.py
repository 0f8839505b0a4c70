"""Distributed global ordering — ordinals without a one-partition sort.

A naive ``ROW_NUMBER() OVER (ORDER BY v)`` moves the whole table through a
single partition. The scalable equivalent is two-phase: rows get a BAND
whose value is monotone in the sort key (e.g. ``v DIV width``), per-band
counts roll up to cumulative OFFSETS (a band-cardinality-sized window),
and each row's global ordinal is ``offset(band) + row_number() WITHIN its
band`` — every heavy window stays partitioned by band; the only
single-partition work is the tiny offset cumsum. Used by
x103_quantile_normalization and q100_equi_depth_histogram; the DuckDB
oracles compute the same ordinals with a plain global ROW_NUMBER — two
routes, one result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def global_ordinals(
    df: DataFrame,
    order_cols: list[str],
    band: Column,
    out_col: str = "rn0",
) -> DataFrame:
    """Add ``out_col`` = 0-based global ordinal under ``ORDER BY
    order_cols`` (the last column must make the order total/unique).

    ``band`` MUST be monotone non-decreasing in the sort order (e.g.
    ``F.expr("v DIV 100")`` when ordering by ``v``) — ordinals are
    band-offset + within-band rank, so a non-monotone band silently
    breaks the global order.
    """
    banded = df.withColumn("_go_band", band)
    offsets = (
        banded.groupBy("_go_band")
        .agg(F.count(F.lit(1)).alias("_go_bc"))
        .withColumn(
            "_go_off",
            F.sum("_go_bc").over(
                W.orderBy("_go_band").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
        .select("_go_band", F.coalesce("_go_off", F.lit(0)).alias("_go_off"))
    )
    wb = W.partitionBy("_go_band").orderBy(*order_cols)
    return (
        banded.join(F.broadcast(offsets), "_go_band")
        .withColumn(out_col, F.col("_go_off") + F.row_number().over(wb) - 1)
        .drop("_go_band", "_go_off")
    )

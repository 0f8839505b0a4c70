"""T1 watermark lifecycle: two incremental runs never overlap, never miss."""

from __future__ import annotations

from pyspark.sql import functions as F

from smfg_datawarehouse_spark.incremental import (
    WatermarkStore,
    run_incremental_extract,
)
from smfg_datawarehouse_spark.queries import load_events

SF_DIR = "/root/testdata/sf0.001"


def test_two_run_incremental_no_overlap_no_loss(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path))
    events = load_events(spark, SF_DIR)
    cutoff = F.lit("2024-01-10 00:00:00").cast("timestamp")

    # run 1: only the "arrived so far" prefix exists at the source
    first_batch = events.where(F.col("ts") < cutoff)
    s1, wm1 = run_incremental_extract(first_batch, "ts", store, "events")
    n1 = s1.count()
    assert n1 == first_batch.count()  # first run takes everything
    assert store.get("events") == wm1

    # run 2: the full table is visible; only post-watermark rows extract
    s2, wm2 = run_incremental_extract(events, "ts", store, "events")
    n2 = s2.count()
    assert n1 + n2 == events.count()  # no loss
    assert s2.where(F.col("ts") <= F.lit(wm1).cast("timestamp")).count() == 0  # no overlap
    assert wm2 > wm1

    # run 3: nothing new → empty slice, watermark unchanged
    s3, wm3 = run_incremental_extract(events, "ts", store, "events")
    assert s3.count() == 0
    assert wm3 == store.get("events")

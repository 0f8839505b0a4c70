"""Additional Structured-Streaming certifications [T2] (round 5+).

Streaming queries whose batch twins live elsewhere: each stages the
events fixture as a multi-file raw-zone backlog, drains it with
AvailableNow across SEVERAL micro-batches, and hash-checks the drained
result against a plain batch SQL oracle — the stream ≡ batch discipline
of s01-s17 (``operators/events_analytics.py``), kept in a separate
module per the round-5 module-size split.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.operators.events_analytics import _drain_stream
from smfg_datawarehouse_spark.operators.text_sketches import _cms_buckets
from smfg_datawarehouse_spark.queries import _scratch_dir, load_events, register

_S18_D = 4  # CMS hash rows
_S18_W = 64  # CMS buckets per row

_S18_ORACLE = f"""
    WITH items AS (SELECT event_type AS tok FROM events),
    ds AS (SELECT unnest(range({_S18_D})) AS d),
    buck AS (
      SELECT tok, d,
             ('0x' || substring(md5('cms' || d || ':' || tok), 1, 8))::BIGINT
               % {_S18_W} AS bucket
      FROM items CROSS JOIN ds
    ),
    counters AS (SELECT d, bucket, count(*) AS cnt FROM buck GROUP BY 1, 2),
    exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
              FROM items GROUP BY tok),
    est AS (
      SELECT e.tok, e.exact_cnt, CAST(min(c.cnt) AS BIGINT) AS est_cnt
      FROM exact e CROSS JOIN ds
      JOIN counters c
        ON c.d = ds.d
       AND c.bucket = ('0x' || substring(md5('cms' || ds.d || ':' || e.tok), 1, 8))::BIGINT
                      % {_S18_W}
      GROUP BY 1, 2
    )
    SELECT tok, exact_cnt, est_cnt, est_cnt - exact_cnt AS overcount FROM est
"""


@register("s18_streaming_heavy_hitters", _S18_ORACLE)
def s18_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[T2/X] STREAMING COUNT-MIN SKETCH certified: the events fixture is
    split into a three-file backlog drained one file per micro-batch, so
    the CMS counter grid (x49's portable md5 family, d×w = 4×64 longs)
    accumulates ADDITIVELY across micro-batches in complete-mode state —
    the mergeability property that makes CMS the streaming frequency
    sketch (a counter merge that dropped or double-counted a partial
    hash-fails against the batch oracle, exactly the class s09 certifies
    for windowed counts). The drained grid is then evaluated exactly like
    x49: per event type, the min-over-rows estimate beside the exact
    count, with ``overcount`` ≥ 0 structural.

    Scale shape: streaming state is the FIXED d×w grid regardless of key
    cardinality or stream length — the whole point of sketch state over
    exact per-key state when keys are unbounded at 100 TB rates."""
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    src = _scratch_dir(spark, "s18")
    raw = _os.path.join(src, "raw")
    load_events(spark, sf_dir).repartition(3).write.mode("overwrite").parquet(raw)

    stream = events_stream(spark, raw, max_files_per_trigger=1)
    counters_stream = (
        stream.select(
            F.posexplode(
                _cms_buckets(F.col("event_type"), _S18_D, _S18_W)
            ).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counters = _drain_stream(spark, counters_stream, "s18", "complete")

    exact = (
        load_events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("tok"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    est = (
        exact.select(
            "tok",
            "exact_cnt",
            F.posexplode(_cms_buckets(F.col("tok"), _S18_D, _S18_W)).alias(
                "d", "bucket"
            ),
        )
        .join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )

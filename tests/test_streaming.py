"""Structured Streaming: the same window builders must produce identical
results over readStream (AvailableNow trigger, memory sink) and over the
batch DataFrame — Spark's unified-semantics guarantee, asserted here."""

from __future__ import annotations

from smfg_datawarehouse_spark.streaming.windows import (
    events_stream,
    run_stream_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"


def _rowset(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


import shutil

import pytest


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # streaming file source requires a directory, not a single file
    d = tmp_path_factory.mktemp("events_stream_src")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_stream_equals_batch(spark, events_dir):
    from smfg_datawarehouse_spark.queries import load_events

    batch = load_events(spark, SF_DIR)
    expected = _rowset(tumbling_agg(batch, "1 hour"))

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    result = run_stream_to_memory(spark, tumbling_agg(stream, "1 hour"), "tumbling_test")
    assert _rowset(result) == expected


def test_sliding_stream_equals_batch(spark, events_dir):
    """Overlapping windows: each event must land in width/slide windows in
    the stream exactly as in batch (watermark only bounds state, never
    drops rows in a one-pass AvailableNow replay)."""
    from smfg_datawarehouse_spark.queries import load_events

    batch = load_events(spark, SF_DIR)
    expected = _rowset(sliding_agg(batch, "1 hour", "30 minutes"))

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    result = run_stream_to_memory(
        spark, sliding_agg(stream, "1 hour", "30 minutes"), "sliding_test"
    )
    assert _rowset(result) == expected


def test_session_stream_equals_batch(spark, events_dir):
    from smfg_datawarehouse_spark.queries import load_events

    batch = load_events(spark, SF_DIR)
    expected = _rowset(session_agg(batch, "5 minutes"))

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    result = run_stream_to_memory(spark, session_agg(stream, "5 minutes"), "session_test")
    assert _rowset(result) == expected


def test_stateful_running_totals_equals_batch(spark, events_dir):
    """applyInPandasWithState accumulator over one AvailableNow pass must
    equal the batch per-user aggregate (same integer micro-unit fold)."""
    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.stateful import running_user_totals
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    batch = load_events(spark, SF_DIR)
    expected = _rowset(
        batch.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("long"))
            .cast("long")
            .alias("total_micros"),
        )
    )

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    out = running_user_totals(stream.drop("props"))
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rowset(spark.table("stateful_totals")) == expected


def test_stream_dedup(spark, events_dir):
    from smfg_datawarehouse_spark.streaming.stateful import dedup_stream
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("dedup_stream_t").count()
    from smfg_datawarehouse_spark.queries import load_events

    assert n == load_events(spark, SF_DIR).dropDuplicates(["event_id"]).count()


def test_streaming_etl_foreachbatch_lake_audit(spark, events_dir, tmp_path):
    """REALTIME cadence end-to-end: stream → foreachBatch → staging zone +
    audit ledger — the reference's extract-stage semantics (rowcount +
    SUCCESS row per micro-batch) running on Structured Streaming."""
    from smfg_datawarehouse_spark.audit import AuditLedger
    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.sources.lake import LakeZones, write_staging
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    zones = LakeZones(str(tmp_path / "lake"))
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    pid = audit.create_process_master(process_type="HOURLY")

    def sink(batch_df, batch_id):
        n = batch_df.count()
        sid = audit.log_stage_detail(
            pid, "STAGING_EXTRACT", table_name="stream.events", row_count=None
        )
        path = write_staging(batch_df, zones, "stream", "events", mode="append")
        audit.update_stage_detail(sid, status="SUCCESS", row_count=n, output_path=path)

    q = (
        events_stream(spark, events_dir, watermark="10 minutes")
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    landed = spark.read.parquet(zones.staging_table_dir("stream", "events"))
    src_n = load_events(spark, SF_DIR).count()
    assert landed.count() == src_n
    detail = audit.stage_detail()
    ok = detail.where("Status = 'SUCCESS' AND TableName = 'stream.events'")
    assert ok.count() >= 1
    assert (
        ok.groupBy().sum("RowCount").first()[0] == src_n
    )  # audit rowcounts reconcile with landed data


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Interval-bounded stream-stream join (watermark-bounded state both
    sides) must equal the same builder over the batch table."""
    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.joins import view_purchase_conversions
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    batch = load_events(spark, SF_DIR)
    expected = _rowset(view_purchase_conversions(batch))

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    out = view_purchase_conversions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _rowset(spark.table("ss_join")) == expected


def test_stream_static_enrichment_equals_batch(spark, events_dir):
    """Stream-static broadcast join (dimension enrichment): the static side
    joins each micro-batch with no stream shuffle and no join state; result
    must equal the same builder over the batch table, including events
    whose user has no dimension row (left, null-extended)."""
    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.joins import enrich_with_dimension
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    batch = load_events(spark, SF_DIR)
    # static dimension derived from half the users, so the left join's
    # null-extension path is exercised
    dim = (
        batch.select("user_id")
        .distinct()
        .where(F.col("user_id") % 2 == 0)
        .withColumn("segment", (F.col("user_id") % 10).cast("string"))
    )
    expected = _rowset(enrich_with_dimension(batch, dim))

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    result = run_stream_to_memory(
        spark, enrich_with_dimension(stream, dim), "enrich_test", output_mode="append"
    )
    assert _rowset(result) == expected


def test_streaming_upsert_foreachbatch_latest_wins(spark, tmp_path):
    """Streaming upsert into a curated table: each micro-batch merges into
    the keyed target (latest event per user wins by (ts, event_id)); after
    three micro-batches the table equals the batch latest-wins dedup over
    the full source — the foreachBatch MERGE pattern for the reference's
    declared DW-load stage running at REALTIME cadence."""
    import os

    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.operators.dedup import latest_wins_dedup
    from smfg_datawarehouse_spark.queries import load_events

    src = load_events(spark, SF_DIR)
    src_dir = str(tmp_path / "src")
    src.repartition(3).write.parquet(src_dir)

    def latest(df):
        return (
            latest_wins_dedup(
                df.withColumn("_ord", F.struct("ts", "event_id")), ["user_id"], "_ord"
            ).drop("_ord")
        )

    expected = _rowset(latest(src))

    target_dir = str(tmp_path / "curated")

    def sink(batch_df, _bid):
        merged = batch_df
        if os.path.exists(target_dir):
            merged = merged.unionByName(spark.read.parquet(target_dir))
        # materialize before overwriting the path the union just read from
        out = latest(merged).localCheckpoint()
        out.write.mode("overwrite").parquet(target_dir)

    q = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    assert _rowset(spark.read.parquet(target_dir)) == expected


def test_metadata_realtime_dispatch_end_to_end(spark, tmp_path):
    """RefreshFrequency='REALTIME' in table_config must drive a
    readStream→foreachBatch staging load through the runner + audit ledger
    (reference declares the ENUM at ``1. Metadata Creation.sql:66``; the
    DAG's realtime branch is stubbed at ``SMFG_DW_ETL_DAG.py:322-359``).

    Asserts: (1) only REALTIME-flagged active tables are dispatched;
    (2) the streamed staging output equals the batch-compiled plan's
    output; (3) the ledger reconciles (master SUCCESS, per-micro-batch
    rows summing to landed count); (4) a second run after new raw files
    arrive processes ONLY the new files (checkpointed offsets)."""
    import os

    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.audit import AuditLedger
    from smfg_datawarehouse_spark.catalog import seed_fixture_catalog
    from smfg_datawarehouse_spark.compiler import compile_extraction_plans
    from smfg_datawarehouse_spark.runner import realtime_plans, run_realtime_staging
    from smfg_datawarehouse_spark.sources.lake import LakeZones

    zones = LakeZones(str(tmp_path / "lake"))
    for name in ["lineitem", "orders"]:
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(zones.raw, "tpch", name))

    cat = seed_fixture_catalog(spark)
    # flip orders to REALTIME in metadata — the dispatch driver
    cat.table_config = cat.table_config.withColumn(
        "RefreshFrequency",
        F.when(F.col("TableName") == "orders", F.lit("REALTIME")).otherwise(
            F.col("RefreshFrequency")
        ),
    )
    assert [p.full_table_name for p in realtime_plans(cat)] == ["tpch.orders"]

    audit = AuditLedger(spark, str(tmp_path / "audit"))
    pid, results = run_realtime_staging(spark, cat, zones, audit)
    assert {r.table: r.status for r in results} == {"tpch.orders": "SUCCESS"}
    # lineitem (EOD) must NOT have been staged by the realtime runner
    assert not os.path.exists(zones.staging_table_dir("tpch", "lineitem"))

    # streamed output == the same compiled plan applied in batch
    plan = {p.full_table_name: p for p in compile_extraction_plans(cat)}[
        "tpch.orders"
    ]
    batch_out = plan.apply(spark.read.parquet(os.path.join(zones.raw, "tpch", "orders")))
    landed = spark.read.parquet(zones.staging_table_dir("tpch", "orders"))
    assert sorted(landed.columns) == sorted(batch_out.columns)
    assert _rowset(landed) == _rowset(batch_out)

    master = audit.process_master().where(F.col("ProcessID") == pid).collect()[0]
    assert master["Status"] == "SUCCESS" and master["ProcessType"] == "REALTIME"
    micro = audit.stage_detail().where(
        (F.col("ProcessID") == pid) & (F.col("StageName") == "REALTIME_MICROBATCH")
    )
    assert micro.groupBy().sum("RowCount").first()[0] == landed.count()

    # incremental second run: one new raw file → only its rows appended
    extra = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(7)
    extra.coalesce(1).write.mode("append").parquet(
        os.path.join(zones.raw, "tpch", "orders")
    )
    pid2, results2 = run_realtime_staging(spark, cat, zones, audit)
    assert results2[0].row_count == 7
    assert (
        spark.read.parquet(zones.staging_table_dir("tpch", "orders")).count()
        == landed.count() + 7
    )


def test_stream_stream_outer_join_equals_batch(spark, events_dir):
    """LEFT OUTER stream-stream join: unmatched views must emit
    null-extended once the watermark closes their interval — over an
    AvailableNow replay the full result must equal the batch left join,
    including every unconverted view."""
    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.joins import (
        view_purchase_conversions_outer,
    )
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    batch = load_events(spark, SF_DIR)
    expected = _rowset(view_purchase_conversions_outer(batch))
    n_unmatched = (
        view_purchase_conversions_outer(batch)
        .where(F.col("purchase_id").isNull())
        .count()
    )
    assert n_unmatched > 0  # the outer semantics are actually exercised

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    out = view_purchase_conversions_outer(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_outer_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _rowset(spark.table("ss_outer_join")) == expected


def test_certified_streaming_queries_repeat_in_one_session(spark):
    """s01/s02/s03 use FIXED per-tag memory-sink names (dropping the
    prior run's temp view): repeated invocations in one long-lived app —
    the driver/bench pattern — must return identical results, not
    accumulate or collide."""
    from smfg_datawarehouse_spark import queries as qmod

    q = qmod.all_queries()
    names = [
        "s01_streaming_tumbling_window",
        "s02_streaming_stateful_totals",
        "s03_streaming_interval_join",
        "s04_streaming_dedup",
        "s05_streaming_session_window",
        "s06_streaming_sliding_window",
        "s07_streaming_dim_enrichment",
    ]
    first = {n: q[n](spark, SF_DIR).count() for n in names}
    second = {n: q[n](spark, SF_DIR).count() for n in names}
    assert first == second
    assert all(v > 0 for v in first.values())


def test_stream_dedup_across_micro_batches(spark, tmp_path):
    """Exactly-once from an at-least-once source: the SAME feed staged as
    two files, drained as TWO micro-batches (maxFilesPerTrigger=1) — the
    dedup state must suppress every row of the replayed second batch, and
    the progress log must prove the replay really arrived in a later
    batch rather than being deduped intra-batch."""
    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.windows import events_stream

    src = tmp_path / "dup_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-1.parquet")
    stream = events_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        stream.dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName("xbatch_dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "replay collapsed into a single micro-batch"
    expected = load_events(spark, SF_DIR).count()
    assert spark.table("xbatch_dedup_t").count() == expected


def test_s04_certified_query_repeats(spark):
    from smfg_datawarehouse_spark import queries as qmod

    q = qmod.all_queries()["s04_streaming_dedup"]
    first = q(spark, SF_DIR).count()
    second = q(spark, SF_DIR).count()
    assert first == second > 0


def test_s08_outer_join_flushes_final_window(spark):
    """Regression: Catalyst pushes the event_type filter below the
    EventTimeWatermark operator, so without per-side heartbeats the
    watermark ceiling (max ts − delay) permanently withholds unmatched
    views from the stream's final interval+delay window. sf0.01 is the
    smallest fixture with such views — the certified s08 drain must
    emit them null-extended, and must not leak heartbeat rows."""
    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.operators.streaming_certs import (
        s08_streaming_outer_join,
    )
    from smfg_datawarehouse_spark.queries import load_events

    sf = "/root/testdata/sf0.01"
    out = s08_streaming_outer_join(spark, sf)
    max_ts = load_events(spark, sf).agg(F.max("ts")).collect()[0][0]
    late_unmatched = out.where(
        F.col("purchase_id").isNull()
        & (F.col("view_ts") > F.lit(max_ts) - F.expr("INTERVAL 40 MINUTES"))
    ).count()
    assert late_unmatched > 0
    assert out.where(F.col("user_id") < 0).count() == 0  # no heartbeat leakage


def test_state_store_partition_pin_and_rocksdb(spark, events_dir):
    """The 100×-state posture, declared and testable:

    1. the drain's state-store partition count is pinned — Structured
       Streaming freezes spark.sql.shuffle.partitions into the query's
       state layout at first start, so DRAIN_STATE_PARTITIONS is a real
       contract (certification results are partition-invariant, asserted
       by every stream==batch test here, but the COUNT must be the
       documented one so checkpoint-resume sizing reasoning holds);
    2. results are state-store-provider-invariant: the same windowed agg
       under the RocksDB provider (session.ROCKSDB_STATE_CONF — disk-
       backed state, the provider a production state volume needs)
       equals both the default-provider stream result and batch.
    """
    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.session import ROCKSDB_STATE_CONF
    from smfg_datawarehouse_spark.streaming.windows import DRAIN_STATE_PARTITIONS

    batch = load_events(spark, SF_DIR)
    expected = _rowset(tumbling_agg(batch, "1 hour"))

    # 1. partition pin: the drain helper scopes shuffle partitions to the
    # documented constant while the query runs
    assert DRAIN_STATE_PARTITIONS == 4  # r9: sized down to the drains' state volume
    stream = events_stream(spark, events_dir, watermark="10 minutes")
    seen: dict[str, str] = {}
    orig = spark.conf.get("spark.sql.shuffle.partitions")

    q = tumbling_agg(stream, "1 hour")
    result = run_stream_to_memory(spark, q, "pin_default_store")
    assert _rowset(result) == expected
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig  # restored

    # 2. provider swap: RocksDB state store, same drain, same result
    prev = {}
    for k, v in ROCKSDB_STATE_CONF.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        stream2 = events_stream(spark, events_dir, watermark="10 minutes")
        result2 = run_stream_to_memory(
            spark, tumbling_agg(stream2, "1 hour"), "pin_rocksdb_store"
        )
        assert _rowset(result2) == expected
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_watermark_drop_only_after_eviction(spark, tmp_path):
    """Miniature pin of the empirically-established late-data semantics
    s11_streaming_late_data_drop relies on (Spark would be free to
    tighten this; the certification oracle depends on it):

    - a below-watermark row whose window is STILL IN STATE merges (batch
      1: 10:30 joins the [10,11) window even though wm=12:30 > 11:00);
    - once the window has been EVICTED-AND-EMITTED (end ≤ batch-start
      watermark, append mode), a later row for it is dropped and counted
      in numRowsDroppedByWatermark (batch 2: 10:45);
    - windows whose end exceeds the final watermark are never output
      ([13,14) stays in state, discarded at stop).
    """
    import datetime
    import os
    import time

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    raw = tmp_path / "raw"
    raw.mkdir()
    D = datetime.datetime
    now = time.time()

    def stage(rows, name, mtime):
        st = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(st))
        part = next(f for f in os.listdir(st) if f.endswith(".parquet"))
        dst = raw / f"{name}.parquet"
        shutil.copy(st / part, dst)
        os.utime(dst, (mtime, mtime))

    stage([(D(2024, 1, 1, 10, 0), 1), (D(2024, 1, 1, 13, 0), 100)], "0_seed", now - 400)
    stage([(D(2024, 1, 1, 10, 30), 2)], "1_late_unevicted", now - 300)
    stage([(D(2024, 1, 1, 10, 45), 4)], "2_late_evicted", now - 200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(raw))
        .withWatermark("ts", "30 minutes")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("s"))
        .select(F.col("w.start").alias("ws"), "s")
    )
    progress: list = []
    out = run_stream_to_memory(
        spark, agg, "wm_semantics_mem", "append", progress_sink=progress
    )
    rows = [(r["ws"], r["s"]) for r in out.collect()]
    # exactly one emitted window: [10,11) with the merged (not dropped)
    # 10:30 row and without the post-eviction 10:45 row
    assert rows == [(D(2024, 1, 1, 10, 0), 3)]
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0) or 0
        for p in progress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1


def test_stream_stream_semi_join_equals_batch(spark, events_dir):
    """LEFT SEMI stream-stream join: converted views emit exactly once
    (no per-purchase duplication) and equal the batch semi join."""
    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.joins import (
        view_purchase_converted_views,
    )

    batch = load_events(spark, SF_DIR)
    expected = _rowset(view_purchase_converted_views(batch))
    # semi join semantics sanity: no view_id appears twice
    ids = [r[1] for r in expected]
    assert len(ids) == len(set(ids))

    stream = events_stream(spark, events_dir, watermark="10 minutes")
    out = view_purchase_converted_views(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_semi_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _rowset(spark.table("ss_semi_join")) == expected


def test_transform_with_state_v2_equals_batch(spark, events_dir):
    """transformWithStateInPandas (arbitrary-stateful v2) must equal the
    batch GROUP BY and the v1 applyInPandasWithState path. The v2 worker
    protocol requires protobuf — absent in some sandboxes, so this is an
    env-gated certification (same pattern as the PIL decode test)."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.queries import load_events
    from smfg_datawarehouse_spark.streaming.stateful import (
        running_user_totals_v2,
    )

    batch = load_events(spark, SF_DIR)
    expected = _rowset(
        batch.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("long"))
            .cast("long")
            .alias("total_micros"),
        )
    )
    stream = events_stream(spark, events_dir, watermark="10 minutes")
    drained = run_stream_to_memory(
        spark, running_user_totals_v2(stream), "tws_v2_mem", "update"
    )
    final = (
        drained.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_micros")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_micros").alias("total_micros"),
        )
    )
    assert _rowset(final) == expected


def test_dedup_within_watermark_semantics(spark, tmp_path):
    """Miniature pin of the dropDuplicatesWithinWatermark semantics
    s14_dedup_within_watermark's oracle relies on:

    - first occurrence emits immediately; a duplicate whose key is still
      in state is suppressed WITHOUT extending expiry and WITHOUT
      counting in numRowsDroppedByWatermark (the state hit wins over the
      late filter);
    - state eviction lags the watermark update by one batch, so a
      same-batch-as-crossing re-arrival is still deduped;
    - after a PRIOR batch evicted the key, a below-watermark re-arrival
      is late-filtered (counted in numRowsDroppedByWatermark) and an
      above-watermark re-arrival RE-EMITS.
    """
    import datetime
    import os
    import time

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    raw = tmp_path / "raw"
    raw.mkdir()
    D = datetime.datetime
    now = time.time()

    def stage(rows, name, mtime):
        st = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(st))
        part = next(f for f in os.listdir(st) if f.endswith(".parquet"))
        dst = raw / f"{name}.parquet"
        shutil.copy(st / part, dst)
        os.utime(dst, (mtime, mtime))

    stage([("A", D(2025, 1, 1, 10, 0)), ("B", D(2025, 1, 1, 10, 5))], "0", now - 500)
    # A dup while in state (suppressed, no metric); H advances wm to 12:30
    stage([("A", D(2025, 1, 1, 10, 10)), ("H", D(2025, 1, 1, 13, 0))], "1", now - 400)
    # wm now 12:30 but A/B evicted only at THIS batch's end: both still dedup
    stage([("A", D(2025, 1, 1, 12, 40)), ("B", D(2025, 1, 1, 12, 29))], "2", now - 300)
    # A/B evicted in the prior batch: above-wm A re-emits, below-wm B is
    # late-filtered with the metric
    stage([("A", D(2025, 1, 1, 12, 41)), ("B", D(2025, 1, 1, 12, 28))], "3", now - 200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(raw))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["id"])
    )
    progress: list = []
    out = run_stream_to_memory(
        spark, stream, "ddww_semantics_mem", "append", progress_sink=progress
    )
    rows = sorted((r["id"], str(r["ts"])) for r in out.collect())
    assert rows == [
        ("A", "2025-01-01 10:00:00"),
        ("A", "2025-01-01 12:41:00"),
        ("B", "2025-01-01 10:05:00"),
        ("H", "2025-01-01 13:00:00"),
    ]
    dropped_by_batch = {
        p["batchId"]: sum(
            op.get("numRowsDroppedByWatermark", 0) or 0
            for op in p.get("stateOperators", [])
        )
        for p in progress
    }
    assert dropped_by_batch.get(1, 0) == 0
    assert dropped_by_batch.get(2, 0) == 0  # in-state dedup, not wm drop
    assert dropped_by_batch.get(3, 0) == 1  # post-eviction late B


def test_s25_mv_refresh_batch_split_invariance(spark, tmp_path):
    """The s25 contract in miniature: folding month-keyed DECIMAL
    partials into the MV additively makes the refresh result identical
    however the backlog splits into micro-batches (2-file vs 4-file
    arrival) — and identical to the one-shot batch rollup."""
    import os

    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.queries import t
    from smfg_datawarehouse_spark.sources.versioned import VersionedTable

    orders = t(spark, "/root/testdata/sf0.001", "orders")

    def partial(df):
        return df.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias(
                "rev_partial"
            ),
        )

    def run(n_files: int, tag: str):
        raw = str(tmp_path / f"raw{tag}")
        orders.repartition(n_files).write.mode("overwrite").parquet(raw)
        vt = VersionedTable(spark, str(tmp_path / f"mv{tag}"))

        def refresh(batch_df, batch_id):
            delta = partial(batch_df)
            if vt.current_version() is not None:
                delta = vt.read().unionByName(delta)
            vt.write(
                delta.groupBy("month").agg(
                    F.sum("n_orders").cast("long").alias("n_orders"),
                    F.sum("rev_partial")
                    .cast("decimal(30,6)")
                    .alias("rev_partial"),
                )
            )

        q = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
            .writeStream.foreachBatch(refresh)
            .option("checkpointLocation", str(tmp_path / f"ckpt{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return sorted(
            (str(r.month), r.n_orders, str(r.rev_partial))
            for r in vt.read().collect()
        )

    two, four = run(2, "a"), run(4, "b")
    assert two == four
    oneshot = sorted(
        (str(r.month), r.n_orders, str(r.rev_partial))
        for r in partial(orders).collect()
    )
    assert two == oneshot

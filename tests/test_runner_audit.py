"""End-to-end run lifecycle: extraction over the zone lake with audit
ledger; failure isolation → PARTIAL; transform/load stage; merge upsert."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from smfg_datawarehouse_spark.audit import AuditLedger
from smfg_datawarehouse_spark.catalog import seed_fixture_catalog
from smfg_datawarehouse_spark.runner import run_staging_extraction
from smfg_datawarehouse_spark.sources.lake import LakeZones
from smfg_datawarehouse_spark.transform import (
    apply_output_mapping,
    merge_upsert,
    output_mapping_plan,
)


def _setup_raw(spark, zones: LakeZones):
    for name in ["lineitem", "orders", "customer"]:
        src = spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet")
        src.write.mode("overwrite").parquet(os.path.join(zones.raw, "tpch", name))


def test_full_run_success(spark, tmp_path):
    zones = LakeZones(str(tmp_path / "lake"))
    _setup_raw(spark, zones)
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    cat = seed_fixture_catalog(spark)

    pid, results = run_staging_extraction(spark, cat, zones, audit)
    assert {r.table: r.status for r in results} == {
        "tpch.lineitem": "SUCCESS",
        "tpch.orders": "SUCCESS",
    }
    master = audit.process_master().where(F.col("ProcessID") == pid).collect()[0]
    assert master["Status"] == "SUCCESS"
    assert master["ProcessEndAt"] is not None

    # staging output respects the compiled projection
    li = spark.read.parquet(zones.staging_table_dir("tpch", "lineitem"))
    assert li.columns == ["Order_Key", "l_linenumber", "Qty", "Net_Price", "Return_Flag"]

    # audit row counts reconcile with staged data (reference test strategy §5)
    sd = audit.stage_detail().where(F.col("ProcessID") == pid)
    counts = {r["TableName"]: r["RowCount"] for r in sd.collect()}
    assert counts["tpch.lineitem"] == li.count()
    assert all(r["Status"] == "SUCCESS" for r in sd.collect())


def test_partial_run_on_table_failure(spark, tmp_path):
    zones = LakeZones(str(tmp_path / "lake"))
    _setup_raw(spark, zones)
    os.rename(
        os.path.join(zones.raw, "tpch", "orders"),
        os.path.join(zones.raw, "tpch", "orders_missing"),
    )
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    cat = seed_fixture_catalog(spark)
    pid, results = run_staging_extraction(spark, cat, zones, audit)
    statuses = {r.table: r.status for r in results}
    assert statuses["tpch.lineitem"] == "SUCCESS"
    assert statuses["tpch.orders"] == "FAILED"
    master = audit.process_master().where(F.col("ProcessID") == pid).collect()[0]
    assert master["Status"] == "PARTIAL"
    failed = (
        audit.stage_detail()
        .where((F.col("ProcessID") == pid) & (F.col("Status") == "FAILED"))
        .collect()
    )
    assert len(failed) == 1 and failed[0]["ErrorMessage"]


def test_output_mapping_and_merge(spark, tmp_path):
    zones = LakeZones(str(tmp_path / "lake"))
    _setup_raw(spark, zones)
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    cat = seed_fixture_catalog(spark)
    run_staging_extraction(spark, cat, zones, audit)

    target, mapping, keys = output_mapping_plan(cat, 1)
    assert target == "dw.fact_lineitem"
    assert keys == ["order_key", "line_no"]
    staged = spark.read.parquet(zones.staging_table_dir("tpch", "lineitem"))
    out = apply_output_mapping(staged, mapping)
    # TargetPosition ordering + declared types
    assert out.columns == ["order_key", "line_no", "quantity", "net_price"]
    assert dict(out.dtypes)["net_price"] == "decimal(18,4)"
    assert dict(out.dtypes)["line_no"] == "int"

    # merge: target must be key-unique (MERGE precondition); synthetic
    # lineitem repeats (orderkey, linenumber), so dedup for the target
    target_df = out.dropDuplicates(keys).cache()
    updates = target_df.limit(10).withColumn("quantity", F.col("quantity") + 1000)
    merged = merge_upsert(target_df, updates, keys)
    assert merged.count() == target_df.count()
    bumped = merged.where(F.col("quantity") > 900).count()
    assert bumped == 10


def test_audit_id_allocation_resumes(spark, tmp_path):
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    p1 = audit.create_process_master()
    audit2 = AuditLedger(spark, str(tmp_path / "audit"))  # fresh engine start
    p2 = audit2.create_process_master()
    assert p2 == p1 + 1


def test_writer_injected_timestamps(spark):
    from smfg_datawarehouse_spark.transform import with_audit_timestamps

    df = spark.range(3).select(F.col("id").alias("k"))
    stamped = with_audit_timestamps(df)
    assert {"k", "CreatedAt", "UpdatedAt"} == set(stamped.columns)
    row = stamped.first()
    assert row["CreatedAt"] is not None and row["UpdatedAt"] is not None
    # CreatedAt preserved on re-stamp (ON UPDATE semantics touch only UpdatedAt)
    restamped = with_audit_timestamps(stamped)
    assert restamped.columns.count("CreatedAt") == 1


def test_retry_hook_recovers_and_ledger_keeps_attempt_history(spark, tmp_path):
    """Reference DAG declares retries/retry_delay (default_args, retries=0);
    the runner's retry hook re-attempts failed tables. A source that fails
    once then succeeds must yield a SUCCESS table + SUCCESS run, with the
    failed attempt's FAILED row preserved in the ledger (attempt history),
    and finalize_run counting only final attempts."""
    zones = LakeZones(str(tmp_path / "lake"))
    _setup_raw(spark, zones)
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    cat = seed_fixture_catalog(spark)

    flaky_calls = {}

    def flaky_reader(s, plan):
        import os as _os

        n = flaky_calls.get(plan.full_table_name, 0)
        flaky_calls[plan.full_table_name] = n + 1
        if plan.table_name == "orders" and n == 0:
            raise RuntimeError("transient source outage")
        return s.read.parquet(
            _os.path.join(zones.raw, plan.schema_name, plan.table_name)
        )

    pid, results = run_staging_extraction(
        spark, cat, zones, audit, source_reader=flaky_reader, retries=1
    )
    assert {r.table: r.status for r in results} == {
        "tpch.lineitem": "SUCCESS",
        "tpch.orders": "SUCCESS",
    }
    master = audit.process_master().where(F.col("ProcessID") == pid).collect()[0]
    assert master["Status"] == "SUCCESS"  # not PARTIAL: retried attempt won
    orders_rows = (
        audit.stage_detail()
        .where((F.col("ProcessID") == pid) & (F.col("TableName") == "tpch.orders"))
        .orderBy("StageDetailID")
        .collect()
    )
    assert [r["Status"] for r in orders_rows] == ["FAILED", "SUCCESS"]
    assert "transient source outage" in orders_rows[0]["ErrorMessage"]


def test_retries_exhausted_still_partial(spark, tmp_path):
    zones = LakeZones(str(tmp_path / "lake"))
    _setup_raw(spark, zones)
    audit = AuditLedger(spark, str(tmp_path / "audit"))
    cat = seed_fixture_catalog(spark)

    def always_fail_orders(s, plan):
        import os as _os

        if plan.table_name == "orders":
            raise RuntimeError("hard outage")
        return s.read.parquet(
            _os.path.join(zones.raw, plan.schema_name, plan.table_name)
        )

    pid, results = run_staging_extraction(
        spark, cat, zones, audit, source_reader=always_fail_orders, retries=2
    )
    statuses = {r.table: r.status for r in results}
    assert statuses["tpch.orders"] == "FAILED"
    master = audit.process_master().where(F.col("ProcessID") == pid).collect()[0]
    assert master["Status"] == "PARTIAL"
    n_attempts = (
        audit.stage_detail()
        .where((F.col("ProcessID") == pid) & (F.col("TableName") == "tpch.orders"))
        .count()
    )
    assert n_attempts == 3  # 1 + 2 retries, all preserved

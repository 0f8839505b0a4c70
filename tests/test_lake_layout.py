"""Lake-layout scale features: partition pruning + bucketed shuffle-free
joins, pinned against the actual physical plans."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from smfg_datawarehouse_spark.plans.inspect import formatted_plan
from smfg_datawarehouse_spark.queries import load_events
from smfg_datawarehouse_spark.sources.lake import (
    write_bucketed_table,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def test_partition_pruning_reads_one_day(spark, tmp_path):
    events = load_events(spark, SF_DIR).withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, ["day"])

    q = spark.read.parquet(path).where(F.col("day") == "2024-01-03")
    plan = formatted_plan(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), "day filter must prune partitions"
    expected = events.where(F.col("day") == "2024-01-03").count()
    assert q.count() == expected


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    try:
        # force SMJ so the assertion targets the exchange, not the strategy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = formatted_plan(j)
        assert re.search(r"^\(\d+\) SortMergeJoin", plan, re.M)
        # bucketing co-locates both sides: no shuffle exchange anywhere
        assert not re.search(r"^\(\d+\) Exchange", plan, re.M), plan
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_csv_json_round_trip(spark, tmp_path):
    """Format-agnostic source/sink: csv and json round-trip with explicit
    schemas (no inference pass — the scale-safe path for schemaless
    formats)."""
    from pyspark.sql import types as T

    from smfg_datawarehouse_spark.sources.lake import read_source, write_sink

    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.25), (3, None, 0.0)],
        "id BIGINT, name STRING, score DOUBLE",
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    for fmt, opts in [("csv", {"header": "true"}), ("json", {})]:
        p = str(tmp_path / f"rt_{fmt}")
        write_sink(src, fmt, p, options=opts)
        back = read_source(spark, fmt, p, schema=schema, options=opts)
        assert back.schema == src.schema
        assert sorted(map(str, back.collect())) == sorted(map(str, src.collect()))


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Batches written before a column existed surface it as NULL under
    mergeSchema — catalog column additions can't invalidate landed data."""
    from smfg_datawarehouse_spark.sources.lake import read_evolved_parquet

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id BIGINT, name STRING").write.mode(
        "overwrite"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id BIGINT, name STRING, score DOUBLE"
    ).write.mode("append").parquet(p)
    merged = read_evolved_parquet(spark, p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_compact_swap_crash_safe(spark, tmp_path, monkeypatch):
    """compact()'s swap must never leave a window where `path` is absent:
    kill the swap at the worst point (after rename-old-away, before
    rename-new-in fails) and assert the original dir is restored intact."""
    import os

    from smfg_datawarehouse_spark.sources import lake

    path = str(tmp_path / "tbl")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    real_rename = os.rename
    def failing_rename(src, dst):
        if src.endswith("__compact_tmp"):  # the rename-new-in step
            raise OSError("injected crash mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    try:
        lake.compact(spark, path, target_file_bytes=1 << 30)
        raise AssertionError("expected the injected OSError to propagate")
    except OSError:
        pass
    monkeypatch.undo()

    # original data is back at `path` (rolled back), readable and intact
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before
    assert not os.path.exists(path + "__compact_old")

    # and a clean run afterwards still compacts to one file
    lake.compact(spark, path, target_file_bytes=1 << 30)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before

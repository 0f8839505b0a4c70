"""Skew utilities + determinism-under-repartition properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from smfg_datawarehouse_spark.functions import ordered_concat_ws
from smfg_datawarehouse_spark.functions.skew import (
    salted_join,
    salted_two_stage_agg,
)


def _skewed(spark):
    # one hot key (90%) + a uniform tail — the shape AQE alone can't split
    # past a single reducer for the hot key's matches
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("v"),
        F.col("id").alias("uid"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, ["k"], salt_from=F.col("uid"), buckets=8).select(
        "k", "v", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_two_stage_agg_equals_direct(spark):
    df = _skewed(spark)
    direct = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    two_stage = salted_two_stage_agg(
        df,
        ["k"],
        salt_from=F.col("uid"),
        partial_aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pc").cast("long").alias("c")],
        buckets=8,
    )
    assert sorted(map(tuple, two_stage.collect())) == sorted(map(tuple, direct.collect()))


def test_ordered_concat_deterministic_under_repartition(spark):
    """A1's hard requirement (SURVEY §7 risks): the ordered GROUP_CONCAT
    must not depend on partition layout — collect_list order is
    partition-dependent, the in-array sort must fully absorb it."""
    base = spark.range(0, 1000).select(
        (F.col("id") % 13).alias("g"),
        F.col("id").alias("ord"),
        F.concat(F.lit("item_"), F.col("id")).alias("val"),
    )
    results = []
    for parts in (1, 7, 32):
        agg = (
            base.repartition(parts)
            .groupBy("g")
            .agg(ordered_concat_ws(", ", F.col("ord"), F.col("val")).alias("joined"))
        )
        results.append(sorted(map(tuple, agg.collect())))
    assert results[0] == results[1] == results[2]

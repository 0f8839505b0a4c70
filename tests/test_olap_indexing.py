"""Edge-case pins for the OLAP physical-layer operators (q95-q100 family):
boundary semantics that the sf-fixture differentials may not exercise."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.operators.olap_indexing import _interleave_sql


def test_morton_interleave_is_bijective_on_the_grid(spark):
    # every (xb, yb) in the 8-bit x 8-bit grid must map to a distinct
    # z-value in [0, 65536) — a dropped or doubled bit collapses cells
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("xb"), (F.col("id") / 256).cast("long").alias("yb")
    )
    z = df.withColumn("z", F.expr(_interleave_sql("xb", "yb")))
    stats = z.agg(
        F.countDistinct("z").alias("nd"), F.min("z").alias("mn"), F.max("z").alias("mx")
    ).first()
    assert stats["nd"] == 65536 and stats["mn"] == 0 and stats["mx"] == 65535


def test_band_join_catches_exact_boundary_pairs(spark):
    # |a-b| == w exactly must be caught (bucket fanout covers +-1 bucket)
    rows = [(1, 10.0), (2, 11.0), (3, 12.0), (4, 13.5), (5, 9.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    w = 1.0
    b = F.floor(F.col("v") / w).cast("long")
    left = df.select(
        F.col("k").alias("ak"), F.col("v").alias("av"),
        F.explode(F.array(b - 1, b, b + 1)).alias("jb"),
    )
    right = df.select(F.col("k").alias("bk"), F.col("v").alias("bv"), b.alias("jb"))
    got = sorted(
        (r["ak"], r["bk"])
        for r in left.join(right, "jb")
        .where((F.col("ak") < F.col("bk")) & (F.abs(F.col("av") - F.col("bv")) <= w))
        .select("ak", "bk").distinct().collect()
    )
    brute = sorted(
        (a[0], c[0]) for a in rows for c in rows
        if a[0] < c[0] and abs(a[1] - c[1]) <= w
    )
    assert got == brute  # includes the exact-boundary (1,2),(2,3),(1,5) pairs


def test_skyline_reduction_matches_brute_force_with_ties(spark):
    # equal (price,size) twins: neither dominates -> both survive;
    # same price, smaller size -> dominated
    rows = [
        ("B1", 1, 10.0, 5), ("B1", 2, 10.0, 5), ("B1", 3, 10.0, 4),
        ("B1", 4, 9.0, 3), ("B1", 5, 11.0, 6), ("B1", 6, 12.0, 6),
    ]
    df = spark.createDataFrame(
        rows, "p_brand string, p_partkey long, p_retailprice double, p_size int"
    )
    best = df.groupBy("p_brand", "p_retailprice").agg(F.max("p_size").alias("msize"))
    w = (
        W.partitionBy("p_brand").orderBy("p_retailprice")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    frontier = (
        best.withColumn("rmax", F.max("msize").over(w))
        .where(F.col("rmax").isNull() | (F.col("msize") > F.col("rmax")))
        .select("p_brand", "p_retailprice", F.col("msize").alias("p_size"))
    )
    got = sorted(
        r["p_partkey"]
        for r in df.join(frontier, ["p_brand", "p_retailprice", "p_size"]).collect()
    )

    def dominated(a):
        return any(
            b[2] <= a[2] and b[3] >= a[3] and (b[2] < a[2] or b[3] > a[3])
            for b in rows if b[0] == a[0]
        )

    brute = sorted(a[1] for a in rows if not dominated(a))
    assert got == brute == [1, 2, 4, 5]


def test_global_ordinals_equal_plain_row_number_with_ties(spark):
    from smfg_datawarehouse_spark.functions.ordering import global_ordinals

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 37).alias("v")  # heavy ties
    )
    two_phase = global_ordinals(df, ["v", "k"], F.expr("v DIV 5"))
    plain = df.withColumn(
        "rn0", F.row_number().over(W.orderBy("v", "k")) - 1
    )
    assert (
        two_phase.select("k", "rn0").exceptAll(plain.select("k", "rn0")).count() == 0
    )


def test_bitmap_word_packing_boundary(spark):
    # ordinals 61 and 62 must land in adjacent words with bits 61 and 0
    df = spark.createDataFrame([(61,), (62,)], "rn long")
    out = df.select(
        F.expr("rn DIV 62").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rn % 62 AS INT))").alias("mask"),
    ).collect()
    got = {(r["word"], r["mask"]) for r in out}
    assert got == {(0, 1 << 61), (1, 1)}

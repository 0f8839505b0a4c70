"""OLAP physical-layout operators [A4/S3 extensions]: bitmap-index
intersection and multi-dimensional (Z-order) clustering audits.

Both certify *layout disciplines* that decide scan cost at 100 TB:

- **Bitmap indexes** (q95): per-chunk ordinal bitmaps let a multi-predicate
  count run as word-wise ``AND`` + ``popcount`` over index words instead of
  a second full scan — the classic OLAP bitmap-index plan (O'Neil & Quass,
  SIGMOD'97). Ordinals are LOCAL to a hash chunk (the file/row-group analog),
  so no global sort is ever needed and chunks build independently.
- **Z-order clustering** (q96): Morton-interleaving two dimensions before
  range-bucketing rows gives every file a tight TWO-dimensional bounding
  box, so a rectangle probe can skip files on both predicates at once —
  the layout behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` and the
  multi-dim successor to l18's single-dim zone maps. The audit compares
  files-touched / rows-scanned for the same probe under a Z-order layout,
  a single-dim sort layout, and an unclustered layout.

Reference anchor: the ordered consolidated extract of
``reference/source_code/python/airflow_utility/staging_data_extraction.py:30-80``
is a single-dim physical ordering; these operators are the multi-predicate
generalizations a lake at scale actually uses.

Every expression (ordinals, shifts, bit ops, bucket math, interleave) is
integer-exact and replayed verbatim by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.queries import register, t

# 62-bit words: DuckDB raises on BIGINT overflow for 1 << 63 (and 1 << 62
# sets the sign bit on the mask only at 63), so bitmap ordinals pack 62
# rows per word — keeps every mask positive in both engines.
_WORD_BITS = 62
_N_CHUNKS = 32

_BITMAP_ORACLE = f"""
    WITH base AS (
      SELECT o_orderkey % {_N_CHUNKS} AS bucket,
             ROW_NUMBER() OVER (PARTITION BY o_orderkey % {_N_CHUNKS}
                                ORDER BY o_orderkey) - 1 AS rn,
             (o_orderpriority = '1-URGENT') AS pa,
             (o_totalprice > 150000.0) AS pb
      FROM orders
    ), words AS (
      SELECT bucket, rn // {_WORD_BITS} AS word,
             bit_or(CASE WHEN pa THEN 1::BIGINT << CAST(rn % {_WORD_BITS} AS INTEGER)
                         ELSE 0::BIGINT END) AS a_bits,
             bit_or(CASE WHEN pb THEN 1::BIGINT << CAST(rn % {_WORD_BITS} AS INTEGER)
                         ELSE 0::BIGINT END) AS b_bits,
             SUM(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS nd
      FROM base GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(SUM(bit_count(a_bits & b_bits)) AS BIGINT) AS n_bitmap,
           CAST(SUM(nd) AS BIGINT) AS n_direct,
           CAST(SUM(CASE WHEN a_bits <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_words_a,
           CAST(SUM(CASE WHEN b_bits <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_words_b
    FROM words GROUP BY bucket
"""


@register("q95_bitmap_index_intersection", _BITMAP_ORACLE)
def q95_bitmap_index_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A4] Bitmap-index AND: orders get chunk-local ordinals (chunk =
    ``o_orderkey % 32`` — the file/row-group analog; ordinals never need
    a global sort), each predicate becomes a packed 62-bit-word bitmap
    via ``bit_or(1 << bit)``, and the two-predicate count is
    ``popcount(a & b)`` summed over index words. The per-chunk audit
    column ``n_direct`` (plain filtered count) must equal ``n_bitmap``
    row for row — the oracle enforces the index's correctness contract.
    At 100 TB: both bitmaps build in ONE scan with map-side partial
    ``bit_or`` combine; the AND/popcount pass touches only index words
    (rows/62 longs per predicate), which is why bitmap indexes win for
    multi-predicate selectivity estimation and combined filters."""
    o = t(spark, sf_dir, "orders")
    bucket = (F.col("o_orderkey") % _N_CHUNKS).alias("bucket")
    w = W.partitionBy("bucket").orderBy("o_orderkey")
    base = o.select(
        bucket,
        "o_orderkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("pa"),
        (F.col("o_totalprice") > 150000.0).alias("pb"),
    ).withColumn("rn", F.row_number().over(w) - 1)
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(rn % {_WORD_BITS} AS INT))")
    words = (
        base.withColumn("word", F.expr(f"rn DIV {_WORD_BITS}"))
        .withColumn("a_mask", F.when(F.col("pa"), mask).otherwise(F.lit(0).cast("long")))
        .withColumn("b_mask", F.when(F.col("pb"), mask).otherwise(F.lit(0).cast("long")))
        .groupBy("bucket", "word")
        .agg(
            F.bit_or("a_mask").alias("a_bits"),
            F.bit_or("b_mask").alias("b_bits"),
            F.sum(F.when(F.col("pa") & F.col("pb"), 1).otherwise(0)).alias("nd"),
        )
    )
    return words.groupBy("bucket").agg(
        F.sum(F.bit_count(F.col("a_bits").bitwiseAND(F.col("b_bits"))))
        .cast("long")
        .alias("n_bitmap"),
        F.sum("nd").cast("long").alias("n_direct"),
        F.sum(F.when(F.col("a_bits") != 0, 1).otherwise(0)).cast("long").alias("n_words_a"),
        F.sum(F.when(F.col("b_bits") != 0, 1).otherwise(0)).cast("long").alias("n_words_b"),
    )


# --- q96: Z-order clustering audit ---------------------------------------

_N_FILES = 64
# Probe rectangle: narrow on custkey, wide on price — the multi-predicate
# shape where single-dim sorting fails and Z-order pays off.
_PROBE_K_LO, _PROBE_K_HI = 100, 199
_PROBE_P_LO, _PROBE_P_HI = 50000.0, 450000.0


def _interleave_sql(xb: str, yb: str) -> str:
    """Morton interleave of two 8-bit bucket ids → 16-bit z-value; pure
    shifts/ands, identical text semantics in Spark SQL and DuckDB."""
    terms = []
    for b in range(8):
        terms.append(f"((({xb} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({yb} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def _zorder_oracle() -> str:
    probe = (
        f"(o_custkey BETWEEN {_PROBE_K_LO} AND {_PROBE_K_HI} "
        f"AND o_totalprice BETWEEN {_PROBE_P_LO} AND {_PROBE_P_HI})"
    )
    touched = (
        f"(mnk <= {_PROBE_K_HI} AND mxk >= {_PROBE_K_LO} "
        f"AND mnp <= {_PROBE_P_HI} AND mxp >= {_PROBE_P_LO})"
    )
    layouts = {
        "zorder": f"zval // {65536 // _N_FILES}",
        "price_sorted": "yb // 4",
        "unclustered": f"o_orderkey % {_N_FILES}",
    }
    branches = []
    for name, file_expr in layouts.items():
        branches.append(f"""
    SELECT '{name}' AS layout,
           CAST(COUNT(*) AS BIGINT) AS files_total,
           CAST(SUM(CASE WHEN {touched} THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
           CAST(SUM(CASE WHEN {touched} THEN nrows ELSE 0 END) AS BIGINT) AS rows_touched,
           CAST(SUM(nmatch) AS BIGINT) AS rows_matching
    FROM (
      SELECT {file_expr} AS f,
             MIN(o_custkey) AS mnk, MAX(o_custkey) AS mxk,
             MIN(o_totalprice) AS mnp, MAX(o_totalprice) AS mxp,
             COUNT(*) AS nrows,
             SUM(CASE WHEN {probe} THEN 1 ELSE 0 END) AS nmatch
      FROM zv GROUP BY 1
    )""")
    body = "\n    UNION ALL\n".join(branches)
    return f"""
    WITH stats AS (
      SELECT MIN(o_custkey) AS mnk0, MAX(o_custkey) AS mxk0,
             MIN(o_totalprice) AS mnp0, MAX(o_totalprice) AS mxp0
      FROM orders
    ), base AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ((o_custkey - mnk0) * 256) // (mxk0 - mnk0 + 1) AS xb,
             LEAST(255, CAST(FLOOR(((o_totalprice - mnp0) / (mxp0 - mnp0)) * 256.0)
                             AS BIGINT)) AS yb
      FROM orders CROSS JOIN stats
    ), zv AS (
      SELECT *, {_interleave_sql('xb', 'yb')} AS zval FROM base
    )
    {body}
"""


@register("q96_zorder_skipping_audit", _zorder_oracle())
def q96_zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[S3/A4] Z-order (Morton-curve) clustering audit: orders are bucketed
    to 8-bit grid cells on (o_custkey, o_totalprice) using scan-local
    min/max bucket math (the sampled-range analog of Delta ``OPTIMIZE
    ZORDER BY``), bit-interleaved to a 16-bit z-value, and assigned to 64
    logical files under three layouts — z-value ranges, single-dim price
    sort, and unclustered hash. For one rectangle probe (narrow custkey ×
    wide price band) the audit reports per layout how many file bounding
    boxes intersect the probe and how many rows those files hold: the
    exact files/rows a min-max-pruned reader (l18's zone maps, parquet
    row-group stats) would have to scan. Z-order keeps BOTH dimensions'
    extents tight per file, so the 2-dim probe touches a fraction of the
    rows either alternative scans — the property certified here with an
    integer-exact oracle replay. At 100 TB the layout step is one
    ``repartitionByRange(zval)`` + within-partition sort; the audit side
    is two cheap aggregations."""
    o = t(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_custkey").alias("mnk0"),
        F.max("o_custkey").alias("mxk0"),
        F.min("o_totalprice").alias("mnp0"),
        F.max("o_totalprice").alias("mxp0"),
    )
    base = (
        o.crossJoin(F.broadcast(stats))
        .withColumn("xb", F.expr("((o_custkey - mnk0) * 256) DIV (mxk0 - mnk0 + 1)"))
        .withColumn(
            "yb",
            F.least(
                F.lit(255).cast("long"),
                F.floor(
                    (F.col("o_totalprice") - F.col("mnp0"))
                    / (F.col("mxp0") - F.col("mnp0"))
                    * 256.0
                ),
            ),
        )
        .withColumn("zval", F.expr(_interleave_sql("xb", "yb")))
    )
    probe = (
        F.col("o_custkey").between(_PROBE_K_LO, _PROBE_K_HI)
        & F.col("o_totalprice").between(_PROBE_P_LO, _PROBE_P_HI)
    )
    touched = (
        (F.col("mnk") <= _PROBE_K_HI)
        & (F.col("mxk") >= _PROBE_K_LO)
        & (F.col("mnp") <= _PROBE_P_HI)
        & (F.col("mxp") >= _PROBE_P_LO)
    )
    # ONE scan + ONE shuffle for all three layouts: every row emits its
    # (layout, file) assignment via explode (3x narrow row multiply),
    # instead of three separate scans+aggregations of the base table
    assign = F.explode(
        F.array(
            F.struct(
                F.lit("zorder").alias("layout"),
                F.expr(f"zval DIV {65536 // _N_FILES}").alias("f"),
            ),
            F.struct(
                F.lit("price_sorted").alias("layout"),
                F.expr("yb DIV 4").alias("f"),
            ),
            F.struct(
                F.lit("unclustered").alias("layout"),
                (F.col("o_orderkey") % _N_FILES).alias("f"),
            ),
        )
    )
    files = (
        base.select("o_custkey", "o_totalprice", assign.alias("a"))
        .groupBy("a.layout", "a.f")
        .agg(
            F.min("o_custkey").alias("mnk"),
            F.max("o_custkey").alias("mxk"),
            F.min("o_totalprice").alias("mnp"),
            F.max("o_totalprice").alias("mxp"),
            F.count(F.lit(1)).alias("nrows"),
            F.sum(F.when(probe, 1).otherwise(0)).alias("nmatch"),
        )
    )
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("files_total"),
        F.sum(F.when(touched, 1).otherwise(0)).cast("long").alias("files_touched"),
        F.sum(F.when(touched, F.col("nrows")).otherwise(0))
        .cast("long")
        .alias("rows_touched"),
        F.sum("nmatch").cast("long").alias("rows_matching"),
    )


# --- q98: band (non-equi) join via bucket expansion -----------------------

_BAND_W = 1.0

_BAND_ORACLE = f"""
    SELECT a.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(abs(a.p_retailprice - b.p_retailprice)
                         AS DECIMAL(30,6))) AS DOUBLE) AS sum_gap
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND abs(a.p_retailprice - b.p_retailprice) <= {_BAND_W}
    GROUP BY a.p_brand
"""


@register("q98_band_join_bucketed", _BAND_ORACLE)
def q98_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J extension] BAND JOIN (|a.x − b.x| ≤ w non-equi predicate) made
    shuffle-joinable: each left row fans out to its price bucket and both
    neighbors (w-wide buckets ⇒ any in-band partner is within ±1 bucket),
    the join becomes an EQUI-join on (brand, bucket), and the exact band
    predicate re-filters candidates. This is the standard rewrite that
    turns Spark's only native plan for such predicates — a nested-loop
    over brand groups — into a hash join whose candidate volume is
    density·w per row instead of |group|². The oracle runs the plain
    non-equi self-join; pair counts and the exact-decimal gap sum must
    hash-match, certifying the bucket expansion loses nothing at the
    band edges. At 100 TB: one 3× narrow fan-out, one shuffle, no
    nested loop (pinned in tests/test_plans)."""
    p = t(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_retailprice")
    b = F.floor(F.col("p_retailprice") / _BAND_W).cast("long")
    left = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("ak"),
        F.col("p_retailprice").alias("av"),
        F.explode(
            F.array(b - 1, b, b + 1)
        ).alias("jb"),
    )
    right = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("bk"),
        F.col("p_retailprice").alias("bv"),
        b.alias("jb"),
    )
    pairs = left.join(right, ["brand", "jb"]).where(
        (F.col("ak") < F.col("bk"))
        & (F.abs(F.col("av") - F.col("bv")) <= _BAND_W)
    )
    from smfg_datawarehouse_spark.queries import dsum

    return pairs.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        dsum(F.abs(F.col("av") - F.col("bv"))).alias("sum_gap"),
    )


# --- q99: skyline (Pareto frontier) ----------------------------------------

_SKYLINE_ORACLE = """
    SELECT a.p_brand, a.p_partkey, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_brand = a.p_brand
        AND b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
"""


@register("q99_skyline_pareto", _SKYLINE_ORACLE)
def q99_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[§2.5 extension] SKYLINE / Pareto frontier per brand (minimize
    price, maximize size) computed WITHOUT the quadratic dominance
    self-join the definition suggests (and the oracle runs): (1) within
    each (brand, price), only max-size rows can be non-dominated (an
    equal-price smaller-size row is strictly dominated), (2) over the
    now-distinct prices per brand, a row is dominated iff the running
    max size over strictly-cheaper rows reaches its size — one ordered
    window per brand — and (3) surviving (brand, price, size) keys join
    back to recover every tied part. Two keyed windows + one broadcast
    join vs the oracle's NOT EXISTS over |brand-group|² pairs: the
    classic sort-based skyline (Börzsönyi et al., ICDE'01) in Catalyst
    operators. Equal (price, size) twins dominate neither each other nor
    anything the other survives — both emit, matching NOT EXISTS."""
    p = t(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    best = p.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("msize")
    )
    w = (
        W.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    frontier = (
        best.withColumn("rmax", F.max("msize").over(w))
        .where(F.col("rmax").isNull() | (F.col("msize") > F.col("rmax")))
        .select("p_brand", "p_retailprice", F.col("msize").alias("p_size"))
    )
    return p.join(
        F.broadcast(frontier), ["p_brand", "p_retailprice", "p_size"]
    ).select("p_brand", "p_partkey", "p_retailprice", "p_size")


# --- q100: equi-depth histogram (ANALYZE-style column stats) ---------------

_HIST_BUCKETS = 16

_HIST_ORACLE = f"""
    WITH o AS (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS rn0,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT CAST(LEAST((rn0 * {_HIST_BUCKETS}) // n, {_HIST_BUCKETS} - 1) AS BIGINT)
             AS bucket,
           MIN(v) AS lo, MAX(v) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv
    FROM o GROUP BY 1
"""


@register("q100_equi_depth_histogram", _HIST_ORACLE)
def q100_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A4/catalog] EQUI-DEPTH HISTOGRAM — the ANALYZE TABLE column
    statistic a cost-based optimizer feeds on (selectivity estimation,
    join sizing): 16 buckets of (±1) equal row count over o_totalprice,
    each with exact bounds, row count, and NDV. Bucket of a row is
    floor(rank·16/N) over the EXACT global order — and the global
    ordinal is the scalable two-phase form (band offsets + within-band
    rank, ``functions/ordering.global_ordinals``), never a
    one-partition sort, which is what makes this runnable as a routine
    stats refresh on a 100 TB table. The oracle computes the same
    ordinals with a plain global ROW_NUMBER; both routes must agree on
    every bucket edge — including where ties straddle a boundary (the
    o_orderkey tie-break pins them deterministically)."""
    from smfg_datawarehouse_spark.functions.ordering import global_ordinals

    o = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), "o_orderkey"
    )
    ords = global_ordinals(o, ["v", "o_orderkey"], F.expr("CAST(v / 5000 AS BIGINT)"))
    n = ords.withColumn("n", F.sum(F.lit(1)).over(W.partitionBy()))
    bucket = F.least(
        F.expr(f"(rn0 * {_HIST_BUCKETS}) DIV n"), F.lit(_HIST_BUCKETS - 1)
    ).cast("long")
    return n.groupBy(bucket.alias("bucket")).agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("v").cast("long").alias("ndv"),
    )

"""Similarity search [X] over embedding columns (``array<float>``).

Two strategies:

- **Brute-force cosine top-k** — exact; a broadcast of the query set against
  a full scan of the corpus, cosine evaluated as a Catalyst expression
  (``zip_with`` + ``aggregate`` fold — JVM-side, codegen). At 100 TB the
  corpus side stays partitioned; only the query set is broadcast, so cost is
  a single pass, no shuffle until the per-query top-k (window on query_id).
- **LSH-bucketed (random hyperplane / SimHash for cosine)** — sign-bit
  sketch over fixed pseudo-random hyperplanes derived deterministically from
  the dimension index (no RNG at runtime); candidates share a bucket
  prefix. Cuts the cross product to per-bucket blocks; recall tunable by
  number of tables/bits. The scale path for ANN.

Numeric determinism: the fold is left-to-right (``((0+x1)+x2)+...``), which
matches DuckDB's ``list_reduce`` fold — the oracle is bit-identical, so
scores can be emitted directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.queries import register, t


def _unrolled_dot(a: str, b: str, dim: int) -> F.Column:
    """Left-to-right dot product as a flat codegen'd expression.

    ``zip_with``+``aggregate`` higher-order functions are *interpreted* per
    element in Spark (no whole-stage codegen) — ~15× slower on dense math.
    Unrolling ``element_at`` terms keeps the identical left-to-right IEEE
    fold (bit-compatible with the DuckDB ``list_reduce`` oracle) while
    staying inside codegen.
    """
    terms = [
        F.element_at(F.col(a), i + 1) * F.element_at(F.col(b), i + 1) for i in range(dim)
    ]
    acc = terms[0]
    for t_ in terms[1:]:
        acc = acc + t_
    return acc


def _unrolled_norm(a: str, dim: int) -> F.Column:
    terms = [
        F.element_at(F.col(a), i + 1) * F.element_at(F.col(a), i + 1) for i in range(dim)
    ]
    acc = terms[0]
    for t_ in terms[1:]:
        acc = acc + t_
    return F.sqrt(acc)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    ``queries`` is broadcast; the corpus streams partitioned (single pass, no
    shuffle until the per-query top-k window). Norms are computed once per
    row on each side before the join — O(N+Q) instead of O(N·Q) norm work.
    Self-matches excluded.
    """
    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("q_norm", _unrolled_norm("qv", dim))
    c = (
        corpus.repartition(n_parts)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("c_norm", _unrolled_norm("cv", dim))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                F.col("q_norm") * F.col("c_norm") != 0,
                _unrolled_dot("qv", "cv", dim) / (F.col("q_norm") * F.col("c_norm")),
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def simhash_bits(vec: F.Column, dim: int, bits: int = 16) -> F.Column:
    """Sign-bit sketch against ``bits`` deterministic pseudo-random hyperplanes.

    Hyperplane b's weight for dimension i is derived from a hash of (b, i) —
    reproducible everywhere, no runtime RNG. Returns a bigint bucket id.
    """
    # weight(b, i) in {-1, +1} from parity of a cheap integer hash
    def weight(b: int, i: int) -> int:
        h = (b * 1_000_003 + i * 7919 + 12345) & 0xFFFFFFFF
        h ^= h >> 16
        h = (h * 0x45D9F3B) & 0xFFFFFFFF
        h ^= h >> 16
        return 1 if (h & 1) else -1

    acc = F.lit(0).cast("long")
    for b in range(bits):
        dot = None
        for i in range(dim):
            term = F.element_at(vec, i + 1) * F.lit(float(weight(b, i)))
            dot = term if dot is None else dot + term
        bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        acc = acc + (bit * F.lit(2**b).cast("long"))
    return acc


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: candidates must share the simhash bucket.

    Recall < 1.0 by construction; bits trades recall vs. block size. The
    bucket join replaces the cross product — per-bucket cost is |q_b|×|c_b|.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", simhash_bits(F.col("qv"), dim, bits))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", simhash_bits(F.col("cv"), dim, bits))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_unrolled_dot("qv", "cv", dim) / (_unrolled_norm("qv", dim) * _unrolled_norm("cv", dim))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id % 25 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(list_zip(q.qv, c.v), s -> s[1] * s[2]),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y)))
               AS cos_sim
      FROM vecs c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
"""


@register("x10_ann_bruteforce_topk", _TOPK_ORACLE)
def x10_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Exact cosine top-10 neighbors for every 25th vector."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 25 == 0)
    out = brute_force_topk(e, queries, dim=64, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))

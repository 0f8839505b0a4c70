"""k-NN graph construction over an embedding column [X].

The batch artifact every embedding-driven curation step downstream of
ANN consumes (SemDeDup clustering, label propagation, graph dedup,
hard-negative mining all start from "each vector's k nearest
neighbors"): for EVERY vector, its top-k cosine neighbors — built the
IVF way (probe a bounded number of coarse cells, score only in-cell
candidates) so the pair space is Σ|cell|·nprobe, never N².

Everything is expression-level (zip_with/aggregate left-to-right folds,
array_min tie-breaks) — zero Python in the hot path, and the cell
assignment + probing + scoring replay exactly in the DuckDB oracle, so
the *approximate* graph is still a bit-exact certified artifact (same
discipline as x11's IVF top-k; reference scope: SURVEY.md §2.12
extension surface — the reference has no analytics engine to cite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.queries import register, t

KNN_K = 5
KNN_NPROBE = 2
_CENT_RULE = 29, 7  # centroid seed: vec_id % 29 == 7 (x11's deterministic rule)


def _fold_cosine(a: Column, b: Column) -> Column:
    """Left-to-right fold cosine of two array<double> columns — the exact
    arithmetic DuckDB's ``list_reduce`` replays (see similarity._DCOS)."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_graph(
    emb: DataFrame,
    k: int = KNN_K,
    nprobe: int = KNN_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) — IVF-celled k-NN graph.

    One corpus scan assigns every vector to its nearest coarse cell AND
    derives its ``nprobe`` probe cells (centroids enter the plan as a
    LITERAL array-of-structs — bytes, not data — so both are scan-side
    ``transform`` + ``array_min``/``array_sort`` with zero joins, the
    x57 ``_km_assign`` idiom). The only shuffle is the probe⋈cell equi-
    join keyed on cell id: candidate volume is Σ_cells |cell|·(probes
    into that cell), the IVF contract that holds at any corpus size.
    Ranking is one window partitioned by query_id over candidate rows.

    Determinism: folds are left-to-right; cell assignment tie-breaks on
    lowest centroid id via ``array_min(struct(-cos, cid))`` (negation is
    an exact sign flip); neighbor rank tie-breaks on neighbor_id — every
    branch replayed by the oracle's ROW_NUMBER.
    """
    vecs = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    mod, rem = _CENT_RULE
    cents = (
        vecs.where(F.col("vec_id") % mod == rem)
        .orderBy("vec_id")
        .collect()
    )  # bounded: N/29 coarse centroids at fixture scale; a config table at 100 TB
    carr = F.array(
        *[
            F.struct(
                F.lit(int(r.vec_id)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in r.v]).alias("cv"),
            )
            for r in cents
        ]
    )
    scored_cells = F.transform(
        carr,
        lambda c: F.struct(
            (-_fold_cosine(F.col("v"), c["cv"])).alias("neg"), c["cid"].alias("cid")
        ),
    )
    base = vecs.select(
        "vec_id",
        "v",
        F.array_min(scored_cells)["cid"].alias("cell"),
        F.slice(F.array_sort(scored_cells), 1, nprobe).alias("probes"),
    )
    cand = base.select(
        "vec_id", "v", F.explode(F.col("probes")["cid"]).alias("probe_cell")
    )
    members = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("cell").alias("probe_cell"),
    )
    pairs = cand.join(members, "probe_cell").where(
        F.col("vec_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        F.col("vec_id").alias("query_id"),
        "neighbor_id",
        _fold_cosine(F.col("v"), F.col("nv")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


_DCOS = (
    "list_reduce(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]), (x, y) -> x + y)"
    " / (sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"
    " * sqrt(list_reduce(list_transform({b}, x -> x * x), (x, y) -> x + y)))"
)


def _dcos(a: str, b: str) -> str:
    return _DCOS.format(a=a, b=b)


_KNN_GRAPH_ORACLE = f"""
    WITH vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, v AS cv FROM vecs
             WHERE vec_id % {_CENT_RULE[0]} = {_CENT_RULE[1]}),
    cell_scores AS (
      SELECT t.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY t.vec_id
                                ORDER BY {_dcos('t.v', 'c.cv')} DESC, c.cid) AS rn
      FROM vecs t CROSS JOIN cent c
    ),
    assign AS (SELECT vec_id, cid AS cell FROM cell_scores WHERE rn = 1),
    probe AS (SELECT vec_id, cid AS probe_cell FROM cell_scores
              WHERE rn <= {KNN_NPROBE}),
    scored AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             {_dcos('qv.v', 'nv.v')} AS cos_sim
      FROM probe p
      JOIN assign a ON a.cell = p.probe_cell AND a.vec_id <> p.vec_id
      JOIN vecs qv ON qv.vec_id = p.vec_id
      JOIN vecs nv ON nv.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {KNN_K}
"""


@register("x120_knn_graph", _KNN_GRAPH_ORACLE)
def x120_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] IVF-celled k-NN graph over the embeddings table: every
    vector's top-5 cosine neighbors among the vectors sharing its 2
    probed coarse cells — the neighbor-graph build that feeds SemDeDup
    (x54), graph dedup (x06/x88), label spread (x115) and hard-negative
    mining (x64) at corpus scale without an N² pair space."""
    return knn_graph(t(spark, sf_dir, "embeddings"))

"""Corpus indexing / release-audit band (x92-x119): boilerplate coverage,
inverted index, Arrow-UDTF chunking, mergeable reservoir, BM25, length
drift, quantile normalization, l-diversity, vocab coverage, t-closeness,
winsorized mean.

Split out of ``operators/text_analysis.py`` (round 5, VERDICT r4 #8 —
module size only; zero behavior change). Shared tokenization helpers stay
in ``text_analysis``; conventions are documented in ``queries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.functions import ordered_concat_ws
from smfg_datawarehouse_spark.queries import davg, dsum, register, t
from smfg_datawarehouse_spark.operators.text_analysis import (
    fingerprint,
    quality_features,
    word_tokens,
)

# ---------------------------------------------------------------------------
# Corpus-level boilerplate n-gram coverage — the C4/CCNet boilerplate
# signal (Raffel et al. 1910.10683 §2.2 removed spans repeated across the
# corpus; CCNet 1911.00359 drops paragraph-level duplicates the same way):
# a token k-gram occurring in many DISTINCT documents is template/menu/
# footer material, and a document largely made of such grams carries
# little novel signal. Distinct from x32 (repetition WITHIN a doc), x90
# (exact self-repeat spans), and x53 (chunk-level cross-doc dedup): this
# measures how much of each doc is corpus-wide boilerplate.
# ---------------------------------------------------------------------------

BOILER_K = 3  # token k-gram width
BOILER_DF_FRAC = 0.01  # gram is boilerplate when df >= max(2, ceil(frac·n_docs))


def boilerplate_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = BOILER_K,
    df_frac: float = BOILER_DF_FRAC,
) -> DataFrame:
    """Per-document fraction of token k-gram windows whose gram occurs in
    ≥ max(2, ceil(df_frac·n_docs)) DISTINCT documents. The threshold is
    proportional to corpus size — the definition that survives a 1000×
    scale-up (an absolute df would silently reclassify everything).

    Shape: positional windows explode token-linearly; gram df is one
    hash-keyed groupBy (distinct doc counting); the boilerplate set joins
    back to windows on the gram key (keyed shuffle — the set is
    corpus-dependent, so no broadcast assumption); rollup is doc-keyed.
    The n_docs total is a one-row broadcast. No Python UDFs."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.repartition(n_parts)
        .select(
            F.col(id_col).alias("doc_id"),
            word_tokens(F.col(text_col)).alias("tk"),
        )
        .where(F.size("tk") >= k)
    )
    windows = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (k - 1)),
                lambda p: F.array_join(F.slice(F.col("tk"), p, k), "\x1f"),
            )
        ).alias("s"),
    )
    n_docs = toks.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = windows.groupBy("s").agg(
        F.count_distinct("doc_id").alias("gram_df")
    )
    boiler = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .where(
            F.col("gram_df")
            >= F.greatest(
                F.lit(2), F.ceil(F.lit(df_frac) * F.col("n_docs"))
            )
        )
        .select("s")
    )
    return (
        windows.join(boiler.withColumn("is_boiler", F.lit(1)), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.coalesce(F.sum("is_boiler"), F.lit(0))
            .cast("long")
            .alias("n_boiler_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_boiler_windows",
            (
                F.col("n_boiler_windows").cast("double")
                / F.col("n_windows").cast("double")
            ).alias("boiler_frac"),
        )
    )


_BOILER_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         w -> w <> '') AS tk
      FROM documents
    ),
    eligible AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= {BOILER_K}),
    windows AS (
      SELECT doc_id,
             list_aggregate(list_slice(tk, pos, pos + {BOILER_K - 1}),
                            'string_agg', chr(31)) AS s
      FROM (SELECT doc_id, tk,
                   unnest(range(1, len(tk) - {BOILER_K - 2})) AS pos
            FROM eligible)
    ),
    nd AS (SELECT COUNT(*) AS n_docs FROM eligible),
    boiler AS (
      SELECT s FROM windows CROSS JOIN nd
      GROUP BY s, n_docs
      HAVING COUNT(DISTINCT doc_id)
             >= GREATEST(2, CAST(CEIL({BOILER_DF_FRAC} * n_docs) AS BIGINT))
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler_windows,
           CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS boiler_frac
    FROM windows w LEFT JOIN (SELECT DISTINCT s FROM boiler) b USING (s)
    GROUP BY w.doc_id
"""


@register("x92_boilerplate_coverage", _BOILER_ORACLE)
def x92_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Corpus-boilerplate coverage per document — C4 §2.2 / CCNet's
    cross-document repeated-span removal as a measurable per-doc signal:
    the fraction of a doc's token 3-gram windows whose gram appears in
    ≥ max(2, ceil(1% of docs)) distinct documents. Proportional df
    threshold (scale-invariant), distinct-doc counting (a doc spamming a
    gram doesn't promote it), exact left-join coverage. Reference has no
    text pipeline; LLM-pipeline extension per BASELINE.json."""
    d = t(spark, sf_dir, "documents")
    return boilerplate_coverage(d)


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = 5,
    postings_cap: int = 20,
    top_terms: int = 100,
) -> DataFrame:
    """Inverted index head: per term, document frequency, total term
    frequency, and the first ``postings_cap`` postings ("doc_id:tf",
    ascending doc_id) — the IR structure a retrieval/dedup pipeline
    builds over a corpus, with the honest head-truncation a 100 TB
    postings list needs (cap documented in the column name; full
    postings shard by term in production, they are never one row).

    Scale shape: explode → (term, doc) map-side-combined count → ONE
    term-keyed shuffle that feeds BOTH the window pass (df / total_tf /
    per-term rank) and the ordered-concat rollup (same key, Catalyst
    reuses the partitioning). Top-terms selection is
    TakeOrderedAndProject, not a global sort."""
    toks = docs.select(
        "doc_id", F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    td = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    w = W.partitionBy("term")
    ranked = td.select(
        "term",
        "doc_id",
        "tf",
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w).cast("long").alias("df"),
        F.sum("tf").over(w).cast("long").alias("total_tf"),
    )
    return (
        ranked.where(F.col("rn") <= postings_cap)
        .groupBy("term", "df", "total_tf")
        .agg(
            ordered_concat_ws(
                ",",
                F.col("doc_id"),
                F.concat_ws(":", F.col("doc_id"), F.col("tf")),
            ).alias("postings_head")
        )
        .where(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), "term")
        .limit(top_terms)
    )


@register(
    "x93_inverted_index",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS term
      FROM documents
    ), td AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY term, doc_id
    ), ranked AS (
      SELECT term, doc_id, tf,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
             CAST(SUM(tf) OVER (PARTITION BY term) AS BIGINT) AS total_tf
      FROM td
    )
    SELECT term, df, total_tf,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
             AS postings_head
    FROM ranked
    WHERE rn <= 20 AND df >= 5
    GROUP BY term, df, total_tf
    ORDER BY df DESC, term
    LIMIT 100
    """,
)
def x93_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] INVERTED-INDEX HEAD over the documents corpus: top-100 terms
    by document frequency with exact df / total tf and the first 20
    "doc_id:tf" postings per term — see :func:`build_inverted_index`.
    The ordered postings string uses the A1 ordered GROUP_CONCAT
    (reference parity: Group_concat with intra-group ORDER BY,
    reference/source_code/.../transformation_utility) applied to the IR
    posting-list shape retrieval and near-dup tooling consume."""
    return build_inverted_index(t(spark, sf_dir, "documents"))


def token_chunking_udtf(chunk_tokens: int = 32):
    """PyArrow-native UDTF (Spark 4.1 ``arrow_udtf``) that explodes each
    document into fixed-size token-window chunks — the context-window
    chunking step every LLM training / RAG ingestion pipeline runs over
    the corpus. One output row per chunk: (doc_id, chunk_idx,
    chunk_text, n_tokens), last chunk ragged.

    Vectorization contract (the repo's no-row-at-a-time rule applied to
    the UDTF surface): tokenization is an Arrow ``split_pattern_regex``
    kernel; chunk boundaries are O(#chunks) integer "offset surgery" in
    numpy (arange/repeat, no python loop over rows); chunk strings are
    rebuilt with the ``binary_join`` list kernel — string BYTES are
    never touched per-row in Python. This is the fourth Arrow escape
    hatch after pandas_udf / mapInPandas / applyInPandas(WithState)
    (SURVEY §2.11): a TABLE function, so the explode happens inside the
    UDTF without a separate explode() stage."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udtf

    K = int(chunk_tokens)

    @arrow_udtf(
        returnType=(
            "doc_id bigint, chunk_idx bigint, chunk_text string, "
            "n_tokens bigint"
        )
    )
    class TokenChunks:
        def eval(self, batch):
            import pyarrow.compute as pc

            texts = batch.column("text")
            doc_ids = np.asarray(batch.column("doc_id"))
            splits = pc.split_pattern_regex(texts, r"\s+")
            flat = pc.list_flatten(splits)
            parents = np.asarray(pc.list_parent_indices(splits))
            mask = np.asarray(pc.not_equal(flat, ""))
            toks = flat.filter(pa.array(mask))
            par = parents[mask]
            n_docs = len(texts)
            n_tok = np.bincount(par, minlength=n_docs)  # tokens per doc
            n_chunks = -(-n_tok // K)  # ceil; 0 for empty docs
            total = int(n_chunks.sum())
            if total == 0:
                yield pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "chunk_idx": pa.array([], pa.int64()),
                        "chunk_text": pa.array([], pa.string()),
                        "n_tokens": pa.array([], pa.int64()),
                    }
                )
                return
            starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
            within = np.arange(total) - np.repeat(starts, n_chunks)  # 0-based
            doc_tok = np.repeat(n_tok, n_chunks)
            doc_off = np.repeat(
                np.concatenate(([0], np.cumsum(n_tok)[:-1])), n_chunks
            )
            ends = doc_off + np.minimum((within + 1) * K, doc_tok)
            offsets = np.concatenate(([0], ends)).astype(np.int32)
            chunk_lists = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), toks
            )
            yield pa.table(
                {
                    "doc_id": pa.array(
                        np.repeat(doc_ids, n_chunks), pa.int64()
                    ),
                    "chunk_idx": pa.array(within, pa.int64()),
                    "chunk_text": pc.binary_join(chunk_lists, " "),
                    "n_tokens": pa.array(np.diff(offsets), pa.int64()),
                }
            )

    return TokenChunks


@register(
    "x96_token_chunking_udtf",
    r"""
    WITH raw AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')
               AS arr
      FROM documents
    ), c AS (
      SELECT doc_id, arr,
             unnest(generate_series(
               1, CAST(ceil(array_length(arr) / 32.0) AS BIGINT))) AS i
      FROM raw
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS chunk_idx,
           array_to_string(
             list_slice(arr, (i - 1) * 32 + 1,
                        LEAST(i * 32, array_length(arr))), ' ')
             AS chunk_text,
           CAST(LEAST(i * 32, array_length(arr)) - (i - 1) * 32 AS BIGINT)
             AS n_tokens
    FROM c
    """,
)
def x96_token_chunking_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.11] CONTEXT-WINDOW CHUNKING as a PyArrow-native TABLE
    function: every document exploded into 32-token chunks (ragged
    tail) through :func:`token_chunking_udtf` — certified against a
    DuckDB list-slice replay of the same windows. See the builder for
    the vectorization contract; at 100 TB this runs embarrassingly
    parallel (no shuffle at all — the UDTF consumes scan partitions
    and multiplies rows in place)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return token_chunking_udtf(32)(docs.asTable())


@register(
    "x97_mergeable_reservoir_sample",
    """
    WITH hashed AS (
      SELECT doc_id, source,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, h,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
               AS rn_src,
             ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rn_all
      FROM hashed
    )
    SELECT 'per_source:' || source AS stratum, doc_id,
           CAST(rn_src AS BIGINT) AS pick_rank
    FROM ranked WHERE rn_src <= 5
    UNION ALL
    SELECT 'global', doc_id, CAST(rn_all AS BIGINT)
    FROM ranked WHERE rn_all <= 20
    """,
)
def x97_mergeable_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] MERGEABLE UNIFORM RESERVOIR via k-smallest-hash (the
    bottom-k / KMV construction): a uniform k-sample of the corpus is
    exactly the k documents with the smallest md5(doc_id) — and unlike
    classic reservoir sampling, bottom-k is a MERGEABLE aggregate
    (union two partitions' bottom-k sets, keep the k smallest), so the
    sample of a 100 TB corpus composes from per-partition partial
    top-k's with no sequential scan and no RNG state; adding data later
    only ever replaces high-hash members (stable under append). Same
    seedless md5-uniform idiom as x84/x67 (partition/retry-invariant,
    oracle-replayable). Emits a global bottom-20 and a per-source
    bottom-5 (stratified eyeball sample), each with its pick rank.

    Scale shape: the per-source sample is one window over a
    source-keyed shuffle; the global bottom-20 is TakeOrderedAndProject
    (per-partition partial top-k, exactly the mergeability being
    demonstrated — no global sort)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    per_src = (
        d.select(
            "doc_id",
            "source",
            "h",
            F.row_number()
            .over(W.partitionBy("source").orderBy("h", "doc_id"))
            .alias("rn"),
        )
        .where(F.col("rn") <= 5)
        .select(
            F.concat(F.lit("per_source:"), F.col("source")).alias("stratum"),
            "doc_id",
            F.col("rn").cast("long").alias("pick_rank"),
        )
    )
    glob = (
        d.orderBy("h", "doc_id")
        .limit(20)
        .select(
            F.lit("global").alias("stratum"),
            "doc_id",
            F.row_number()
            .over(W.orderBy("h", "doc_id"))
            .cast("long")
            .alias("pick_rank"),
        )
    )
    return per_src.unionByName(glob)


@register(
    "x98_bm25_rational_topk",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS term
      FROM documents
    ), doclen AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM doclen
    ), tf AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'shuffle', 'window')
      GROUP BY term, doc_id
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT t.doc_id,
             CAST(SUM(CAST(floor(
               ((n.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                                * n.n_docs / CAST(n.total_len AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000.0 AS score
      FROM tf t, df d, doclen l, n
      WHERE d.term = t.term AND l.doc_id = t.doc_id
      GROUP BY t.doc_id
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def x98_bm25_rational_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] BM25-SHAPED KEYWORD RETRIEVAL, log-free: top-10 documents for
    the query {spark, shuffle, window} under Robertson/Okapi term
    weighting (k1=1.2, b=0.75) with the RATIONAL idf
    (N − df + 0.5)/(df + 0.5) instead of its logarithm — monotone in the
    same direction, and the whole score stays inside +,·,/ so it
    reproduces bit-exactly cross-engine (the repo's no-log/exp oracle
    discipline, x87 precedent; libm log differs in the last ulp between
    engines and a ranking must not hinge on it). Per-term contributions
    are fixed to integer NANO-units before the per-doc SUM — float
    addition is order-sensitive and Spark's partial-agg fold order is
    not DuckDB's, so multi-term docs would drift in the last ulp (q85's
    integer-unit convention, at 1e-9 resolution).

    Scale shape: term postings for the QUERY TERMS ONLY (3 terms — the
    filter lands before the groupBy, so the shuffle carries query-term
    postings, not the corpus vocabulary); df (3 rows) and the N/avgdl
    scalars broadcast; per-doc score is one map-combined rollup and the
    top-10 is TakeOrderedAndProject. doc-length normalization uses
    dl·N/total_len ≡ dl/avgdl with one fewer division."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    doclen = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    n = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    qterms = ["spark", "shuffle", "window"]
    tf = (
        toks.where(F.col("term").isin(qterms))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            (
                F.sum(
                    F.floor(
                        ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                        * (F.col("tf") * 2.2)
                        / (
                            F.col("tf")
                            + 1.2
                            * (
                                0.25
                                + 0.75
                                * F.col("dl")
                                * F.col("n_docs")
                                / F.col("total_len").cast("double")
                            )
                        )
                        * 1000000000.0
                        + 0.5
                    ).cast("long")
                ).cast("double")
                / 1000000000.0
            ).alias("score")
        )
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(10)
    return top.select(
        "doc_id",
        "score",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), "doc_id"))
        .cast("long")
        .alias("rank"),
    )


_X102_ORACLE = """
    WITH obs AS (
      SELECT source, LEAST(n_chars // 100, 9) AS bucket, COUNT(*) AS ob
      FROM documents GROUP BY 1, 2
    ), g AS (
      SELECT source, bucket, ob,
             SUM(ob) OVER (PARTITION BY bucket) AS cb,
             SUM(ob) OVER (PARTITION BY source) AS ns,
             SUM(ob) OVER () AS n,
             DENSE_RANK() OVER (ORDER BY bucket) AS dr
      FROM obs
    ), g2 AS (
      SELECT *, MAX(dr) OVER () AS nb FROM g
    )
    SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
           CAST(MAX(nb) - 1 AS BIGINT) AS dof,
           CAST(SUM(CAST(CAST(ob AS DOUBLE) * CAST(ob AS DOUBLE)
                         / (CAST(cb * ns AS DOUBLE) / CAST(n AS DOUBLE))
                         AS DECIMAL(30,6))) AS DOUBLE)
             - CAST(MAX(ns) AS DOUBLE) AS chi2
    FROM g2 GROUP BY source
"""


@register("x102_length_drift_chi2", _X102_ORACLE)
def x102_length_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Distribution-drift detection, the Pearson chi-square form: each
    source's document-length histogram (100-char bands, capped at 10) is
    tested against the corpus-wide distribution — chi2 = SUM (O-E)^2/E
    over bands, with E the corpus share scaled to the source size. The
    monitoring gate a training-data pipeline runs per incoming batch
    (here: per source) to catch a crawler or upstream schema change
    shifting the data before it poisons a mixture; unlike KL/PSI it
    needs no log, so the statistic stays bit-portable (single-op double
    arithmetic + the repo's exact-decimal summation convention).

    Shape: ONE table scan. The algebraic identity
    chi2 = SUM_b O_b^2/E_b - n_s (since SUM O = SUM E = n_s, and empty
    cells contribute 0 to the first term) removes the need to grid-
    complete zero cells, so everything after the (source x band)
    count — marginals, band cardinality — is window arithmetic over the
    grid itself (≤ sources·10 rows; the two unpartitioned windows are
    grid-sized, never data-sized). dof = bands - 1."""
    d = t(spark, sf_dir, "documents")
    obs = (
        d.select("source", F.expr("LEAST(n_chars DIV 100, 9)").alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("ob"))
    )
    wall = W.partitionBy()
    g = obs.select(
        "source",
        "ob",
        F.sum("ob").over(W.partitionBy("bucket")).alias("cb"),
        F.sum("ob").over(W.partitionBy("source")).alias("ns"),
        F.sum("ob").over(wall).alias("n"),
        F.dense_rank().over(W.orderBy("bucket")).alias("dr"),
    ).withColumn("nb", F.max("dr").over(wall))
    e = (F.col("cb") * F.col("ns")).cast("double") / F.col("n").cast("double")
    term = F.col("ob").cast("double") * F.col("ob").cast("double") / e
    return g.groupBy("source").agg(
        F.max("ns").cast("long").alias("n_docs"),
        (F.max("nb") - 1).cast("long").alias("dof"),
        (
            F.sum(term.cast("decimal(30,6)")).cast("double")
            - F.max("ns").cast("double")
        ).alias("chi2"),
    )


_X103_ORACLE = """
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) - 1 AS r,
             COUNT(*) OVER (PARTITION BY lang) AS nl
      FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM documents),
    ords AS (
      SELECT n_chars AS v,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS rn0
      FROM documents
    ), tgt AS (
      SELECT doc_id, lang, n_chars,
             CAST(FLOOR((CASE WHEN nl = 1 THEN 0.0
                              ELSE CAST(r AS DOUBLE) / (nl - 1) END)
                        * (n - 1)) AS BIGINT) AS ti
      FROM ranked CROSS JOIN tot
    )
    SELECT t.doc_id, t.lang, t.n_chars, o.v AS qnorm_chars
    FROM tgt t JOIN ords o ON o.rn0 = t.ti
"""


@register("x103_quantile_normalization", _X103_ORACLE)
def x103_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Quantile normalization across groups (the Bolstad et al. 2003
    microarray recipe, reused for cross-source feature alignment): each
    document's length is replaced by the CORPUS length at the same
    quantile position within its language — after the map, every
    language has an identical length distribution, removing per-group
    scale artifacts before mixture weighting. Rank fractions are exact
    integer ratios; the target is the exact corpus order statistic at
    floor(q*(N-1)) (no interpolation), so the whole map is bit-stable.

    Scale shape — the interesting part is the GLOBAL ordinal: a naive
    ROW_NUMBER over the corpus is a one-partition sort. Here ordinals
    are two-phase: rows get a 100-char band, per-band counts roll up to
    band OFFSETS (a band-cardinality-sized cumulative window), and each
    row's global ordinal is offset(band) + its row_number WITHIN the
    band — every heavy window stays partitioned (by lang or by band);
    the only single-partition work is the ~10-row offset cumsum. The
    final ordinal join is an equi-join on ti = rn0. The oracle computes
    the same ordinals with a plain global ROW_NUMBER — two routes, one
    result, which is exactly the property worth certifying."""
    d = t(spark, sf_dir, "documents")
    wl = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.row_number().over(wl) - 1).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("nl"),
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    # distributed global ordinals: band offsets + within-band row_number
    from smfg_datawarehouse_spark.functions.ordering import global_ordinals

    ords = global_ordinals(
        d.select("doc_id", "n_chars"),
        ["n_chars", "doc_id"],
        F.expr("n_chars DIV 100"),
    ).select(F.col("n_chars").alias("v"), "rn0")
    rfrac = F.when(F.col("nl") == 1, F.lit(0.0)).otherwise(
        F.col("r").cast("double") / (F.col("nl") - 1)
    )
    tgt = ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "lang",
        "n_chars",
        F.floor(rfrac * (F.col("n") - 1)).cast("long").alias("ti"),
    )
    return tgt.join(ords, tgt.ti == ords.rn0).select(
        "doc_id", "lang", "n_chars", F.col("v").alias("qnorm_chars")
    )


_X104_ORACLE = r"""
    WITH cells AS (
      SELECT lang, source,
             LEAST(length(text) // 100, 9) AS len_bucket,
             COUNT(*) AS cell_size,
             COUNT(DISTINCT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                        w -> w <> '')[1]) AS l_div
      FROM documents
      GROUP BY 1, 2, 3
    )
    SELECT lang, source, CAST(len_bucket AS BIGINT) AS len_bucket,
           CAST(cell_size AS BIGINT) AS cell_size,
           CAST(l_div AS BIGINT) AS l_div,
           (l_div < 3) AS below_l
    FROM cells
"""


@register("x104_l_diversity_risk", _X104_ORACLE)
def x104_l_diversity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] L-DIVERSITY audit (Machanavajjhala et al. 2007) — the
    stronger companion to x79's k-anonymity: a quasi-identifier cell can
    be large (k-anonymous) yet still leak if every member shares the
    same SENSITIVE value, so each (lang, source, 100-char-band) cell is
    scored by the number of DISTINCT sensitive values it contains (the
    document's leading token stands in for the sensitive attribute on
    this fixture) and flagged when below l=3. Character length bands per
    the repo's byte-vs-char discipline. One map-side-combined groupBy
    onto the QI frame; the distinct count is per-cell state bounded by
    the sensitive-value cardinality — corpus-linear, output tiny."""
    d = t(spark, sf_dir, "documents")
    len_bucket = F.least(
        F.floor(F.length("text") / 100).cast("long"), F.lit(9).cast("long")
    )
    first_tok = word_tokens(F.col("text")).getItem(0)
    return (
        d.groupBy("lang", "source", len_bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cell_size"),
            F.countDistinct(first_tok).cast("long").alias("l_div"),
        )
        .withColumn("below_l", F.col("l_div") < 3)
    )


_X110_ORACLE = r"""
    WITH tk AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS ts
      FROM documents
    ), tok AS (
      SELECT ts[i] AS w FROM tk, unnest(range(1, len(ts) + 1)) AS u(i)
    ), freq AS (
      SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ), ranked AS (
      SELECT w, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rank,
             SUM(c) OVER (ORDER BY c DESC, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER () AS tot
      FROM freq
    )
    SELECT CAST(rank AS BIGINT) AS vocab_size, w AS boundary_word,
           CAST(cum AS BIGINT) AS tokens_covered,
           CAST(cum AS DOUBLE) / tot AS coverage,
           (CAST(cum AS DOUBLE) / tot >= 0.95) AS covers_95pct
    FROM ranked
    WHERE rank % 5 = 0 OR rank = 1
       OR (CAST(cum AS DOUBLE) / tot >= 0.95
           AND CAST(cum - c AS DOUBLE) / tot < 0.95)
"""


@register("x110_vocab_coverage_curve", _X110_ORACLE)
def x110_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] VOCABULARY COVERAGE CURVE — the tokenizer-sizing decision
    artifact: token types ranked by frequency, cumulative corpus coverage
    at each rank (exact integer cumsums / one final ratio), sampled every
    5 ranks plus the exact CROSSING RANK where coverage first reaches 95%
    (the row whose cumulative share crosses while its predecessor's was
    below — the vocab size a 95%-coverage tokenizer needs; everything
    rarer falls to <unk>/byte-fallback). Pairs with x78's fertility and
    x35's OOV rate: this one answers "how big must the vocab BE".
    The rank window is vocab-sized (never corpus-sized); the token count
    is one map-combined shuffle. Exact-integer coverage ratios keep the
    crossing detection bit-stable in both engines."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(word_tokens(F.col("text"))).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    wr = W.orderBy(F.desc("c"), "w")
    ranked = freq.select(
        "w",
        "c",
        F.row_number().over(wr).alias("rank"),
        F.sum("c").over(wr.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(W.partitionBy()).alias("tot"),
    )
    cov = F.col("cum").cast("double") / F.col("tot")
    prev_cov = (F.col("cum") - F.col("c")).cast("double") / F.col("tot")
    return ranked.where(
        (F.col("rank") % 5 == 0)
        | (F.col("rank") == 1)
        | ((cov >= 0.95) & (prev_cov < 0.95))
    ).select(
        F.col("rank").cast("long").alias("vocab_size"),
        F.col("w").alias("boundary_word"),
        F.col("cum").cast("long").alias("tokens_covered"),
        cov.alias("coverage"),
        (cov >= 0.95).alias("covers_95pct"),
    )


_X113_ORACLE = """
    WITH cell AS (
      SELECT lang, LEAST(length(text) // 100, 9) AS len_bucket, source,
             CAST(COUNT(*) AS BIGINT) AS c_gs
      FROM documents GROUP BY 1, 2, 3
    ),
    grp AS (
      SELECT lang, len_bucket, SUM(c_gs) AS n_g FROM cell GROUP BY 1, 2
    ),
    srcs AS (SELECT source, SUM(c_gs) AS c_s FROM cell GROUP BY 1),
    tot AS (SELECT SUM(c_gs) AS n FROM cell),
    grid AS (
      SELECT g.lang, g.len_bucket, g.n_g, s.c_s, t.n,
             COALESCE(x.c_gs, 0) AS c_gs
      FROM grp g CROSS JOIN srcs s CROSS JOIN tot t
      LEFT JOIN cell x ON x.lang = g.lang AND x.len_bucket = g.len_bucket
                      AND x.source = s.source
    )
    SELECT lang, CAST(len_bucket AS BIGINT) AS len_bucket,
           CAST(MAX(n_g) AS BIGINT) AS cell_size,
           CAST(SUM(ABS(CAST(c_gs AS HUGEINT) * n - CAST(c_s AS HUGEINT) * n_g))
                AS DOUBLE)
             / (2.0 * MAX(n_g) * MAX(n)) AS tvd,
           CAST(CASE WHEN 5 * SUM(ABS(CAST(c_gs AS HUGEINT) * n
                                      - CAST(c_s AS HUGEINT) * n_g))
                          > 3 * CAST(MAX(n_g) AS HUGEINT) * MAX(n)
                     THEN 1 ELSE 0 END AS BIGINT) AS breach
    FROM grid GROUP BY lang, len_bucket
"""


@register("x113_t_closeness", _X113_ORACLE)
def x113_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] T-CLOSENESS audit (Li/Li/Venkatasubramanian 2007) — the
    third rung of the privacy-release ladder after x79's k-anonymity and
    x104's l-diversity: a cell can be large AND diverse yet still leak
    if its sensitive-value DISTRIBUTION diverges from the corpus-wide
    one (an attacker who knows the QI learns the skew). Each
    quasi-identifier cell (lang × 100-char band, x104's QI frame) is
    scored by total variation distance between its ``source`` mix and
    the global mix — the categorical-attribute instance of t-closeness'
    EMD — and flagged when t > 0.3. The numerator stays in exact integer
    cross-products — computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
    so c_gs·N never wraps int64 even past ~3e9 documents — with ONE
    double division at the end, and the breach flag compares exact
    integers (5·num > 3·n_g·N ⟺ tvd > 0.3), so the whole audit replays
    bit-exactly. Shape: one corpus scan to cell counts, then a
    cells × sources grid of AGGREGATED rows (both tiny — never
    row-shaped); at 100 TB this is a broadcast-grid rollup."""
    d = t(spark, sf_dir, "documents")
    len_bucket = F.least(
        F.floor(F.length("text") / 100).cast("long"), F.lit(9).cast("long")
    )
    cell = d.groupBy("lang", len_bucket.alias("len_bucket"), "source").agg(
        F.count(F.lit(1)).cast("long").alias("c_gs")
    )
    grp = cell.groupBy("lang", "len_bucket").agg(F.sum("c_gs").alias("n_g"))
    srcs = cell.groupBy("source").agg(F.sum("c_gs").alias("c_s"))
    tot = cell.agg(F.sum("c_gs").alias("n"))
    grid = (
        grp.crossJoin(F.broadcast(srcs))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["lang", "len_bucket", "source"], "left")
        .withColumn("c_gs", F.coalesce(F.col("c_gs"), F.lit(0)))
    )
    dec = "decimal(18,0)"  # product => decimal(37,0): int64-overflow-proof
    dev = F.abs(
        F.col("c_gs").cast(dec) * F.col("n").cast(dec)
        - F.col("c_s").cast(dec) * F.col("n_g").cast(dec)
    )
    return grid.groupBy("lang", "len_bucket").agg(
        F.max("n_g").cast("long").alias("cell_size"),
        (
            F.sum(dev).cast("double")
            / (F.lit(2.0) * F.max("n_g") * F.max("n"))
        ).alias("tvd"),
        F.when(
            F.sum(dev) * 5
            > F.max("n_g").cast(dec) * F.max("n").cast(dec) * 3,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("breach"),
    )


_X119_ORACLE = """
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    thresholds AS (
      SELECT source,
             MAX(n) AS n,
             MAX(CASE WHEN rnk = (n + 9) // 10 THEN n_chars END) AS p10,
             MAX(CASE WHEN rnk = (9 * n + 9) // 10 THEN n_chars END) AS p90,
             SUM(n_chars) AS raw_total
      FROM ranked GROUP BY source
    ),
    clamped AS (
      SELECT r.source, t.n, t.p10, t.p90, t.raw_total,
             LEAST(GREATEST(r.n_chars, t.p10), t.p90) AS w
      FROM ranked r JOIN thresholds t ON r.source = t.source
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(p10) AS BIGINT) AS p10_chars,
           CAST(MAX(p90) AS BIGINT) AS p90_chars,
           CAST(MAX(raw_total) AS DOUBLE) / MAX(n) AS raw_mean,
           CAST(SUM(w) AS DOUBLE) / MAX(n) AS winsor_mean
    FROM clamped GROUP BY source
"""


@register("x119_winsorized_mean", _X119_ORACLE)
def x119_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/A] WINSORIZED ROBUST MEAN per source (10/90): each source's
    document-length distribution is clamped at its own exact 10th/90th
    order statistics (nearest-rank, ceil(p·n) = (p·n+9) DIV 10 in pure
    integer arithmetic, doc_id tie-break) before averaging — the robust
    location estimate a corpus monitor tracks instead of the raw mean,
    which one crawler bug (a single 10 MB page) can drag arbitrarily.
    Winsorizing ≠ trimming: tail rows are KEPT at the threshold value,
    so the estimate stays a mean over n (comparable across sources with
    different tail masses). Everything is exact BIGINT until the two
    final divisions: thresholds are selected values (not interpolated),
    clamped totals are integer sums — bit-replayable. Shape: ONE
    source-keyed shuffle feeds the rank window, the threshold rollup,
    the clamp join (source-level thresholds broadcast), and the final
    rollup — the corpus crosses the wire once, same single-exchange
    discipline as x44."""
    d = t(spark, sf_dir, "documents")
    ws = W.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(ws.orderBy("n_chars", "doc_id")).alias("rnk"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    thresholds = ranked.groupBy("source").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rnk") == F.expr("(n + 9) DIV 10"), F.col("n_chars"))
        ).alias("p10"),
        F.max(
            F.when(F.col("rnk") == F.expr("(9 * n + 9) DIV 10"), F.col("n_chars"))
        ).alias("p90"),
        F.sum("n_chars").alias("raw_total"),
    )
    clamped = ranked.select("source", "n_chars").join(
        F.broadcast(thresholds), "source"
    )
    w = F.least(F.greatest(F.col("n_chars"), F.col("p10")), F.col("p90"))
    return clamped.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.max("p10").cast("long").alias("p10_chars"),
        F.max("p90").cast("long").alias("p90_chars"),
        (F.max("raw_total").cast("double") / F.max("n")).alias("raw_mean"),
        (F.sum(w).cast("double") / F.max("n")).alias("winsor_mean"),
    )


# ---------------------------------------------------------------------------
# x127: boolean retrieval — the query-processing counterpart of the x93
# inverted index and x98 scorer: conjunctive (AND) postings intersection,
# NOT-term exclusion via anti join, then rational-BM25 ranking of the
# survivors. The three-stage shape (cheap boolean candidate pruning →
# scoring only survivors) is how a search engine keeps scoring cost
# proportional to the result set, not the corpus.
# ---------------------------------------------------------------------------

X127_MUST = ("join", "scan")
X127_MUST_NOT = "merge"

_X127_MUST_SQL = ", ".join(f"'{t_}'" for t_ in X127_MUST)

_X127_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS term
      FROM documents
    ), doclen AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM doclen
    ), tf AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ({_X127_MUST_SQL})
      GROUP BY term, doc_id
    ), conj AS (
      SELECT doc_id FROM tf GROUP BY doc_id
      HAVING COUNT(DISTINCT term) = {len(X127_MUST)}
    ), excl AS (
      SELECT DISTINCT doc_id FROM toks WHERE term = '{X127_MUST_NOT}'
    ), hits AS (
      SELECT c.doc_id FROM conj c
      WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.doc_id = c.doc_id)
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT t.doc_id,
             CAST(SUM(CAST(floor(
               ((n.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                                * n.n_docs / CAST(n.total_len AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000.0 AS score
      FROM tf t
      JOIN hits h ON h.doc_id = t.doc_id
      JOIN df d ON d.term = t.term
      JOIN doclen l ON l.doc_id = t.doc_id
      CROSS JOIN n
      GROUP BY t.doc_id
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
"""


@register("x127_boolean_retrieval", _X127_ORACLE)
def x127_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] BOOLEAN RETRIEVAL over the corpus: documents containing ALL of
    {join, scan} and NONE of {merge}, ranked by the x98 rational BM25
    (nano-unit-fixed per-term contributions, no log/exp) and cut to the
    top 10. Conjunction = postings-count HAVING over query-term postings
    only; exclusion = one anti join on the NOT-term's postings; scoring
    touches only surviving docs. Scale shape: every shuffle carries
    query-term postings (3 terms), never the vocabulary; df and the
    corpus scalars broadcast; top-10 is TakeOrderedAndProject."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(word_tokens(F.col("text"))).alias("term")
    )
    doclen = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    n = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    tf = (
        toks.where(F.col("term").isin(*X127_MUST))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    conj = (
        tf.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(X127_MUST))
        .select("doc_id")
    )
    excl = toks.where(F.col("term") == X127_MUST_NOT).select("doc_id").distinct()
    hits = conj.join(excl, "doc_id", "left_anti")
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    contrib = F.floor(
        ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + 1.2
            * (
                0.25
                + 0.75
                * F.col("dl")
                * F.col("n_docs")
                / F.col("total_len").cast("double")
            )
        )
        * 1000000000.0
        + 0.5
    ).cast("long")
    scored = (
        tf.join(hits, "doc_id")
        .join(F.broadcast(df_), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg((F.sum(contrib).cast("double") / 1000000000.0).alias("score"))
    )
    w = W.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


_X128_ORACLE = r"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  w -> w <> '')) AS BIGINT) AS n_tok
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS start_off
      FROM tok
    )
    SELECT doc_id, n_tok, start_off,
           CAST(start_off // 2048 AS BIGINT) AS first_chunk,
           CAST((start_off + n_tok - 1) // 2048 AS BIGINT) AS last_chunk,
           CAST((start_off + n_tok - 1) // 2048
                - start_off // 2048 + 1 AS BIGINT) AS n_windows_spanned
    FROM cum
    WHERE n_tok > 0
"""


@register("x128_sequence_packing", _X128_ORACLE)
def x128_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] SEQUENCE PACKING PLAN — concatenate-and-chunk (GPT-style)
    pretraining layout: documents are laid end-to-end in deterministic
    ``doc_id`` order and cut into fixed 2048-token context windows; the
    plan reports, per document, its global token offset, the first/last
    window it lands in, and how many windows it spans (the
    boundary-crossing docs are exactly the ones whose loss a trainer
    masks across the seam). This is the layout step x96's chunking UDTF
    feeds at scale — x96 cuts WITHIN documents, this packs ACROSS them.

    Scale shape: the only global state is a running token count, built
    WITHOUT a single-partition window — per-band totals (``doc_id DIV
    64`` bands, monotone in the order) make band offsets via a
    bands-sized window, then a within-band running sum; parallelism
    |bands|, per-task state one band (the ``functions/ordering.py``
    band-offset recipe applied to sums instead of ranks). All offsets
    are exact BIGINTs — bit-identical to the oracle's monolithic
    window."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
        )
        .cast("long")
        .alias("n_tok"),
        F.expr("doc_id DIV 64").alias("band"),
    )
    offsets = (
        tok.groupBy("band")
        .agg(F.sum("n_tok").alias("bc"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("bc").over(
                    W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("band", "off")
    )
    wb = W.partitionBy("band").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    B = 2048
    packed = (
        tok.join(F.broadcast(offsets), "band")
        .withColumn(
            "start_off",
            (F.col("off") + F.coalesce(F.sum("n_tok").over(wb), F.lit(0)))
            .cast("long"),
        )
        .where(F.col("n_tok") > 0)
    )
    first = F.expr(f"start_off DIV {B}").cast("long")
    last = F.expr(f"(start_off + n_tok - 1) DIV {B}").cast("long")
    return packed.select(
        "doc_id",
        "n_tok",
        "start_off",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + F.lit(1)).cast("long").alias("n_windows_spanned"),
    )


_X130_ORACLE = """
    WITH src AS (
      SELECT source,
             CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS s_ord
      FROM (SELECT DISTINCT source FROM documents)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src FROM src),
    ranked AS (
      SELECT d.doc_id, d.source,
             CAST(ROW_NUMBER() OVER (PARTITION BY d.source
                     ORDER BY d.n_chars DESC, d.doc_id) - 1 AS BIGINT)
               AS rank_in_source
      FROM documents d
    )
    SELECT r.doc_id, r.source, r.rank_in_source,
           CAST(r.rank_in_source * n.n_src + s.s_ord AS BIGINT) AS train_pos
    FROM ranked r JOIN src s ON s.source = r.source CROSS JOIN n
"""


@register("x130_curriculum_interleave_order", _X130_ORACLE)
def x130_curriculum_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] CURRICULUM + SOURCE-INTERLEAVED TRAINING ORDER — the
    deterministic data-ordering plan a pretraining run consumes:
    within each source, documents ranked easiest-proxy-first (longest
    ``n_chars`` first here; any per-doc score column drops in), then
    sources INTERLEAVED round-robin so no contiguous run of training
    steps sees a single domain — ``train_pos = rank_in_source × |src| +
    source_ordinal`` is injective and needs no global sort at all. The
    deterministic complement of x67's sampled mixture and x80's epoch
    budget: those decide HOW MUCH of each source, this decides WHERE
    each doc lands in the stream.

    Scale shape: one source-keyed window (|sources|-way parallel, the
    same key the corpus is usually already partitioned by on disk), a
    |sources|-row broadcast for ordinals, zero corpus-wide ordering —
    the train_pos arithmetic IS the interleave. All positions exact
    BIGINTs."""
    d = t(spark, sf_dir, "documents")
    src = (
        d.select("source")
        .distinct()
        .withColumn(
            "s_ord",
            (F.row_number().over(W.orderBy("source")) - 1).cast("long"),
        )
    )
    counts = src.agg(F.count(F.lit(1)).cast("long").alias("n_src"))
    wr = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rank_in_source", (F.row_number().over(wr) - 1).cast("long"))
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(counts))
        .select(
            "doc_id",
            "source",
            "rank_in_source",
            (F.col("rank_in_source") * F.col("n_src") + F.col("s_ord"))
            .cast("long")
            .alias("train_pos"),
        )
    )


_X131_ORACLE = r"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  w -> w <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    arrival AS (
      SELECT n_tok,
             CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 32 AS BIGINT)
               AS batch
      FROM tok
    ),
    sorted_ AS (
      SELECT n_tok,
             CAST((ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1) // 32
                  AS BIGINT) AS batch
      FROM tok
    ),
    pa AS (
      SELECT 'arrival' AS strategy, batch,
             COUNT(*) AS n, MAX(n_tok) AS mx, SUM(n_tok) AS s
      FROM arrival GROUP BY batch
    ),
    pb AS (
      SELECT 'length_sorted' AS strategy, batch,
             COUNT(*) AS n, MAX(n_tok) AS mx, SUM(n_tok) AS s
      FROM sorted_ GROUP BY batch
    ),
    u AS (SELECT * FROM pa UNION ALL SELECT * FROM pb)
    SELECT strategy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(s) AS BIGINT) AS real_tokens,
           CAST(SUM(n * mx) AS BIGINT) AS padded_tokens,
           CAST(SUM(n * mx) - SUM(s) AS DOUBLE) / SUM(n * mx) AS waste_frac
    FROM u GROUP BY strategy
"""


@register("x131_padding_waste_report", _X131_ORACLE)
def x131_padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] PADDING-WASTE REPORT — the length-bucketed-batching decision
    artifact: fixed batches of 32 docs padded to the batch max token
    length, compared between ARRIVAL order and LENGTH-SORTED order
    (dynamic batching's upper bound). The waste fraction gap is exactly
    the step-time a trainer buys by length-bucketing its sampler; on
    ragged web corpora arrival-order padding routinely wastes >50%.

    Scale shape: both orderings use band-partitioned global ordinals
    (``functions/ordering.global_ordinals`` — band offsets + within-band
    ranks, no single-partition sort; the length-sorted band is the token
    count itself, monotone by construction), then a batch-keyed agg and
    a 2-row rollup. Token counts and padded sizes are exact BIGINTs;
    the only float is one final division."""
    from smfg_datawarehouse_spark.functions.ordering import global_ordinals

    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != ""))
        .cast("long")
        .alias("n_tok"),
    )
    tok = tok.localCheckpoint()  # two orderings reference the same frame

    def _batched(df: DataFrame, order_cols: list[str], band, tag: str) -> DataFrame:
        ords = global_ordinals(df, order_cols, band, out_col="rn0")
        per_batch = (
            ords.withColumn("batch", F.expr("rn0 DIV 32").cast("long"))
            .groupBy("batch")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.max("n_tok").alias("mx"),
                F.sum("n_tok").alias("s"),
            )
        )
        return per_batch.select(F.lit(tag).alias("strategy"), "batch", "n", "mx", "s")

    u = _batched(
        tok, ["doc_id"], F.expr("doc_id DIV 64"), "arrival"
    ).unionByName(
        _batched(
            tok, ["n_tok", "doc_id"], F.expr("n_tok DIV 16"), "length_sorted"
        )
    )
    padded = F.sum(F.col("n") * F.col("mx")).cast("long")
    real = F.sum("s").cast("long")
    return u.groupBy("strategy").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        real.alias("real_tokens"),
        padded.alias("padded_tokens"),
        (
            (padded - real).cast("double") / padded.cast("double")
        ).alias("waste_frac"),
    )


# x139: doc-as-query sparse retrieval — tf-idf cosine top-k through the
# inverted index. x93 certifies the postings structure and x98 a fixed
# bag-of-words BM25 query; this is the third retrieval leg: the QUERY is
# itself a document's sparse vector (more-like-this / related-articles),
# so the kernel is a sparse x sparse cosine driven entirely by term-keyed
# joins — no dense embeddings, no pair enumeration beyond shared terms.

_X139_NQ = 8      # query docs: doc_id < 8
_X139_TOPK = 10

_X139_ORACLE = rf"""
    WITH tk0 AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), tk AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tk0, UNNEST(t) AS u(tok) GROUP BY doc_id, tok
    ), dfq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tk GROUP BY tok
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents
    ), w AS (
      SELECT doc_id, tok,
             CAST(tf AS DOUBLE) * (CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))
               AS w
      FROM tk JOIN dfq USING (tok) CROSS JOIN n
    ), norms AS (
      SELECT doc_id,
             list_reduce(list(w * w ORDER BY tok), (a, b) -> a + b) AS n2
      FROM w GROUP BY doc_id
    ), q AS (
      SELECT doc_id AS qid, tok, w AS qw FROM w WHERE doc_id < {_X139_NQ}
    ), pairs AS (
      SELECT q.qid, w.doc_id,
             list_reduce(list(q.qw * w.w ORDER BY w.tok),
                         (a, b) -> a + b) AS dot
      FROM w JOIN q ON q.tok = w.tok AND w.doc_id <> q.qid
      GROUP BY q.qid, w.doc_id
    ), scored AS (
      SELECT p.qid AS query_doc, p.doc_id,
             p.dot / (sqrt(qs.n2) * sqrt(ds.n2)) AS cos_sim
      FROM pairs p
      JOIN norms qs ON qs.doc_id = p.qid
      JOIN norms ds ON ds.doc_id = p.doc_id
    )
    SELECT query_doc, doc_id, cos_sim, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT query_doc, doc_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_doc
                                ORDER BY cos_sim DESC, doc_id) AS rnk
      FROM scored
    ) WHERE rnk <= {_X139_TOPK}
"""


@register("x139_tfidf_cosine_retrieval", _X139_ORACLE)
def x139_tfidf_cosine_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] SPARSE TF-IDF COSINE RETRIEVAL (more-like-this): for each of
    the 8 fixed query documents, the top-10 most similar corpus docs
    by tf-idf cosine, computed ENTIRELY through the inverted index — a
    sparse x sparse similarity where only docs SHARING a term with the
    query are ever touched (the vector-space twin of x98's BM25 and the
    lexical twin of x63's dense contamination scan). Weights are the
    rational tf·(N/df) (log-free, per the repo's transcendental-free
    determinism convention); dot products and norms fold in TERM ORDER
    (left fold == the oracle's list_reduce), so every double is
    bit-identical at any parallelism.

    Scale shape: postings and weights come from ONE map-combined
    (doc, term) agg; the query side is 8 docs' sparse vectors
    broadcast; the candidate join keys on term and touches only
    posting rows for terms the queries contain (df-bounded — the
    classic impact-ordered retrieval cost, NOT corpus x corpus); norms
    are a doc-keyed rollup computed once. At 100 TB this is the
    text-retrieval serving path: term-keyed shuffles proportional to
    query-term postings, never pairwise."""
    from smfg_datawarehouse_spark.functions import word_tokens

    n_parts = spark.sparkContext.defaultParallelism
    d = t(spark, sf_dir, "documents").repartition(n_parts)
    tk = (
        d.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    # df is attached via a tok-partitioned window over the postings (the
    # x56 recipe): the vocabulary grows with the corpus (typos, URLs,
    # numbers), so a broadcast of the per-token df table is a driver/
    # executor-memory blowup at 100 TB — the window rides the SAME
    # tok-keyed shuffle the postings already need, no second pass, no
    # broadcast of corpus-derived state.
    # Explicit tok-keyed exchange ahead of the df window (r9): AQE's
    # byte-based coalescing collapses the few-MB postings shuffle to ONE
    # task, serializing the window + every downstream stage that reads
    # the checkpointed frame (measured 2.3-4.3 s single-task tail). An
    # explicit repartition(n, tok) pins CPU-dense parallelism locally
    # and IS the exchange the window needs (same key, same N — no
    # second shuffle, guide §2.4); at scale the byte-sized AQE answer
    # and this one converge.
    w = (
        tk.repartition(n_parts, "tok")
        .withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("tok")).cast("long")
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf").cast("double")
                * (F.col("nd").cast("double") / F.col("df").cast("double"))
            ).alias("w"),
        )
        .localCheckpoint(eager=False)  # 3 consumers: norms, q, pairs
    )
    norms = w.groupBy("doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tok", "w"))),
                lambda s: s["w"] * s["w"],
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ).alias("n2")
    )
    q = w.where(F.col("doc_id") < _X139_NQ).select(
        F.col("doc_id").alias("qid"),
        F.col("tok").alias("qtok"),
        F.col("w").alias("qw"),
    )
    pairs = (
        w.join(F.broadcast(q), (F.col("tok") == F.col("qtok")))
        .where(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("tok", (F.col("qw") * F.col("w")).alias("c"))
                        )
                    ),
                    lambda s: s["c"],
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ).alias("dot")
        )
    )
    scored = (
        pairs.join(
            norms.select(F.col("doc_id").alias("qid"), F.col("n2").alias("qn2")),
            "qid",
        )
        .join(norms, "doc_id")
        .select(
            F.col("qid").alias("query_doc"),
            "doc_id",
            (F.col("dot") / (F.sqrt("qn2") * F.sqrt("n2"))).alias("cos_sim"),
        )
    )
    wr = W.partitionBy("query_doc").orderBy(F.col("cos_sim").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= _X139_TOPK)
    )


# ---------------------------------------------------------------------------
# x150: positional phrase retrieval — exact multi-word phrase matching
# through a POSITIONAL inverted index (term -> (doc, position) postings),
# the serving path behind every "quoted phrase" search box and the
# n-gram-level contamination probe single-term postings (x93/x127)
# cannot answer: the terms must be ADJACENT, in order.
# ---------------------------------------------------------------------------

_X150_PHRASES = ("scan query", "batch window", "slow hash batch")
_X150_TOPK = 10


def _x150_oracle() -> str:
    branches = []
    for ph in _X150_PHRASES:
        k = len(ph.split(" "))
        gram = " || ' ' || ".join(f"tk[i+{j}]" for j in range(k))
        branches.append(f"""
    SELECT '{ph}' AS phrase, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM (
      SELECT doc_id, unnest(list_transform(
               range(1, GREATEST(len(tk) - {k - 2}, 1)),
               i -> {gram})) AS g
      FROM toks WHERE len(tk) >= {k}
    ) WHERE g = '{ph}'
    GROUP BY doc_id""")
    body = "\n    UNION ALL\n".join(branches)
    return rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS tk
      FROM documents
    ),
    hits AS (
    {body}
    )
    SELECT phrase, doc_id, n_hits, CAST(rn AS BIGINT) AS rank FROM (
      SELECT phrase, doc_id, n_hits,
             ROW_NUMBER() OVER (PARTITION BY phrase
                                ORDER BY n_hits DESC, doc_id) AS rn
      FROM hits
    ) WHERE rn <= {_X150_TOPK}
"""


@register("x150_phrase_retrieval_positional", _x150_oracle())
def x150_phrase_retrieval_positional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[X] POSITIONAL PHRASE RETRIEVAL: top-10 docs per quoted phrase by
    exact in-order adjacent occurrence count, served through a
    positional postings join — postings are FILTERED to the query
    phrases' terms before anything shuffles (x127's query-term-scoping
    discipline), then each phrase is one (doc, position)-keyed chain
    join (term_i at pos p ⋈ term_{i+1} at pos p+1), which is how a real
    positional index answers phrases without ever touching
    non-query-term postings. The oracle replays it as an n-gram count —
    same result, so parity certifies the join logic.

    Scale shape: the postings build is one scan + explode filtered
    scan-side to |phrase terms| tokens (df-bounded, like BM25's
    term-scoped postings); adjacency joins key on (doc_id, pos) — the
    classic impact-ordered phrase cost Σ df(term_i), never corpus².
    Counts are exact BIGINTs; ranking ties break on doc_id."""
    from smfg_datawarehouse_spark.functions import term_scoped_postings

    all_terms = sorted({w for ph in _X150_PHRASES for w in ph.split(" ")})
    postings = term_scoped_postings(
        t(spark, sf_dir, "documents"), all_terms
    )  # consumed once per phrase term
    out = None
    for ph in _X150_PHRASES:
        terms = ph.split(" ")
        cur = postings.where(F.col("tok") == terms[0]).select(
            "doc_id", F.col("pos").alias("p0")
        )
        for j, term in enumerate(terms[1:], start=1):
            nxt = postings.where(F.col("tok") == term).select(
                F.col("doc_id").alias("d_j"), F.col("pos").alias("p_j")
            )
            cur = cur.join(
                nxt,
                (F.col("doc_id") == F.col("d_j"))
                & (F.col("p_j") == F.col("p0") + F.lit(j)),
            ).select("doc_id", "p0")
        hits = cur.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_hits")
        ).select(F.lit(ph).alias("phrase"), "doc_id", "n_hits")
        out = hits if out is None else out.unionByName(hits)
    wr = W.partitionBy("phrase").orderBy(F.col("n_hits").desc(), "doc_id")
    return (
        out.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= _X150_TOPK)
    )


# ---------------------------------------------------------------------------
# x162: proximity retrieval (NEAR/k) — the third rung of the positional
# ladder: x127's boolean AND needs terms anywhere in the doc, x150's
# phrase join needs them ADJACENT in order; NEAR/k needs them within a
# bounded window in either order — how "guarantee NEAR/5 default"
# searches legal/financial corpora where word order varies but
# co-occurrence distance carries the meaning.
# ---------------------------------------------------------------------------

_X162_QUERIES = (("scan", "batch", 5), ("slow", "hash", 3))
_X162_TOPK = 10


def _x162_oracle() -> str:
    branches = []
    for ta, tb, w in _X162_QUERIES:
        branches.append(f"""
    SELECT '{ta} NEAR/{w} {tb}' AS query, a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM pos a JOIN pos b
      ON b.doc_id = a.doc_id AND a.tok = '{ta}' AND b.tok = '{tb}'
     AND ABS(a.p - b.p) <= {w} AND a.p <> b.p
    GROUP BY a.doc_id""")
    body = "\n    UNION ALL\n".join(branches)
    return rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS tk
      FROM documents
    ),
    pos AS (
      SELECT doc_id, tk[CAST(j AS INTEGER)] AS tok, CAST(j AS BIGINT) AS p
      FROM toks, UNNEST(range(1, len(tk) + 1)) AS r(j)
    ),
    hits AS (
    {body}
    )
    SELECT query, doc_id, n_hits, CAST(rn AS BIGINT) AS rank FROM (
      SELECT query, doc_id, n_hits,
             ROW_NUMBER() OVER (PARTITION BY query
                                ORDER BY n_hits DESC, doc_id) AS rn
      FROM hits
    ) WHERE rn <= {_X162_TOPK}
"""


@register("x162_proximity_retrieval", _x162_oracle())
def x162_proximity_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] PROXIMITY RETRIEVAL (NEAR/k): top-10 docs per query by the
    number of (pos_a, pos_b) occurrence pairs of the two terms within k
    tokens of each other, either order — the bounded-window operator
    between x127's boolean AND (no position constraint) and x150's
    phrase chain (distance exactly 1, ordered). Served through the same
    query-term-scoped positional postings: postings are FILTERED to the
    queries' terms scan-side, the distance predicate rides a doc-keyed
    equi-join (cost Σ df(t_a)·df(t_b) per doc, never corpus²), counts
    are exact BIGINTs, ties break on doc_id.

    Scale shape: identical to x150's — one scan + posexplode filtered
    to |query terms| tokens, then per-query doc-keyed joins on the
    df-bounded postings. The window predicate is a residual on the
    equi-join, not a join explosion."""
    from smfg_datawarehouse_spark.functions import term_scoped_postings

    all_terms = sorted({w for ta, tb, _ in _X162_QUERIES for w in (ta, tb)})
    postings = term_scoped_postings(
        t(spark, sf_dir, "documents"), all_terms
    )  # consumed once per query side
    out = None
    for ta, tb, w in _X162_QUERIES:
        a = postings.where(F.col("tok") == ta).select(
            "doc_id", F.col("pos").alias("pa")
        )
        b = postings.where(F.col("tok") == tb).select(
            F.col("doc_id").alias("d_b"), F.col("pos").alias("pb")
        )
        hits = (
            a.join(
                b,
                (F.col("doc_id") == F.col("d_b"))
                & (F.abs(F.col("pa") - F.col("pb")) <= w)
                & (F.col("pa") != F.col("pb")),
            )
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(
                F.lit(f"{ta} NEAR/{w} {tb}").alias("query"),
                "doc_id",
                "n_hits",
            )
        )
        out = hits if out is None else out.unionByName(hits)
    wr = W.partitionBy("query").orderBy(F.col("n_hits").desc(), "doc_id")
    return (
        out.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= _X162_TOPK)
    )

"""Text-analysis operators [X]: token stats, quality scoring, language ID,
document fingerprinting. All Catalyst expressions (no UDFs) so they run
inside whole-stage codegen and scale linearly with a single pass over the
corpus — the shape a 100 TB document pipeline needs.

Determinism: every emitted double is either a ratio of exact integers or a
fixed-shape arithmetic expression over such ratios — bit-identical across
engines, no rounding needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.functions import ordered_concat_ws, word_tokens
from smfg_datawarehouse_spark.queries import davg, register, t

_STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    return F.size(word_tokens(text)).cast("long")


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized content fingerprint (md5 of canonical form)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


WINNOW_K = 20  # char-gram width
WINNOW_W = 8  # winnowing window (guarantee: any match ≥ w+k-1 chars is caught)


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    Rolling char k-grams are hashed (md5 32-bit prefix — portable); each
    length-w window of consecutive gram hashes keeps its minimum,
    rightmost-position tie-break. Hash and tie-break are packed into ONE
    BIGINT — ``hash32 · 10^7 + (9999999 − pos)`` — so a plain window
    ``min`` over longs is exact, engine-identical, and far cheaper than the
    equivalent 15-char string min (docs are < 10M chars by the 7-digit
    tie-break field, same bound the reference string encoding had).

    Plan shape: explode bare gram *positions* (an int sequence — never a
    materialized per-doc array of gram strings), compute hash+pack inline
    in the same codegen stage, and project ``text`` away BEFORE the per-doc
    window's shuffle. Gram count ``ng`` is derived from ``length(text)``
    up front rather than a second unbounded window pass. One linear explode
    + one doc_id shuffle, no quadratic stage.
    """
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    txt = F.lower(F.col(text_col))
    ng = (F.length(txt) - (k - 1)).alias("ng")
    # CASE-guarded: sequence(1, ng) would generate a DESCENDING range for
    # ng < 1; the null branch explodes to zero rows for short docs
    positions = F.when(F.length(txt) >= k, F.sequence(F.lit(1), F.length(txt) - (k - 1)))
    h32 = F.conv(
        F.substring(F.md5(F.col("_txt").substr(F.col("pos"), F.lit(k))), 1, 8), 16, 10
    ).cast("bigint")
    g = (
        docs.repartition(n_parts)
        .select(
            F.col(id_col).alias("doc_id"),
            txt.alias("_txt"),
            ng,
            F.explode(positions).alias("pos"),
        )
        .select(
            "doc_id",
            "ng",
            "pos",
            (h32 * F.lit(10_000_000) + (F.lit(9_999_999) - F.col("pos"))).alias("enc"),
        )
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = g.select(
        "doc_id",
        "pos",
        "ng",
        F.min("enc").over(win).alias("menc"),
    ).where(F.col("pos") <= F.col("ng") - (w - 1))
    return sel.select("doc_id", F.expr("menc DIV 10000000").alias("fp_hash")).distinct()


def winnowing_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 3,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    MOSS-style overlap detection. Join key is the fingerprint hash (one
    shuffle); pair aggregation counts distinct shared fingerprints."""
    # cached: the pair join consumes the fingerprint set twice; without it
    # each side replays the explode + per-doc window selection
    fps = winnowing_fingerprints(docs, text_col, id_col, k, w).cache()
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/char statistics + a composite quality score.

    Score = 0.4·alpha_ratio + 0.3·stopword_ratio + 0.3·min(len,500)/500 —
    a stand-in for fastText-style quality classifiers, kept expression-only.
    """
    text = F.col(text_col)
    tokens = word_tokens(text)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    n_tokens = F.size(tokens)
    stop_hits = F.size(
        F.filter(tokens, lambda w: w.isin(_STOPWORDS_EN))
    )
    alpha_ratio = alpha_chars.cast("double") / n_chars
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(0.0)
    len_norm = F.least(n_chars, F.lit(500)).cast("double") / F.lit(500.0)
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn(
            "quality_score",
            F.lit(0.4) * alpha_ratio + F.lit(0.3) * stop_ratio + F.lit(0.3) * len_norm,
        )
    )


_LANG_SETS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "es"],
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-heuristic language ID.

    Counts token hits against per-language stopword sets; argmax wins,
    'und' (undetermined) when all zero. Deterministic tie-break by fixed
    language order en > fr > de > es.
    """
    tokens = word_tokens(F.col(text_col))

    def hits(words: list[str]):
        # closure factory: a 2-arg lambda would be treated as the
        # (element, index) form by F.filter
        return F.size(F.filter(tokens, lambda w: w.isin(words)))

    hit_cols = {lang: hits(words).alias(f"hits_{lang}") for lang, words in _LANG_SETS.items()}
    out = df
    for lang, col in hit_cols.items():
        out = out.withColumn(f"hits_{lang}", col)
    h = {lang: F.col(f"hits_{lang}") for lang in _LANG_SETS}
    best = (
        F.when(
            (h["en"] >= h["fr"]) & (h["en"] >= h["de"]) & (h["en"] >= h["es"]) & (h["en"] > 0),
            "en",
        )
        .when((h["fr"] >= h["de"]) & (h["fr"] >= h["es"]) & (h["fr"] > 0), "fr")
        .when((h["de"] >= h["es"]) & (h["de"] > 0), "de")
        .when(h["es"] > 0, "es")
        .otherwise("und")
    )
    return out.withColumn("pred_lang", best)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@register(
    "x20_token_stats",
    r"""
    SELECT doc_id,
           CAST(length(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   w -> w <> '')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def x20_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Token counting + canonical-form fingerprint per document."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        fingerprint(F.col("text")).alias("fingerprint"),
    )


@register(
    "x21_quality_scores",
    r"""
    WITH feats AS (
      SELECT doc_id,
             CAST(length(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     w -> w <> '')) AS BIGINT) AS n_tokens,
             CAST(length(list_filter(regexp_split_to_array(lower(text), '\s+'),
                  w -> w IN ('the','a','of','and','to','in','is','it'))) AS BIGINT)
               AS stop_hits,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
               / length(text) AS alpha_ratio,
             CAST(LEAST(length(text), 500) AS DOUBLE) / 500.0 AS len_norm,
             length(text) AS n_chars_raw
      FROM documents
    )
    SELECT doc_id, n_tokens, alpha_ratio,
           CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens
                ELSE 0.0 END AS stopword_ratio,
           0.4 * alpha_ratio
             + 0.3 * (CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens
                           ELSE 0.0 END)
             + 0.3 * len_norm AS quality_score
    FROM feats
    """,
)
def x21_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Composite quality scoring over the documents corpus."""
    d = t(spark, sf_dir, "documents")
    return quality_features(d).select(
        "doc_id", "n_tokens", "alpha_ratio", "stopword_ratio", "quality_score"
    )


@register(
    "x22_lang_id",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS tk
      FROM documents
    ), hits AS (
      SELECT doc_id,
             CAST(length(list_filter(tk, w -> w IN ('the','and','of','to','is'))) AS BIGINT) AS hits_en,
             CAST(length(list_filter(tk, w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS hits_fr,
             CAST(length(list_filter(tk, w -> w IN ('der','die','und','das','ist'))) AS BIGINT) AS hits_de,
             CAST(length(list_filter(tk, w -> w IN ('el','la','los','que','es'))) AS BIGINT) AS hits_es
      FROM toks
    )
    SELECT doc_id, hits_en, hits_fr, hits_de, hits_es,
           CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es
                     AND hits_en > 0 THEN 'en'
                WHEN hits_fr >= hits_de AND hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
                WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
                WHEN hits_es > 0 THEN 'es'
                ELSE 'und' END AS pred_lang
    FROM hits
    """,
)
def x22_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Stopword-heuristic language identification."""
    d = t(spark, sf_dir, "documents")
    return lang_id(d).select(
        "doc_id", "hits_en", "hits_fr", "hits_de", "hits_es", "pred_lang"
    )


_WINNOW_ORACLE = f"""
    WITH g AS (
      SELECT doc_id, length(text) - {WINNOW_K - 1} AS ng, u.pos,
             ('0x' || substring(
                md5(substring(lower(text), u.pos, {WINNOW_K})), 1, 8))::BIGINT
               * 10000000 + (9999999 - u.pos) AS enc
      FROM documents,
           LATERAL unnest(generate_series(1, length(text) - {WINNOW_K} + 1)) AS u(pos)
    ),
    sel AS (
      SELECT doc_id, pos, ng,
             min(enc) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS menc
      FROM g
    ),
    fps AS (
      SELECT DISTINCT doc_id, menc // 10000000 AS fp_hash
      FROM sel WHERE pos <= ng - {WINNOW_W - 1}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM fps a JOIN fps b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 3
"""


@register("x23_winnowing_dupes", _WINNOW_ORACLE)
def x23_winnowing_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Rolling-hash winnowing fingerprint overlap (MOSS-style): doc
    pairs sharing ≥3 selected fingerprints (k=20-gram, window=8)."""
    d = t(spark, sf_dir, "documents")
    return winnowing_dup_pairs(d, "text", "doc_id", min_shared=3)


BPE_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """GPT-2-style pre-tokenization (letter runs | single digits |
    punctuation) via ``regexp_extract_all`` — the sub-word-ready token
    stream a BPE vocabulary trainer consumes. Stays in codegen; the regex
    uses only character classes so it means the same thing in RE2/Java/PCRE.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        # zero-token guard (whitespace-only doc): Spark's x/0 double
        # division is NULL but DuckDB's is Infinity — NULL in both
        F.when(
            F.size(toks) > 0, F.length(text_col).cast("double") / F.size(toks)
        ).alias("chars_per_token"),
    )


@register(
    "x24_bpe_token_stats",
    f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(length(list_distinct(regexp_extract_all(text, '{BPE_PATTERN}'))) AS BIGINT)
             AS n_distinct_tokens,
           CASE WHEN length(regexp_extract_all(text, '{BPE_PATTERN}')) > 0
                THEN CAST(length(text) AS DOUBLE)
                     / length(regexp_extract_all(text, '{BPE_PATTERN}'))
                END AS chars_per_token
    FROM documents
    """,
)
def x24_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] BPE-ish regex token counting per document (letters|digit|punct),
    the pre-tokenization pass of a BPE vocabulary pipeline."""
    return bpe_token_stats(t(spark, sf_dir, "documents"))


def keyword_scores(docs: DataFrame, text_col: str = "text", top_k: int = 3) -> DataFrame:
    """TF-IDF-style keyword extraction per document, transcendental-free:
    score = tf × N / df (term frequency × inverse document-frequency
    *ratio*). Rational arithmetic only — one double division — so scores
    are bit-identical across engines (log-based idf would differ in the
    last ulp between libm implementations). The document-frequency table is
    vocabulary-sized (sublinear in corpus) and broadcast; the per-doc top-k
    is a window over doc_id — two linear shuffles total.
    """
    n_docs = docs.count()  # deterministic scalar, computed once driver-side
    toks = docs.select(
        "doc_id", F.explode(word_tokens(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = F.broadcast(
        toks.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    score = (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        tf.join(df_, "tok")
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "tok", "score", "rank")
    )


_KEYWORD_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfx AS (
      SELECT tok, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, tok, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT t.doc_id, t.tok,
             CAST(t.tf * n.n AS DOUBLE) / d.df AS score,
             ROW_NUMBER() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf * n.n AS DOUBLE) / d.df DESC, t.tok) AS rank
      FROM tf t JOIN dfx d USING (tok), n
    ) WHERE rank <= 3
"""


@register("x25_keyword_extraction", _KEYWORD_ORACLE)
def x25_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Top-3 keywords per document by tf·(N/df) rarity weighting."""
    return keyword_scores(t(spark, sf_dir, "documents"), top_k=3)


VOCAB_STOPWORDS = sorted(set(w for ws in _LANG_SETS.values() for w in ws) | set(_STOPWORDS_EN))


def build_vocabulary(docs: DataFrame, text_col: str = "text", top_n: int = 50) -> DataFrame:
    """Corpus vocabulary: top-N tokens by total frequency, stopwords
    removed — the seed step of a tokenizer/vocab-training pipeline. One
    explode + one groupBy; the top-N is TakeOrderedAndProject (no full
    sort). Deterministic tie-break on the token itself."""
    toks = docs.select(F.explode(word_tokens(F.col(text_col))).alias("tok"))
    return (
        toks.where(~F.col("tok").isin(VOCAB_STOPWORDS))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(top_n)
    )


_VOCAB_STOP_SQL = ", ".join(f"'{w}'" for w in VOCAB_STOPWORDS)

_VOCAB_ORACLE = rf"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS tok
      FROM documents
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
    FROM toks
    WHERE tok NOT IN ({_VOCAB_STOP_SQL})
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 50
"""


@register("x26_vocabulary_top50", _VOCAB_ORACLE)
def x26_vocabulary_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Stopword-filtered corpus vocabulary (top-50 tokens by frequency)."""
    return build_vocabulary(t(spark, sf_dir, "documents"), top_n=50)


_CURATION_ORACLE = r"""
    WITH feats AS (
      SELECT doc_id, source, text,
             CAST(length(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     w -> w <> '')) AS BIGINT) AS n_tokens,
             CAST(length(list_filter(regexp_split_to_array(lower(text), '\s+'),
                  w -> w IN ('the','a','of','and','to','in','is','it'))) AS BIGINT)
               AS stop_hits,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
               / length(text) AS alpha_ratio,
             CAST(LEAST(length(text), 500) AS DOUBLE) / 500.0 AS len_norm,
             list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS tk
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source, text, n_tokens,
             0.4 * alpha_ratio
               + 0.3 * (CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens
                             ELSE 0.0 END)
               + 0.3 * len_norm AS quality_score,
             CAST(length(list_filter(tk, w -> w IN ('the','and','of','to','is'))) AS BIGINT) AS hits_en,
             CAST(length(list_filter(tk, w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS hits_fr,
             CAST(length(list_filter(tk, w -> w IN ('der','die','und','das','ist'))) AS BIGINT) AS hits_de,
             CAST(length(list_filter(tk, w -> w IN ('el','la','los','que','es'))) AS BIGINT) AS hits_es
      FROM feats
    ),
    kept AS (
      SELECT source, n_tokens, quality_score
      FROM scored
      WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
        AND quality_score >= 0.5
        AND (hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es
             AND hits_en > 0)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(floor(quality_score * 1000000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_quality
    FROM kept
    GROUP BY source
"""


@register("x40_corpus_curation", _CURATION_ORACLE)
def x40_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] The end-to-end training-data curation pipeline as ONE declarative
    plan: exact dedup (lowest-id survivor per content hash) → quality
    scoring → language ID → per-source corpus statistics.

    Every stage is column arithmetic over a single documents scan — the
    dedup window (one shuffle on the content hash) and the final
    per-source aggregation (one tiny shuffle) are the only data movement.
    No operator materializes an intermediate corpus: Catalyst fuses the
    scoring/lang-ID expressions into the scan, so at 100 TB this runs as
    two shuffle stages end-to-end. The composite proves the operator
    library composes: the same building blocks registered individually as
    x01/x21/x22."""
    from smfg_datawarehouse_spark.operators.dedup import exact_dedup

    d = t(spark, sf_dir, "documents")
    curated = lang_id(quality_features(exact_dedup(d, ["text"], "doc_id")))
    return (
        curated.where((F.col("quality_score") >= 0.5) & (F.col("pred_lang") == "en"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            # micro-unit average, not davg: a computed double can land
            # exactly on a DECIMAL(30,6) rounding tie, which Spark (HALF_UP)
            # and DuckDB resolve differently; floor(x*1e6 + 0.5) is one
            # identical IEEE chain in both engines
            (
                F.sum(
                    F.floor(F.col("quality_score") * 1e6 + 0.5).cast("long")
                ).cast("double")
                / 1e6
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )
    )


@register(
    "x27_bigrams_top50",
    r"""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS tk
      FROM documents
    ),
    bi AS (
      SELECT unnest([tk[i] || ' ' || tk[i + 1] for i in range(1, len(tk))])
               AS bigram
      FROM toks
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bi GROUP BY 1
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def x27_bigrams_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Corpus bigram frequencies, top-50 — the n-gram statistics pass
    LM tokenizer/vocab builders run over a corpus (unigram twin: x26).
    Bigrams generate inside the token array via a higher-order transform
    (no self-join, no second explode); count partials combine map-side
    and TakeOrderedAndProject caps the result — the shuffle carries
    |distinct bigrams| partial counts, never corpus rows. Tie-break on
    the bigram string keeps the cut deterministic."""
    d = t(spark, sf_dir, "documents")
    # materialize the token array ONCE per row: referencing the raw
    # tokenization expression inside the transform lambda would inline (and
    # re-evaluate) the regexp split per element — O(tokens²) per doc
    tk = F.col("_tk")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.slice(tk, 1, F.size(tk) - 1),
            lambda w, i: F.concat_ws(" ", w, F.element_at(tk, i + F.lit(2))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # repartition before the row-multiplying explode: the corpus arrives as
    # few scan splits, and without this the explode+count runs single-task
    n_parts = spark.sparkContext.defaultParallelism
    return (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@register(
    "x29_train_val_split",
    """
    WITH h AS (
      SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hh
      FROM documents
    )
    SELECT CASE WHEN hh < 'c' THEN 'train' ELSE 'val' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM h GROUP BY 1
    """,
)
def x29_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Deterministic hash-based train/validation split (~75/25): a doc
    lands in 'train' iff the md5 of its id is lexicographically below 'c'
    (12 of 16 leading hex values). Hash splits are THE reproducible way to
    partition a training corpus — stable under reruns, joins, and corpus
    growth (a doc's split never changes when others are added), and free:
    the split is a scan-side expression, no shuffle beyond the stats agg.
    Emits per-split corpus statistics for split-balance verification."""
    d = t(spark, sf_dir, "documents")
    split = F.when(
        F.md5(F.col("doc_id").cast("string")) < "c", "train"
    ).otherwise("val")
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


@register(
    "x32_repetition_stats",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), cnt AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tk, UNNEST(t) AS u(tok) GROUP BY doc_id, tok
    ), r AS (
      SELECT doc_id, tok, c,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
      FROM cnt
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS repetition_ratio,
           MAX(CASE WHEN rn = 1 THEN tok END) AS top_token,
           CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS top_token_count
    FROM r GROUP BY doc_id
    """,
)
def x32_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Within-document repetition profiling — the Gopher/C4-style
    quality rule that flags boilerplate and degenerate generations: token
    repetition ratio (1 - distinct/total) plus the dominant token and its
    count per document. One repartition by doc_id feeds the (doc, token)
    count, the per-doc ranking window, AND the final per-doc rollup — the
    explode never crosses the wire again (hash partitioning on doc_id
    satisfies every downstream clustering). The ratio divides two exact
    ints once in double: bit-stable at any parallelism."""
    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("doc_id").orderBy(F.col("c").desc(), "tok")
    return (
        d.repartition(F.col("doc_id"))
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("doc_id", F.explode("_tk").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            (
                F.lit(1.0)
                - F.count(F.lit(1)).cast("double")
                / F.sum("c").cast("double")
            ).alias("repetition_ratio"),
            F.max(F.when(F.col("rn") == 1, F.col("tok"))).alias("top_token"),
            F.max(F.when(F.col("rn") == 1, F.col("c")))
            .cast("long")
            .alias("top_token_count"),
        )
    )


@register(
    "x33_pii_masking",
    r"""
    SELECT event_type,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS masked_template,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
             AS n_redactions
    FROM events
    GROUP BY event_type, masked_template
    """,
)
def x33_pii_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] PII-style redaction + payload templating: numeric identifiers in
    the raw event payload are masked to a placeholder, and payloads are
    rolled up by (event_type, masked template) with how many identifier
    runs each template redacts — the redaction-audit shape of a training
    -data scrubbing pass (real deployments swap in email/phone/SSN
    patterns; the digit-run class keeps the oracle regex-dialect-safe).
    Masking is a scan-side codegen expression; the single shuffle carries
    |templates| partial counts, not events."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.regexp_replace(F.col("props"), "[0-9]+", "<NUM>").alias(
                "masked_template"
            ),
            F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)")).alias("_nr"),
        )
        .groupBy("event_type", "masked_template")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_nr").cast("long").alias("n_redactions"),
        )
    )


@register(
    "x34_cross_source_contamination",
    r"""
    WITH tk AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), g AS (
      SELECT DISTINCT source, gram
      FROM tk, UNNEST([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS u(gram)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
    FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
    GROUP BY source_a, source_b
    """,
)
def x34_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Train/test-set decontamination signal: for every pair of corpus
    sources, how many distinct word 3-gram shingles they share — the
    standard overlap check before a source is admitted to training data
    (high overlap with an eval source = contamination). NOT a self-join:
    shingles group once by gram (collect_set dedups sources per gram) and
    source pairs are generated inside the array, so the work is
    Σ|sources-per-gram|² — bounded by the source count, never |docs|² —
    and the big explode crosses the wire exactly once."""
    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    tk = F.col("_tk")
    grams = F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    srcs = F.col("srcs")
    pairs = F.flatten(
        F.transform(
            srcs,
            lambda a, i: F.transform(
                F.slice(srcs, i + F.lit(2), F.size(srcs)),
                lambda b: F.struct(a.alias("source_a"), b.alias("source_b")),
            ),
        )
    )
    return (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("source", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .where(F.size("srcs") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


@register(
    "x35_oov_rate",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), tok AS (
      SELECT doc_id, tokw FROM tk, UNNEST(t) AS u(tokw)
    ), vocab AS (
      SELECT tokw FROM tok GROUP BY tokw
      ORDER BY COUNT(*) DESC, tokw LIMIT 100
    )
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tokw IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.tokw IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM tok LEFT JOIN vocab v ON tok.tokw = v.tokw
    GROUP BY tok.doc_id
    """,
)
def x35_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Out-of-vocabulary rate per document against the corpus top-100
    vocabulary — the vocabulary-coverage quality filter (docs dominated by
    rare/garbage tokens score high and get dropped before training). Two
    passes over the tokenized corpus: the vocabulary aggregates to 100 rows
    and BROADCASTS, so the per-doc scoring join adds no shuffle — at 100 TB
    the only exchanges are the vocab count and the per-doc rollup. The
    boundary tie at rank 100 breaks on the token string: deterministic cut.
    OOV rate is a single int/int divide — bit-stable."""
    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    tok = (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("doc_id", F.explode("_tk").alias("tokw"))
    )
    # (doc, token) occurrence counts — CACHED (same reuse as x36/x37):
    # vocab ranking and per-doc scoring both derive from it, so
    # tokenize+explode runs once instead of twice
    cst = tok.groupBy("doc_id", "tokw").agg(F.count(F.lit(1)).alias("c")).cache()
    vocab = (
        cst.groupBy("tokw")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), "tokw")
        .limit(100)
        .select("tokw", F.lit(1).alias("iv"))
    )
    oov_c = F.when(F.col("iv").isNull(), F.col("c")).otherwise(F.lit(0))
    return (
        cst.join(F.broadcast(vocab), "tokw", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(oov_c).cast("long").alias("n_oov"),
            (F.sum(oov_c).cast("double") / F.sum("c")).alias("oov_rate"),
        )
    )


@register(
    "x36_source_divergence",
    r"""
    WITH tk AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), tok AS (
      SELECT source, tokw FROM tk, UNNEST(t) AS u(tokw)
    ), cst AS (
      SELECT source, tokw, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tok GROUP BY source, tokw
    ), ns AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst GROUP BY source
    ), ct AS (
      SELECT tokw, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst GROUP BY tokw
    ), tot AS (
      SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cst
    )
    SELECT cst.source,
           CAST(MAX(ns.n_s) AS BIGINT) AS n_tokens,
           1.0 + CAST(SUM(CAST(
                   abs(CAST(c_st AS DOUBLE) / ns.n_s
                       - CAST(c_t AS DOUBLE) / tot.n)
                   - CAST(c_t AS DOUBLE) / tot.n
                 AS DECIMAL(30,6))) AS DOUBLE) AS l1_divergence
    FROM cst JOIN ns USING (source) JOIN ct USING (tokw) CROSS JOIN tot
    GROUP BY cst.source
    """,
)
def x36_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Per-source unigram-distribution L1 divergence from the corpus
    distribution — the domain-mixing / distribution-shift signal used to
    set source sampling weights (and to flag drifted or junk sources)
    before training. Absent tokens are handled WITHOUT densifying the
    source x vocab cross product: sum_absent p_t telescopes to
    1 - sum_present p_t, so L1 = 1 + sum_present(|p_st - p_t| - p_t) and
    only observed (source, token) pairs are ever materialized. The big
    shuffle is the (source, token) count — CACHED, because all four
    downstream tables (per-source totals, per-token totals, corpus total,
    and the final join) derive from it: one tokenize+shuffle pass instead
    of four replays. Token totals (vocab-sized) and per-source totals
    broadcast back onto it. Each |.|-term is one fixed IEEE expression;
    the sum accumulates in exact decimal — bit-stable at any partition
    count."""
    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    tok = (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("source", F.explode("_tk").alias("tokw"))
    )
    cst = tok.groupBy("source", "tokw").agg(F.count(F.lit(1)).alias("c_st")).cache()
    ns = cst.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    ct = cst.groupBy("tokw").agg(F.sum("c_st").cast("long").alias("c_t"))
    tot = cst.agg(F.sum("c_st").cast("long").alias("n"))
    p_t = F.col("c_t").cast("double") / F.col("n")
    term = F.abs(F.col("c_st").cast("double") / F.col("n_s") - p_t) - p_t
    from smfg_datawarehouse_spark.queries import dsum

    return (
        cst.join(F.broadcast(ns), "source")
        .join(F.broadcast(ct), "tokw")
        .join(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            (F.lit(1.0) + dsum(term)).alias("l1_divergence"),
        )
    )


@register(
    "x37_mean_token_prob",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), tok AS (
      SELECT doc_id, tokw FROM tk, UNNEST(t) AS u(tokw)
    ), ct AS (
      SELECT tokw, CAST(COUNT(*) AS BIGINT) AS c_t FROM tok GROUP BY tokw
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
    )
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(floor(CAST(ct.c_t AS DOUBLE) / tot.n * 1e15 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1e15 / COUNT(*)
             AS mean_token_prob
    FROM tok JOIN ct USING (tokw) CROSS JOIN tot
    GROUP BY tok.doc_id
    """,
)
def x37_mean_token_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Per-document mean unigram probability under the corpus unigram
    LM — the transcendental-free stand-in for perplexity-based quality
    scoring (low mean probability = rare/garbage-token text; the same
    ranking as unigram perplexity without log(), which would not be
    bit-reproducible across engines). Two passes over the tokenized
    corpus: token counts aggregate vocab-sized and BROADCAST back onto the
    token stream (vocabulary << corpus at any scale), so the only big
    exchanges are the vocab count and the per-doc rollup. Each p(t) is one
    int/int divide quantized to integer femto-units (floor(p*1e15 + 0.5) —
    double→DECIMAL rounds ties differently across engines, exact BIGINT
    sums don't); the per-doc sum is exact integer, associative,
    partition-order-proof; the mean is two fixed-order divides."""
    d = t(spark, sf_dir, "documents")
    return doc_mean_token_prob(d)


def doc_mean_token_prob(d: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """Per-document mean unigram probability (x37's kernel), optionally
    carrying extra per-document columns (e.g. ``lang`` for x70's
    per-language bucketing) through the rollup as additional group keys —
    functionally dependent on doc_id, so the grouping is unchanged."""
    extras = extra_cols or []
    n_parts = d.sparkSession.sparkContext.defaultParallelism
    tok = (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("doc_id", *extras, F.explode("_tk").alias("tokw"))
    )
    # (doc, token) occurrence counts — CACHED (same reuse as x36): the
    # vocab table, the corpus total, and the per-doc rollup all derive
    # from it, so tokenize+explode runs once instead of three times.
    # Per-doc Σ p_units over occurrences == Σ c·p_units over (doc, token)
    # rows — exact integer either way.
    cst = (
        tok.groupBy("doc_id", *extras, "tokw").agg(F.count(F.lit(1)).alias("c")).cache()
    )
    ct = cst.groupBy("tokw").agg(F.sum("c").cast("long").alias("c_t"))
    tot = cst.agg(F.sum("c").cast("long").alias("n"))
    p_units = F.floor(
        F.col("c_t").cast("double") / F.col("n") * 1e15 + 0.5
    ).cast("long")
    return (
        cst.join(F.broadcast(ct), "tokw")
        .join(F.broadcast(tot))
        .groupBy("doc_id", *extras)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("c") * p_units).cast("double") / 1e15 / F.sum("c")
            ).alias("mean_token_prob"),
        )
    )


@register(
    "x38_length_deciles",
    r"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  w -> w <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), buckets AS (
      SELECT doc_id, n_tokens,
             CAST(ntile(10) OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
               AS decile
      FROM lens
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM buckets GROUP BY decile
    """,
)
def x38_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Token-length decile profile of the corpus — the
    length-distribution audit run before choosing packing/truncation
    lengths for training (which deciles carry the token mass, where the
    tail starts). NTILE(10) over (n_tokens, doc_id) — the doc_id
    tie-break makes bucket edges deterministic — but computed WITHOUT a
    single-partition global sort: ``functions.ordering.distributed_ntile``
    derives exact global ordinals from band-partitioned windows (band =
    n_tokens itself, trivially monotone; per-band offsets are a tiny
    broadcast) and the bucket id in closed-form BIGINT arithmetic. The
    DuckDB oracle keeps a plain NTILE — two routes, bit-identical
    partition rule. All outputs are integer aggregates — nothing to
    drift."""
    from smfg_datawarehouse_spark.functions.ordering import distributed_ntile

    d = t(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id", F.size(word_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    buckets = distributed_ntile(
        lens, 10, ["n_tokens", "doc_id"], F.col("n_tokens"), "decile"
    )
    return buckets.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


@register(
    "x39_temperature_weights",
    r"""
    WITH tk AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  w -> w <> '')) AS BIGINT) AS n
      FROM documents
    ), s AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS n_s,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM tk GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM s
    )
    SELECT source, n_docs, n_s, p_raw,
           CAST(u AS DOUBLE) / CAST(SUM(u) OVER () AS DOUBLE) AS p_alpha
    FROM (
      SELECT s.source, s.n_docs, s.n_s,
             CAST(s.n_s AS DOUBLE) / tot.n AS p_raw,
             CAST(floor(sqrt(CAST(s.n_s AS DOUBLE) / tot.n) * 1e12 + 0.5)
                  AS BIGINT) AS u
      FROM s CROSS JOIN tot
    )
    """,
)
def x39_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Temperature-scaled source sampling weights (alpha = 0.5):
    p_alpha(s) = p(s)^0.5 / sum_s p(s)^0.5 — the up-weighting of small
    sources used when mixing domains for training (alpha=1 keeps natural
    proportions, alpha->0 approaches uniform). Token mass per source is
    one rollup; the source table is tiny, so the normalizing SUM runs as
    an unpartitioned window over a handful of rows — the corpus is
    touched exactly once. sqrt (alpha=0.5) is IEEE-exact (unlike general
    pow/exp), but the normalizer would sum doubles in engine-dependent
    order, so each sqrt is quantized to pico-units (floor(x*1e12 + 0.5))
    and the normalizer is an EXACT integer sum (order-free); p_alpha is
    one divide of two ints that fit a double exactly — bit-stable."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source", F.size(word_tokens(F.col("text"))).cast("long").alias("n")
    )
    s = tk.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    tot = s.agg(F.sum("n_s").cast("long").alias("n"))
    p_raw = F.col("n_s").cast("double") / F.col("n")
    u = F.floor(F.sqrt(p_raw) * 1e12 + 0.5).cast("long")
    w = W.partitionBy()
    return (
        s.join(F.broadcast(tot))
        .select("source", "n_docs", "n_s", p_raw.alias("p_raw"), u.alias("u"))
        .select(
            "source", "n_docs", "n_s", "p_raw",
            (
                F.col("u").cast("double")
                / F.sum("u").over(w).cast("double")
            ).alias("p_alpha"),
        )
    )


@register(
    "x41_token_budget",
    r"""
    WITH tk AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  w -> w <> '')) AS BIGINT) AS n
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(ceil(CAST(n AS DOUBLE) / 128.0) AS BIGINT)) AS BIGINT)
             AS n_seqs_128,
           CAST(SUM(CAST(ceil(CAST(n AS DOUBLE) / 128.0) AS BIGINT)) * 128
                - SUM(n) AS BIGINT) AS pad_waste_128,
           CAST(SUM(CASE WHEN n > 128 THEN n - 128 ELSE 0 END) AS BIGINT)
             AS truncation_loss_128
    FROM tk GROUP BY source
    """,
)
def x41_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Token-budget planning per source for a max_seq_len=128 packing
    pass: how many sequences the corpus yields, how much padding a
    naive one-doc-per-sequence layout wastes, and how many tokens a
    truncate-to-one-sequence policy would drop. These three numbers decide
    between packing strategies before an expensive tokenization run at
    100 TB — and they come from ONE scan-side expression per doc plus a
    per-source rollup (zero joins, one shuffle of |sources| x partial
    rows). ceil on an exact small-int ratio and pure integer sums —
    nothing to drift."""
    d = t(spark, sf_dir, "documents")
    n = F.size(word_tokens(F.col("text"))).cast("long")
    seqs = F.ceil(n.cast("double") / 128.0).cast("long")
    tk = d.select(
        "source", n.alias("n"), seqs.alias("n_seqs"),
        F.when(n > 128, n - 128).otherwise(F.lit(0)).alias("trunc_loss"),
    )
    return tk.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum("n_seqs").cast("long").alias("n_seqs_128"),
        (F.sum("n_seqs") * 128 - F.sum("n")).cast("long").alias("pad_waste_128"),
        F.sum("trunc_loss").cast("long").alias("truncation_loss_128"),
    )


@register(
    "x44_sequence_packing",
    r"""
    WITH tk AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  w -> w <> '')) AS BIGINT) AS n
      FROM documents
    ), pre AS (
      SELECT source, n,
             COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM tk
    ), b AS (
      SELECT source, n, prefix // 128 AS bin,
             CASE WHEN (prefix % 128) + n > 128 THEN 1 ELSE 0 END AS straddle
      FROM pre
    ), per_bin AS (
      SELECT source, bin,
             CAST(COUNT(*) AS BIGINT) AS docs_in_bin,
             CAST(SUM(n) AS BIGINT) AS bin_n,
             CAST(SUM(straddle) AS BIGINT) AS bin_straddle
      FROM b GROUP BY source, bin
    )
    SELECT source,
           CAST(SUM(docs_in_bin) AS BIGINT) AS n_docs,
           CAST(SUM(bin_n) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN SUM(bin_n) = 0 THEN 0
                     ELSE (SUM(bin_n) - 1) // 128 + 1 END AS BIGINT) AS n_bins,
           CAST(SUM(bin_straddle) AS BIGINT) AS n_straddlers,
           CAST(MAX(docs_in_bin) AS BIGINT) AS max_docs_started_per_bin
    FROM per_bin GROUP BY source
    """,
)
def x44_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Deterministic sequential sequence-packing audit (context = 128
    tokens): docs concatenate per source in doc_id order, and each doc's
    start offset is the running token prefix — bin = prefix // 128. Emits
    per source how many context windows the packed stream fills, how many
    docs straddle a window boundary (candidates for attention-mask
    cross-contamination), and the worst per-window document pileup.
    This is the planning pass before an actual packing job: the same
    running-prefix window would ASSIGN bins at 100 TB. One shuffle on
    source feeds the prefix window, the per-bin rollup, AND the final
    per-source rollup (hash clustering on source satisfies all three) —
    the corpus crosses the wire once. Pure integer arithmetic."""
    d = t(spark, sf_dir, "documents")
    n = F.size(word_tokens(F.col("text"))).cast("long")
    wp = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    pre = (
        d.select("doc_id", "source", n.alias("n"))
        .withColumn("prefix", F.coalesce(F.sum("n").over(wp), F.lit(0)))
    )
    b = pre.select(
        "source",
        "n",
        F.expr("prefix DIV 128").alias("bin"),
        F.when((F.col("prefix") % 128) + F.col("n") > 128, 1)
        .otherwise(0)
        .alias("straddle"),
    )
    per_bin = b.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("docs_in_bin"),
        F.sum("n").cast("long").alias("bin_n"),
        F.sum("straddle").cast("long").alias("bin_straddle"),
    )
    return per_bin.groupBy("source").agg(
        F.sum("docs_in_bin").cast("long").alias("n_docs"),
        F.sum("bin_n").cast("long").alias("n_tokens"),
        F.when(F.sum("bin_n") == 0, F.lit(0))
        .otherwise(F.expr("(sum(bin_n) - 1) DIV 128") + 1)
        .cast("long")
        .alias("n_bins"),
        F.sum("bin_straddle").cast("long").alias("n_straddlers"),
        F.max("docs_in_bin").cast("long").alias("max_docs_started_per_bin"),
    )


@register(
    "x46_doc_chunks",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS tke
      FROM documents
    ), st AS (
      SELECT doc_id, tke, unnest(range(1, len(tke) + 1, 48)) AS s
      FROM tk
    )
    SELECT doc_id,
           CAST((s - 1) // 48 + 1 AS BIGINT) AS chunk_id,
           CAST(LEAST(64, len(tke) - s + 1) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(tke[s : LEAST(s + 63, len(tke))], ' '))
             AS chunk_hash
    FROM st
    """,
)
def x46_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Sliding-window document chunking (chunk = 64 tokens, stride = 48,
    16-token overlap) — the RAG/embedding-prep pass that splits long
    documents into model-window pieces. Chunk starts generate INSIDE the
    token array (`sequence` + explode — linear, no self-join); each chunk
    carries its token count and an md5 content hash so downstream dedup
    can drop repeated chunks without re-reading text. Token arrays
    materialize once per row (`withColumn`) so the per-chunk slice never
    re-tokenizes; the explode multiplies rows AFTER a repartition, so the
    expansion parallelizes instead of riding a few scan splits. Scan-side
    only — zero joins, zero shuffles beyond the repartition."""
    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    tk = F.col("_tk")
    starts = F.when(
        F.size(tk) >= 1, F.sequence(F.lit(1), F.size(tk), F.lit(48))
    ).otherwise(F.array().cast("array<int>"))
    st = (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("doc_id", "_tk", F.explode(starts).alias("s"))
    )
    return st.select(
        "doc_id",
        (F.expr("(s - 1) DIV 48") + 1).cast("long").alias("chunk_id"),
        F.least(F.lit(64), F.size(tk) - F.col("s") + 1)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.slice(tk, F.col("s"), 64))).alias("chunk_hash"),
    )


_CHUNK_SQL = r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS tke
      FROM documents
    ), st AS (
      SELECT doc_id, tke, unnest(range(1, len(tke) + 1, 48)) AS s
      FROM tk
    ), ch AS (
      SELECT doc_id,
             CAST((s - 1) // 48 + 1 AS BIGINT) AS chunk_id,
             md5(array_to_string(tke[s : LEAST(s + 63, len(tke))], ' ')) AS chunk_hash
      FROM st
    )
"""


@register(
    "x53_chunk_dedup",
    _CHUNK_SQL
    + """
    SELECT chunk_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM ch
    GROUP BY chunk_hash
    HAVING COUNT(*) > 1
    """,
)
def x53_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Chunk-level exact dedup: 64-token sliding chunks (x46's
    chunking) whose content hash repeats across the corpus, with the
    lowest-doc_id survivor — the granularity RAG indexing and pretraining
    dedup actually operate at (boilerplate repeats as chunks inside
    otherwise-unique documents, which doc-level dedup can never see).
    One groupBy on the chunk hash — the same single-shuffle shape as x01
    exact doc dedup, corpus-linear at any scale."""
    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    tk = F.col("_tk")
    starts = F.when(
        F.size(tk) >= 1, F.sequence(F.lit(1), F.size(tk), F.lit(48))
    ).otherwise(F.array().cast("array<int>"))
    chunks = (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("doc_id", "_tk", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.slice(tk, F.col("s"), 64))).alias("chunk_hash"),
        )
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
        .where(F.col("n_occurrences") > 1)
    )


@register(
    "x58_eval_gram_decontamination",
    r"""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, source, unnest(list_distinct(
               list_transform(range(1, GREATEST(length(t) - 2, 1)),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                        || ' ' || t[i+3])
             )) AS gram
      FROM tk WHERE length(t) >= 4
    ), ev AS (
      SELECT DISTINCT gram FROM g WHERE source IN ('src0', 'src1')
    ), tr AS (
      SELECT g.doc_id, g.source, g.gram,
             CASE WHEN ev.gram IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM g LEFT JOIN ev ON ev.gram = g.gram
      WHERE g.source NOT IN ('src0', 'src1')
    )
    SELECT doc_id, source,
           CAST(SUM(hit) AS BIGINT) AS n_eval_grams,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS contamination_ratio
    FROM tr GROUP BY doc_id, source
    HAVING SUM(hit) > 0
    """,
)
def x58_eval_gram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] GPT-3-style training-set decontamination (Brown et al. 2020,
    app. C): flag every TRAINING document sharing a word 4-gram with the
    held-out EVAL sources (src0/src1 stand in for the eval suite). Unlike
    x34 (source-pair overlap counts) this is the per-document dirty list a
    pipeline actually quarantines before training.

    Scale shape: the eval gram set is small by contract (eval suites are
    MBs, not TBs) — distinct once, then BROADCAST into the training-gram
    scan, so the corpus crosses the wire exactly once for the per-doc
    groupBy; nothing pair-shaped, nothing corpus² — at 100 TB this is one
    explode + one broadcast-probe + one doc-keyed shuffle."""
    from smfg_datawarehouse_spark.functions import word_shingles

    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    g = d.repartition(n_parts).select(
        "doc_id",
        "source",
        F.explode(word_shingles(F.col("text"), 4)).alias("gram"),
    )
    ev = (
        g.where(F.col("source").isin("src0", "src1"))
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        g.where(~F.col("source").isin("src0", "src1"))
        .join(F.broadcast(ev), "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_eval_grams"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_ratio"),
        )
        .where(F.col("n_eval_grams") > 0)
    )


@register(
    "x60_gopher_quality_gates",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(length(t) AS BIGINT) AS n_words,
             CAST(list_reduce(list_transform(t, w -> length(w)),
                              (a, b) -> a + b) AS DOUBLE)
               / length(t) AS mean_word_len,
             CAST(length(list_filter(t,
                    w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
               / length(t) AS frac_alpha_words,
             CAST(length(list_filter(t,
                    w -> w IN ('the','a','of','and','to','in','is','it')))
               AS BIGINT) AS n_stopword_hits
      FROM tk WHERE length(t) >= 1
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopword_hits,
           n_words BETWEEN 50 AND 100000 AS flag_word_count,
           mean_word_len BETWEEN 3.0 AND 10.0 AS flag_mean_word_len,
           frac_alpha_words >= 0.8 AS flag_alpha,
           n_stopword_hits >= 2 AS flag_stopwords,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND frac_alpha_words >= 0.8
             AND n_stopword_hits >= 2 AS passes_gopher
    FROM feats
    """,
)
def x60_gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Gopher-style rule gates (Rae et al. 2021, §A1.1) as explicit
    per-document booleans — the filter a web-scale pipeline applies before
    any model-based scoring: word-count bounds, mean-word-length bounds,
    alphabetic-word fraction, and a minimum stop-word count. x21 emits a
    composite score; this emits the individual pass/fail rules + verdict
    so a curation run can report WHY each document was dropped.

    Scan-side Catalyst expressions only — zero shuffles, runs at parquet
    read speed at any corpus size; every double is a single division of
    exact integers so the verdict booleans are engine-exact."""
    d = t(spark, sf_dir, "documents")
    tk = word_tokens(F.col("text"))
    base = d.select("doc_id", tk.alias("t")).where(F.size("t") >= 1)
    n_words = F.size("t").cast("long")
    sum_len = F.aggregate(
        F.transform(F.col("t"), lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
    )
    mean_wl = sum_len.cast("double") / F.size("t")
    alpha = F.size(F.filter(F.col("t"), lambda w: w.rlike("^[a-z]+$")))
    frac_alpha = alpha.cast("double") / F.size("t")
    stops = F.size(F.filter(F.col("t"), lambda w: w.isin(_STOPWORDS_EN))).cast("long")
    feats = base.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        stops.alias("n_stopword_hits"),
    )
    f_wc = (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
    f_mwl = (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)
    f_alpha = F.col("frac_alpha_words") >= 0.8
    f_stop = F.col("n_stopword_hits") >= 2
    return feats.select(
        "doc_id", "n_words", "mean_word_len", "frac_alpha_words", "n_stopword_hits",
        f_wc.alias("flag_word_count"),
        f_mwl.alias("flag_mean_word_len"),
        f_alpha.alias("flag_alpha"),
        f_stop.alias("flag_stopwords"),
        (f_wc & f_mwl & f_alpha & f_stop).alias("passes_gopher"),
    )


@register(
    "x65_corpus_datacard",
    r"""
    WITH tk AS (
      SELECT source, lang, text,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), feats AS (
      SELECT source, lang, t,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  AS DOUBLE) / length(text) AS alpha_ratio,
             CAST(LEAST(length(text), 500) AS DOUBLE) / 500.0 AS len_norm
      FROM tk WHERE length(t) >= 1
    ), scored AS (
      SELECT source, lang,
             length(t) AS n_tokens,
             0.4 * alpha_ratio
               + 0.3 * (CASE WHEN length(t) > 0
                             THEN CAST(length(list_filter(t,
                                    w -> w IN ('the','a','of','and','to',
                                               'in','is','it'))) AS DOUBLE)
                                  / length(t)
                             ELSE 0.0 END)
               + 0.3 * len_norm AS q,
             (length(t) BETWEEN 50 AND 100000)
               AND (CAST(list_reduce(list_transform(t, w -> length(w)),
                                     (a, b) -> a + b) AS DOUBLE) / length(t)
                    BETWEEN 3.0 AND 10.0)
               AND (CAST(length(list_filter(t,
                      w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
                    / length(t) >= 0.8)
               AND (length(list_filter(t,
                      w -> w IN ('the','a','of','and','to','in','is','it')))
                    >= 2) AS gopher_pass
      FROM feats
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_doc_tokens,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS pct_en_labeled,
           CAST(SUM(CAST(floor(q * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*) AS mean_quality,
           CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS gopher_pass_rate
    FROM scored GROUP BY source
    """,
)
def x65_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Per-source corpus datacard — the one-page sign-off artifact a
    data owner reviews before a source enters a training mix (Datasheets
    for Datasets practice): volume (docs/tokens), language composition,
    mean composite quality, and Gopher-gate pass rate, all in ONE corpus
    scan with one source-keyed shuffle of aggregated rows. Complements
    x55 (dedup impact) — together they are the admission report.

    All scoring expressions are shared verbatim with x21/x60 (composite
    quality, rule gates); means follow the davg exact-decimal convention
    so every double is engine-exact."""
    d = t(spark, sf_dir, "documents")
    text = F.col("text")
    tk = word_tokens(text)
    n_chars = F.length(text)
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("double")
        / n_chars
    )
    len_norm = F.least(n_chars, F.lit(500)).cast("double") / F.lit(500.0)
    # empty/whitespace-only docs are excluded (same guard as x60): their
    # ratio denominators are undefined and they carry no admission signal
    base = d.select(
        "source", "lang", tk.alias("t"),
        alpha_ratio.alias("alpha_ratio"), len_norm.alias("len_norm"),
    ).where(F.size("t") >= 1)
    n_tokens = F.size("t")
    stop_hits = F.size(F.filter(F.col("t"), lambda w: w.isin(_STOPWORDS_EN)))
    q = (
        F.lit(0.4) * F.col("alpha_ratio")
        + F.lit(0.3)
        * F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(0.0)
        + F.lit(0.3) * F.col("len_norm")
    )
    sum_word_len = F.aggregate(
        F.transform(F.col("t"), lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
    )
    alpha_words = F.size(F.filter(F.col("t"), lambda w: w.rlike("^[a-z]+$")))
    gopher = (
        (n_tokens >= 50) & (n_tokens <= 100000)
        & (sum_word_len.cast("double") / n_tokens >= 3.0)
        & (sum_word_len.cast("double") / n_tokens <= 10.0)
        & (alpha_words.cast("double") / n_tokens >= 0.8)
        & (stop_hits >= 2)
    )
    scored = base.select(
        "source", "lang", n_tokens.alias("n_tokens"), q.alias("q"),
        gopher.alias("gopher_pass"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
            "avg_doc_tokens"
        ),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("pct_en_labeled"),
        # micro-unit mean, NOT davg: q is a computed double, and a value
        # landing on a .0000005 boundary rounds differently under Spark's
        # half-up vs DuckDB's half-even DECIMAL cast (observed at sf0.1);
        # floor(q*1e6+0.5) is pure IEEE arithmetic — identical everywhere
        # (same reasoning as x08's centroid accumulation)
        (
            F.sum(F.floor(F.col("q") * 1000000.0 + 0.5).cast("long")).cast("double")
            / 1000000.0
            / F.count(F.lit(1))
        ).alias("mean_quality"),
        (
            F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("gopher_pass_rate"),
    )


@register(
    "x68_collocation_lift",
    r"""
    WITH toks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS tk
      FROM documents
    ), bi AS (
      SELECT unnest([tk[i] || ' ' || tk[i + 1] for i in range(1, len(tk))])
               AS bg
      FROM toks
    ), nab AS (
      SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_ab FROM bi GROUP BY bg
    ), uni AS (
      SELECT unnest(tk) AS w FROM toks
    ), na AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM uni GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(n_w) AS BIGINT) AS n FROM na
    ), btot AS (
      SELECT CAST(SUM(n_ab) AS BIGINT) AS b FROM nab
    ), sc AS (
      SELECT split_part(bg, ' ', 1) AS tok_a,
             split_part(bg, ' ', 2) AS tok_b,
             n_ab,
             ((CAST(n_ab AS DOUBLE) * tot.n) * tot.n)
               / ((CAST(btot.b AS DOUBLE) * x.n_w) * y.n_w) AS lift
      FROM nab CROSS JOIN tot CROSS JOIN btot
      JOIN na x ON x.w = split_part(bg, ' ', 1)
      JOIN na y ON y.w = split_part(bg, ' ', 2)
      WHERE n_ab >= 5
    )
    SELECT tok_a, tok_b, n_ab, lift
    FROM sc ORDER BY lift DESC, tok_a, tok_b LIMIT 50
    """,
)
def x68_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Collocation mining by LIFT — word2phrase-style phrase discovery
    for tokenizer/vocab construction: for each bigram (a,b) with support
    ≥ 5, lift = P(ab) / (P(a)·P(b)) ≫ 1 marks pairs that co-occur far
    above chance (phrase candidates worth merging into one token). Lift
    is the exponential of PMI but avoids transcendentals entirely: the
    score is ONE fixed-shape chain of IEEE multiplies/divide over exact
    integer counts — ((n_ab·N)·N)/((B·n_a)·n_b) — bit-identical in any
    engine, where a log-based PMI would drift in the last ulp.

    Scale shape: bigram counts generate inside the token array (x27's
    transform — no self-join, no positional explode), shuffling only
    |distinct bigrams| partials; unigram counts shuffle |vocab|; the two
    count tables then join bigram→unigram twice — vocab-sized, broadcast
    here and still dimension-like at 100 TB (vocab grows ~log corpus) —
    and TakeOrderedAndProject caps the result at 50 with a full
    tie-break (lift DESC, tok_a, tok_b)."""
    d = t(spark, sf_dir, "documents")
    tk = F.col("_tk")
    pairs = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.slice(tk, 1, F.size(tk) - 1),
            lambda w, i: F.struct(
                w.alias("tok_a"), F.element_at(tk, i + F.lit(2)).alias("tok_b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<tok_a:string,tok_b:string>>"))
    n_parts = spark.sparkContext.defaultParallelism
    toks = d.repartition(n_parts).withColumn("_tk", word_tokens(F.col("text")))
    # cached: both the bigram and the unigram rollup re-derive the token
    # array from the raw text otherwise (two full tokenization passes)
    toks = toks.select("_tk").cache()
    nab = (
        toks.select(F.explode(pairs).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = (
        toks.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    # totals come from ONE pass over the cached token arrays (N = Σ|tk|,
    # B = Σ max(|tk|−1, 0)) — deriving them from na/nab would re-run
    # those groupBys' full lineage, and at scale an unpartitioned window
    # over a vocab-sized table would funnel it into one partition
    tots = toks.agg(
        F.sum(F.size(tk)).cast("long").alias("n"),
        F.sum(F.greatest(F.size(tk) - 1, F.lit(0))).cast("long").alias("b"),
    )
    lift = (
        (F.col("n_ab").cast("double") * F.col("n")) * F.col("n")
    ) / ((F.col("b").cast("double") * F.col("na_w")) * F.col("nb_w"))
    return (
        nab.where(F.col("n_ab") >= 5)
        .join(F.broadcast(na.withColumnRenamed("w", "tok_a").withColumnRenamed("n_w", "na_w")), "tok_a")
        .join(F.broadcast(na.withColumnRenamed("w", "tok_b").withColumnRenamed("n_w", "nb_w")), "tok_b")
        .join(F.broadcast(tots))
        .select("tok_a", "tok_b", "n_ab", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "tok_a", "tok_b")
        .limit(50)
    )


@register(
    "x70_lm_score_buckets",
    r"""
    WITH tk AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), tok AS (
      SELECT doc_id, lang, tokw FROM tk, UNNEST(t) AS u(tokw)
    ), ct AS (
      SELECT tokw, CAST(COUNT(*) AS BIGINT) AS c_t FROM tok GROUP BY tokw
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
    ), sc AS (
      SELECT tok.doc_id, tok.lang,
             CAST(SUM(CAST(floor(CAST(ct.c_t AS DOUBLE) / tot.n * 1e15 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1e15 / COUNT(*)
               AS mtp
      FROM tok JOIN ct USING (tokw) CROSS JOIN tot
      GROUP BY tok.doc_id, tok.lang
    ), th AS (
      SELECT lang,
             quantile_cont(mtp, CAST(1 AS DOUBLE) / 3) AS t1,
             quantile_cont(mtp, CAST(2 AS DOUBLE) / 3) AS t2
      FROM sc GROUP BY lang
    )
    SELECT sc.lang,
           CASE WHEN sc.mtp >= th.t2 THEN 'head'
                WHEN sc.mtp >= th.t1 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(floor(sc.mtp * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e12 / COUNT(*) AS mean_prob
    FROM sc JOIN th USING (lang)
    GROUP BY 1, 2
    """,
)
def x70_lm_score_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] CCNet-style head/middle/tail bucketing (Wenzek et al.,
    arXiv:1911.00359): documents are scored under a corpus LM and split
    per LANGUAGE at the score terciles — 'head' feeds high-quality
    training mixes, 'tail' gets dropped or down-weighted. The LM score is
    x37's transcendental-free mean unigram probability (same ranking as
    unigram perplexity, bit-stable across engines); thresholds are exact
    interpolated terciles computed per language.

    Scale shape: the per-doc score pipeline is x37's (vocab broadcast
    onto the token stream, doc-keyed rollup); the threshold table is
    |langs| rows — an aggregate over doc-level scores, NOT the corpus —
    and broadcasts back into the doc-score stream for bucketing, so the
    corpus is tokenized once and the extra bucketing cost is one
    doc-level shuffle. Exact percentile is doc-level-feasible even at
    100 TB corpus scale (scores are one row per doc); approx_percentile
    is the drop-in if doc counts outgrow it (x52 gates that sketch)."""
    d = t(spark, sf_dir, "documents")
    # cached: consumed by BOTH the threshold aggregate and the bucketing
    # join — doc-level (one row per doc), so the cache is corpus-small
    sc = (
        doc_mean_token_prob(d, extra_cols=["lang"])
        .withColumnRenamed("mean_token_prob", "mtp")
        .cache()
    )
    th = sc.groupBy("lang").agg(
        F.expr("percentile(mtp, CAST(1 AS DOUBLE) / 3)").alias("t1"),
        F.expr("percentile(mtp, CAST(2 AS DOUBLE) / 3)").alias("t2"),
    )
    bucket = (
        F.when(F.col("mtp") >= F.col("t2"), "head")
        .when(F.col("mtp") >= F.col("t1"), "middle")
        .otherwise("tail")
    )
    return (
        sc.join(F.broadcast(th), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.sum(F.floor(F.col("mtp") * 1e12 + 0.5).cast("long")).cast("double")
                / 1e12
                / F.count(F.lit(1))
            ).alias("mean_prob"),
        )
    )


_X71_ORACLE = f"""
    WITH g AS (
      SELECT doc_id, length(text) - {WINNOW_K - 1} AS ng, u.pos,
             ('0x' || substring(
                md5(substring(lower(text), u.pos, {WINNOW_K})), 1, 8))::BIGINT
               * 10000000 + (9999999 - u.pos) AS enc
      FROM documents,
           LATERAL unnest(generate_series(1, length(text) - {WINNOW_K} + 1)) AS u(pos)
    ),
    sel AS (
      SELECT doc_id, pos, ng,
             min(enc) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS menc
      FROM g
    ),
    fps AS (
      SELECT DISTINCT doc_id, menc // 10000000 AS fp_hash
      FROM sel WHERE pos <= ng - {WINNOW_W - 1}
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM fps GROUP BY doc_id
    ),
    sh AS (
      SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM fps a JOIN fps b ON a.fp_hash = b.fp_hash AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT inner_doc, outer_doc, si.n AS n_inner_fps, so.n AS n_outer_fps
    FROM sh
    JOIN sizes si ON si.doc_id = sh.inner_doc
    JOIN sizes so ON so.doc_id = sh.outer_doc
    WHERE sh.shared = si.n AND si.n >= 3 AND si.n < so.n
"""


@register("x71_containment_dupes", _X71_ORACLE)
def x71_containment_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] CONTAINMENT dedup — the asymmetric near-dup class symmetric
    similarity misses: doc A subsumed by a larger doc B (quotes, reposts,
    page-in-page boilerplate), detected as A's winnowing fingerprint set
    being a SUBSET of B's (shared == |fps(A)|, with |fps(A)| < |fps(B)|
    so mutual containment / identical docs stay with x01/x23, and a ≥3
    floor against trivial sets). Winnowing guarantees any shared run of
    ≥ w+k−1 chars contributes a shared fingerprint, so subset-ness is a
    faithful proxy for textual containment at the gram scale.

    Scale shape: same fp_hash-keyed candidate join as x23 (Σ|bucket|²,
    never all-pairs), then the directed pair table joins the doc-level
    size table on its keys — all key-shuffles, nothing broadcastier than
    it can afford (the size table is corpus-row-count sized, so it joins
    by key rather than broadcasting)."""
    d = t(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(d).cache()
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = fps.select(F.col("doc_id").alias("inner_doc"), "fp_hash")
    b = fps.select(F.col("doc_id").alias("outer_doc"), "fp_hash")
    sh = (
        a.join(b, "fp_hash")
        .where(F.col("inner_doc") != F.col("outer_doc"))
        .groupBy("inner_doc", "outer_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    si = sizes.select(F.col("doc_id").alias("inner_doc"), F.col("n").alias("n_inner_fps"))
    so = sizes.select(F.col("doc_id").alias("outer_doc"), F.col("n").alias("n_outer_fps"))
    return (
        sh.join(si, "inner_doc")
        .join(so, "outer_doc")
        .where(
            (F.col("shared") == F.col("n_inner_fps"))
            & (F.col("n_inner_fps") >= 3)
            & (F.col("n_inner_fps") < F.col("n_outer_fps"))
        )
        .select("inner_doc", "outer_doc", "n_inner_fps", "n_outer_fps")
    )


_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_X73_N_SQL = " + ".join(
    f"(strlen(t) - strlen(replace(t, '{c}', '')))" for c in _LETTERS
)
_X73_SQ_SQL = " + ".join(
    f"(strlen(t) - strlen(replace(t, '{c}', ''))) * (strlen(t) - strlen(replace(t, '{c}', '')))"
    for c in _LETTERS
)


@register(
    "x73_char_diversity_filter",
    f"""
    WITH lt AS (SELECT doc_id, lower(text) AS t FROM documents),
    h AS (
      SELECT doc_id,
             CAST({_X73_N_SQL} AS BIGINT) AS n_alpha,
             CAST({_X73_SQ_SQL} AS BIGINT) AS sq
      FROM lt
    )
    SELECT doc_id, n_alpha,
           CASE WHEN n_alpha > 0
                THEN CAST(n_alpha * n_alpha - sq AS DOUBLE) / (n_alpha * n_alpha)
                ELSE 0.0 END AS gini,
           (n_alpha > 0 AND
            CAST(n_alpha * n_alpha - sq AS DOUBLE) / (n_alpha * n_alpha) >= 0.9)
             AS is_diverse
    FROM h
    """,
)
def x73_char_diversity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Gibberish/low-diversity filter via CHARACTER GINI IMPURITY —
    the transcendental-free stand-in for character-entropy filtering
    (aaaaaa…-style degenerate text scores near 0, natural text near the
    alphabet's impurity ceiling): gini = 1 − Σp_c² = (n² − Σc_i²)/n²
    over the 26-letter histogram, ONE division of exact integers — no
    log(), bit-identical in any engine. The histogram itself is 26
    `strlen − strlen(replace(…))` expressions: zero explode, zero
    shuffle, pure whole-stage-codegen scan — at 100 TB this runs at I/O
    speed where a char-explode would 157× the row count (mean doc
    length) before aggregating it back."""
    d = t(spark, sf_dir, "documents")
    txt = F.lower(F.col("text"))
    counts = [
        F.length(txt) - F.length(F.expr(f"replace(lower(text), '{c}', '')"))
        for c in _LETTERS
    ]
    n_alpha = counts[0]
    for c in counts[1:]:
        n_alpha = n_alpha + c
    sq = counts[0] * counts[0]
    for c in counts[1:]:
        sq = sq + c * c
    n_alpha = n_alpha.cast("long")
    sq = sq.cast("long")
    gini = F.when(
        n_alpha > 0,
        (n_alpha * n_alpha - sq).cast("double") / (n_alpha * n_alpha),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        n_alpha.alias("n_alpha"),
        gini.alias("gini"),
        ((n_alpha > 0) & (gini >= 0.9)).alias("is_diverse"),
    )


@register(
    "x74_eval_leakage_coverage",
    r"""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, source, unnest(list_distinct(
               list_transform(range(1, GREATEST(length(t) - 2, 1)),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                        || ' ' || t[i+3])
             )) AS gram
      FROM tk WHERE length(t) >= 4
    ), tr AS (
      SELECT DISTINCT gram FROM g WHERE source NOT IN ('src0', 'src1')
    ), ev AS (
      SELECT g.doc_id, g.source, g.gram,
             CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM g LEFT JOIN tr ON tr.gram = g.gram
      WHERE g.source IN ('src0', 'src1')
    )
    SELECT doc_id, source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(hit) AS BIGINT) AS n_covered,
           CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS coverage
    FROM ev GROUP BY doc_id, source
    """,
)
def x74_eval_leakage_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Per-EVAL-document leakage coverage — x58's reversed quadrant:
    for every held-out eval document (src0/src1), the fraction of its
    distinct word 4-grams that appear ANYWHERE in the training corpus —
    the ROUGE-recall-style severity score benchmark audits report per
    item (x58 answers "which training docs to quarantine"; this answers
    "how burned is each eval item", including 0%-covered items).

    Scale shape inverts x58's broadcast: the training gram set is
    corpus-sized and canNOT broadcast, so the (small) eval gram set
    broadcasts into the training-gram scan to produce the matched-gram
    set — eval-sized by construction — which then broadcasts back into
    the per-eval-doc rollup. The corpus crosses the wire exactly once;
    nothing corpus-sized is ever collected or broadcast."""
    from smfg_datawarehouse_spark.functions import word_shingles

    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    g = d.repartition(n_parts).select(
        "doc_id",
        "source",
        F.explode(word_shingles(F.col("text"), 4)).alias("gram"),
    )
    is_eval = F.col("source").isin("src0", "src1")
    ev_grams = g.where(is_eval)
    ev_gram_set = ev_grams.select("gram").distinct()
    matched = (
        g.where(~is_eval)
        .select("gram")
        .join(F.broadcast(ev_gram_set), "gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        ev_grams.join(F.broadcast(matched), "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_covered"),
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("coverage"),
        )
    )


_QUALITY_SCORE_SQL = r"""
      SELECT doc_id, source,
             0.4 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                         AS DOUBLE) / length(text))
               + 0.3 * (CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                  w -> w <> '')) > 0
                             THEN CAST(len(list_filter(
                                      regexp_split_to_array(lower(text), '\s+'),
                                      w -> w IN ('the','a','of','and','to','in','is','it')))
                                    AS DOUBLE)
                                  / len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                    w -> w <> ''))
                             ELSE 0.0 END)
               + 0.3 * (CAST(LEAST(length(text), 500) AS DOUBLE) / 500.0)
               AS quality_score
      FROM documents
"""


@register(
    "x76_quality_calibration",
    f"""
    WITH sc AS ({_QUALITY_SCORE_SQL}),
    rk AS (
      SELECT doc_id, source, quality_score,
             PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY quality_score, doc_id) AS pct_rank
      FROM sc
    )
    SELECT doc_id, source, quality_score, pct_rank,
           CAST(LEAST(9, CAST(FLOOR(pct_rank * 10) AS BIGINT)) AS BIGINT) AS decile
    FROM rk
    """,
)
def x76_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] Cross-source QUALITY CALIBRATION: x21's raw composite
    quality score is re-expressed as a within-source percentile
    (PERCENT_RANK over the source partition, doc_id tie-break) plus a
    decile bucket. Raw scores are not comparable across crawl domains —
    a 0.6 from a boilerplate-heavy domain may be its best content while
    the same 0.6 is another domain's worst — so curation thresholds in
    real mixes (e.g. CCNet's per-language/per-domain buckets) cut on the
    WITHIN-SOURCE rank, which this makes a first-class column.

    Determinism: percent_rank = (rank-1)/(n-1) is a ratio of exact ints;
    the doc_id tie-break makes the ordering total, and the decile floor
    runs on bit-identical doubles in both engines. Scale shape: pure scan
    expression + ONE window shuffle on source; at extreme source skew the
    window is per-key linear (no buffering — percent_rank streams)."""
    d = quality_features(t(spark, sf_dir, "documents"))
    w = W.partitionBy("source").orderBy("quality_score", "doc_id")
    pct = F.percent_rank().over(w)
    return d.select(
        "doc_id",
        "source",
        "quality_score",
        pct.alias("pct_rank"),
        F.least(F.lit(9), F.floor(pct * 10).cast("long")).cast("long").alias("decile"),
    )


@register(
    "x77_zipf_constant",
    r"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS tok
      FROM documents
    ),
    freqs AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok),
    top AS (
      SELECT tok, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
      FROM freqs QUALIFY rnk <= 50
    )
    SELECT tok,
           CAST(freq AS BIGINT) AS freq,
           CAST(rnk AS BIGINT) AS rank,
           CAST(rnk * freq AS BIGINT) AS zipf_c,
           CAST(rnk * freq AS DOUBLE)
             / MAX(CASE WHEN rnk = 1 THEN rnk * freq END) OVER () AS rel_c
    FROM top
    """,
)
def x77_zipf_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] ZIPF-FIT corpus health check, transcendental-free: under
    Zipf's law rank×frequency is ~constant, so the per-rank constant
    ``zipf_c = rank·freq`` and its ratio to the rank-1 constant
    (``rel_c``) expose distribution anomalies — synthetic/templated text
    shows a flat head (rel_c ≈ 1 far down the ranks), boilerplate
    duplication shows cliffs — without fitting a log-log slope (log()
    differs in the last ulp across libm builds; integer products never
    do). Stopwords are kept: Zipf is about the NATURAL frequency head.

    Scale shape: explode + map-side-combined groupBy (vocabulary-sized
    output, sublinear in corpus), TakeOrderedAndProject top-50, then
    rank/normalize windows over the 50-row result — the only global
    windows run AFTER the limit."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(word_tokens(F.col("text"))).alias("tok"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(50)
    )
    ranked = top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("freq").desc(), "tok")).cast("long")
    ).withColumn("zipf_c", (F.col("rank") * F.col("freq")).cast("long"))
    c1 = F.max(F.when(F.col("rank") == 1, F.col("zipf_c"))).over(W.partitionBy())
    return ranked.select(
        "tok",
        F.col("freq").cast("long").alias("freq"),
        "rank",
        "zipf_c",
        (F.col("zipf_c").cast("double") / c1).alias("rel_c"),
    )


@register(
    "x78_tokenizer_fertility",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS BIGINT)
             AS total_bpe_tokens,
           CASE WHEN SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) > 0
                THEN CAST(SUM(strlen(text)) AS DOUBLE)
                     / SUM(len(regexp_extract_all(text, '{BPE_PATTERN}')))
                END AS bytes_per_token,
           CASE WHEN SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) > 0
                THEN CAST(SUM(length(text)) AS DOUBLE)
                     / SUM(len(regexp_extract_all(text, '{BPE_PATTERN}')))
                END AS chars_per_token
    FROM documents
    GROUP BY lang
    """,
)
def x78_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] TOKENIZER FERTILITY by language: bytes-per-token and
    chars-per-token of the BPE-ish pre-tokenization (x24's pattern) per
    language bucket — the metric that decides whether a tokenizer's byte
    budget is being spent evenly across a multilingual mix (high fertility
    = a language pays more tokens per byte of content; mixes are then
    re-weighted or the vocab re-trained). UTF-8 byte length via
    octet_length ≠ char length in general (ASCII fixture makes them equal
    — the distinction still exercises both code paths).

    Determinism: every output is a BIGINT sum or a single double division
    of two exact sums. Scale shape: one narrow scan, map-side-combined
    groupBy on lang (≤ dozens of groups) — corpus-linear, shuffle is
    group-count-sized."""
    d = t(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    return (
        d.select(
            "lang",
            F.octet_length("text").cast("long").alias("b"),
            F.length("text").cast("long").alias("c"),
            bpe.cast("long").alias("tk"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("b").cast("long").alias("total_bytes"),
            F.sum("c").cast("long").alias("total_chars"),
            F.sum("tk").cast("long").alias("total_bpe_tokens"),
            # zero-token guard: Spark yields NULL on 0/0 double division
            # but DuckDB yields Infinity — make NULL explicit in BOTH
            F.when(
                F.sum("tk") > 0, F.sum("b").cast("double") / F.sum("tk")
            ).alias("bytes_per_token"),
            F.when(
                F.sum("tk") > 0, F.sum("c").cast("double") / F.sum("tk")
            ).alias("chars_per_token"),
        )
    )


@register(
    "x79_k_anonymity_risk",
    """
    WITH cells AS (
      SELECT lang, source,
             CAST(LEAST(length(text) // 100, 9) AS BIGINT) AS len_bucket,
             COUNT(*) AS cell_size
      FROM documents
      GROUP BY lang, source, LEAST(length(text) // 100, 9)
    )
    SELECT lang, source, len_bucket,
           CAST(cell_size AS BIGINT) AS cell_size,
           cell_size < 5 AS below_k
    FROM cells
    """,
)
def x79_k_anonymity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] K-ANONYMITY risk report over quasi-identifiers: documents
    are binned by the (lang, source, length-bucket) quasi-identifier
    tuple and every cell smaller than k=5 is flagged — records in such
    cells are re-identifiable by their metadata alone, the standard
    privacy gate a training corpus passes before release (alongside
    x33's direct-PII masking: x33 removes identifiers IN the text, this
    finds identifying COMBINATIONS of attributes). Length is bucketed to
    100-char bands capped at 9 so the quasi-identifier stays
    low-cardinality (raw lengths would make every doc its own cell and
    the report vacuous). Character length on both sides (Spark
    ``F.length`` == DuckDB ``length``), per the repo's byte-vs-char
    discipline — bands are *char* bands as named.

    Scale shape: one map-side-combined groupBy onto the QI-cell frame
    (|langs|·|sources|·10 rows) — corpus-linear, output tiny; the
    below-k flag is a scan expression on the aggregate."""
    d = t(spark, sf_dir, "documents")
    len_bucket = F.least(
        F.floor(F.length("text") / 100).cast("long"), F.lit(9).cast("long")
    )
    return (
        d.groupBy("lang", "source", len_bucket.alias("len_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cell_size"))
        .withColumn("below_k", F.col("cell_size") < 5)
    )


@register(
    "x81_embedding_alignment",
    """
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_paired,
           CAST(COUNT(e.vec_id) AS DOUBLE) / COUNT(*) AS coverage,
           CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels,
           CAST(SUM(CASE WHEN e.vec_id IS NOT NULL
                         THEN length(d.text) END) AS BIGINT) AS paired_chars
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.source
    """,
)
def x81_embedding_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/J/§2.6] TEXT↔EMBEDDING ALIGNMENT audit: left-join documents to
    their precomputed embedding rows (doc_id = vec_id) and report
    per-source pairing coverage, label diversity among paired docs, and
    the paired character mass — the pre-flight check before any
    embedding-dependent stage (x05/x10/x54): a source with low coverage
    would silently vanish from semantic dedup/ANN results, which this
    makes visible instead (sf0.1 has 2000 embeddings for 5000 docs by
    fixture design, so partial coverage is actually exercised).

    Scale shape: ONE key-shuffled left join (both sides hash-partitioned
    on the id — at 100 TB this is the canonical co-partitioned join, and
    bucketing both tables on the id makes it shuffle-free per l04), then
    a map-side-combined rollup to |sources| rows. COUNT(DISTINCT label)
    runs as a two-phase partial-distinct aggregate, not a global
    collect."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    j = d.join(e, d.doc_id == e.vec_id, "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("vec_id").cast("long").alias("n_paired"),
        (F.count("vec_id").cast("double") / F.count(F.lit(1))).alias("coverage"),
        F.count_distinct("label").cast("long").alias("n_labels"),
        # character length (== DuckDB length), not octet_length: the
        # column is named paired_CHARS — byte-vs-char discipline
        F.sum(
            F.when(F.col("vec_id").isNotNull(), F.length("text"))
        ).cast("long").alias("paired_chars"),
    )


@register(
    "x82_lang_confusion",
    r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '') AS tk
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             CAST(length(list_filter(tk, w -> w IN ('the','and','of','to','is'))) AS BIGINT) AS hits_en,
             CAST(length(list_filter(tk, w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS hits_fr,
             CAST(length(list_filter(tk, w -> w IN ('der','die','und','das','ist'))) AS BIGINT) AS hits_de,
             CAST(length(list_filter(tk, w -> w IN ('el','la','los','que','es'))) AS BIGINT) AS hits_es
      FROM toks
    ), pred AS (
      SELECT lang,
             CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_es
                       AND hits_en > 0 THEN 'en'
                  WHEN hits_fr >= hits_de AND hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
                  WHEN hits_de >= hits_es AND hits_de > 0 THEN 'de'
                  WHEN hits_es > 0 THEN 'es'
                  ELSE 'und' END AS pred_lang
      FROM hits
    )
    SELECT lang AS declared_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY lang) AS row_frac,
           lang = pred_lang AS agree
    FROM pred
    GROUP BY lang, pred_lang
    """,
)
def x82_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] LANGUAGE-LABEL CONFUSION MATRIX: the table's declared
    ``lang`` column crossed with x22's stopword-heuristic detection —
    per (declared, detected) cell counts and row-normalized fractions.
    Declared labels in crawled corpora are noisy (CLD mislabels, site
    metadata lies); the confusion matrix is how a pipeline decides
    whether to TRUST the upstream label, re-run detection, or drop the
    disagreeing slice — and its diagonal mass is the detector's
    agreement rate, computed without any ground-truth annotation.

    Determinism: counts are exact ints, row_frac one double division.
    Scale shape: detection is a pure scan expression; ONE
    map-side-combined groupBy to a |langs|² matrix; the normalizing
    window runs on that tiny frame."""
    d = lang_id(t(spark, sf_dir, "documents"))
    m = d.groupBy(
        F.col("lang").alias("declared_lang"), "pred_lang"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = W.partitionBy("declared_lang")
    return m.select(
        "declared_lang",
        "pred_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("row_frac"),
        (F.col("declared_lang") == F.col("pred_lang")).alias("agree"),
    )


@register(
    "x83_dup_cluster_histogram",
    """
    WITH clusters AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             COUNT(*) AS cluster_size
      FROM documents GROUP BY 1
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS removable_docs,
           CAST(cluster_size * COUNT(*) AS DOUBLE)
             / SUM(cluster_size * COUNT(*)) OVER () AS doc_frac
    FROM clusters GROUP BY cluster_size
    """,
)
def x83_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] DUPLICATE-CLUSTER SIZE HISTOGRAM: exact-dup clusters
    (x01's whitespace-normalized md5 identity) rolled up by cluster
    size — how much of the corpus sits in singletons vs heavy
    boilerplate clusters, and the removable mass (size−1 per cluster)
    deduplication would reclaim. This is the histogram behind every
    dedup-impact decision (x55 reports the before/after totals; this
    shows the SHAPE — a corpus with 10-doc clusters dedups very
    differently from one with two 10k-doc template blobs).

    Determinism: pure integer counts, one double fraction. Scale
    shape: two map-side-combined groupBys (fingerprint → size,
    size → histogram) — the classic two-level rollup; output is
    ≤ max-cluster-size rows; the normalizing window runs on that tiny
    frame."""
    d = t(spark, sf_dir, "documents")
    clusters = d.groupBy(fingerprint(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    w = W.partitionBy()
    return hist.select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.col("n_clusters"))
        .cast("long")
        .alias("removable_docs"),
        (
            (F.col("cluster_size") * F.col("n_clusters")).cast("double")
            / F.sum(F.col("cluster_size") * F.col("n_clusters")).over(w)
        ).alias("doc_frac"),
    )


@register(
    "x87_domain_reweighting",
    r"""
    WITH tk AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), tok AS (
      SELECT source, tokw FROM tk, UNNEST(t) AS u(tokw)
    ), cst AS (
      SELECT source, tokw, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tok GROUP BY source, tokw
    ), nd AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), ns AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst GROUP BY source
    ), ct AS (
      SELECT tokw, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst GROUP BY tokw
    ), tot AS (
      SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cst
    ), pu AS (
      SELECT tokw, c_t, tot.n,
             CAST(floor(CAST(c_t AS DOUBLE) / tot.n * 1e15 + 0.5)
                  AS BIGINT) AS p_units
      FROM ct CROSS JOIN tot
    ), src AS (
      SELECT cst.source,
             CAST(SUM(cst.c_st * pu.p_units) AS DOUBLE) / 1e15 / MAX(ns.n_s)
               AS mean_token_prob
      FROM cst JOIN pu USING (tokw) JOIN ns ON ns.source = cst.source
      GROUP BY cst.source
    ), ref AS (
      SELECT CAST(SUM(c_t * p_units) AS DOUBLE) / 1e15 / MAX(n) AS ref_prob
      FROM pu
    ), wts AS (
      SELECT s.source, nd.n_docs, ns.n_s,
             CAST(ns.n_s AS DOUBLE) / tot.n AS natural_share,
             s.mean_token_prob,
             greatest(0.0, (r.ref_prob - s.mean_token_prob) / r.ref_prob)
               AS excess,
             CAST(floor((CAST(ns.n_s AS DOUBLE) / tot.n)
                        * (1.0 + greatest(0.0, (r.ref_prob - s.mean_token_prob)
                                               / r.ref_prob))
                        * 1e12 + 0.5) AS BIGINT) AS u
      FROM src s
      JOIN nd ON nd.source = s.source
      JOIN ns ON ns.source = s.source
      CROSS JOIN tot CROSS JOIN ref r
    )
    SELECT source, n_docs, CAST(n_s AS BIGINT) AS n_tokens,
           natural_share, mean_token_prob, excess,
           CAST(u AS DOUBLE) / CAST(SUM(u) OVER () AS DOUBLE) AS doremi_weight
    FROM wts
    """,
)
def x87_domain_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X/§2.6] DoReMi-style PER-DOMAIN REWEIGHTING audit (Xie et al.,
    arXiv:2305.10429): domains whose tokens fit the corpus-wide unigram
    reference WORSE get upweighted relative to their natural share —
    the mixture-adjustment step between x37's scoring and x67's mixture
    application. The excess-loss proxy is RATIONAL, not transcendental
    (repo discipline: log/exp are not bit-reproducible across engines):
    per-domain mean token probability under the corpus unigram LM stands
    in for negative loss, excess_s = max(0, (ref − p_s)/ref) ∈ [0, 1)
    for the clipped excess, and the DoReMi multiplicative update with
    η = 1 becomes weight_s ∝ natural_share_s · (1 + excess_s),
    normalized. Same ranking signal as the published exp(η·excess)
    update in the small-excess regime, bit-replayable everywhere.

    Determinism: token probabilities on the exact femto-grid (x37's
    convention), per-domain sums are exact integer, the weight enters a
    pico-unit integer before the window normalization (x39's idiom) —
    the output is a pure function of counts. Scale shape: ONE tokenize+
    explode pass into the cached (source, token) count table (vocab-
    sized), everything downstream is vocab- or domain-sized broadcasts;
    no corpus-sized shuffle beyond the count groupBy."""
    d = t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    tok = (
        d.repartition(n_parts)
        .withColumn("_tk", word_tokens(F.col("text")))
        .select("source", F.explode("_tk").alias("tokw"))
    )
    cst = tok.groupBy("source", "tokw").agg(F.count(F.lit(1)).alias("c_st")).cache()
    nd = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    ns = cst.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    ct = cst.groupBy("tokw").agg(F.sum("c_st").cast("long").alias("c_t"))
    tot = cst.agg(F.sum("c_st").cast("long").alias("n"))
    pu = ct.crossJoin(F.broadcast(tot)).select(
        "tokw", "c_t", "n",
        F.floor(F.col("c_t").cast("double") / F.col("n") * 1e15 + 0.5)
        .cast("long")
        .alias("p_units"),
    )
    src = (
        cst.join(F.broadcast(pu.select("tokw", "p_units")), "tokw")
        .join(F.broadcast(ns), "source")
        .groupBy("source")
        .agg(
            (
                F.sum(F.col("c_st") * F.col("p_units")).cast("double")
                / 1e15
                / F.max("n_s")
            ).alias("mean_token_prob")
        )
    )
    ref = pu.agg(
        (
            F.sum(F.col("c_t") * F.col("p_units")).cast("double")
            / 1e15
            / F.max("n")
        ).alias("ref_prob")
    )
    excess = F.greatest(
        F.lit(0.0),
        (F.col("ref_prob") - F.col("mean_token_prob")) / F.col("ref_prob"),
    )
    share = F.col("n_s").cast("double") / F.col("n")
    u = F.floor(share * (F.lit(1.0) + excess) * 1e12 + 0.5).cast("long")
    w = W.partitionBy()
    return (
        src.join(F.broadcast(nd), "source")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ref))
        .select(
            "source", "n_docs",
            F.col("n_s").alias("n_tokens"),
            share.alias("natural_share"),
            "mean_token_prob",
            excess.alias("excess"),
            u.alias("u"),
        )
        .select(
            "source", "n_docs", "n_tokens", "natural_share",
            "mean_token_prob", "excess",
            (
                F.col("u").cast("double") / F.sum("u").over(w).cast("double")
            ).alias("doremi_weight"),
        )
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

"""Engine query surface — one named query per operator in SURVEY.md §2.

Each entry pairs a DataFrame-API implementation with an ANSI-SQL oracle
(DuckDB dialect) the driver runs side-by-side. Registry keys are stable
names surfaced through ``__spark_entry__.queries()`` / ``oracle_sql()``.

Determinism conventions (so Spark and the DuckDB oracle hash-match):

- **Money/float SUMs**: per-row arithmetic stays in double (IEEE ops are
  bit-identical across engines), each row value is cast to
  ``DECIMAL(30,6)`` (deterministic round-to-nearest), the sum is exact
  decimal (associative — partition order can't change it), and the final
  value is cast back to double. AVG = exact-decimal-sum / count.
- **Counts/ints**: cast to BIGINT on both sides.
- **Top-k / windows**: always a unique tie-break key in the ORDER BY.
- **Ratios of exact ints**: plain double division (single op, no
  summation-order issue) — safe to round.

Reference-coverage tags (SURVEY.md §2) are noted per query: P=projection/
filter, J=join, A=aggregation, O=sort/limit, U=set-op, L=audit, T=incremental,
X=extension (BASELINE.json LLM-pipeline ops).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.functions import ordered_concat_ws

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


#: Names with a green driver CORRECTNESS row in ANY past round. The driver
#: samples the first N registered queries in order, so surface the
#: never-yet-certified names FIRST and push already-certified ones to the
#: back — maximizes new certification coverage per driver pass without
#: dropping any query. Refresh this set each round from the latest
#: CORRECTNESS_r{N}.json greens.
_CERTIFIED_R01 = {
    "q01_pricing_summary", "q02_projection_rename_filter",
    "q03_join_customer_orders", "q04_revenue_by_nation",
    "q05_ordered_group_concat", "q06_window_top_order_per_customer",
    "q07_topk_orders", "q08_except_customers_without_orders",
    "q09_anti_join_integrity", "q10_rollup_returns", "q11_case_bucketing",
    "q12_string_functions", "q13_date_functions",
    "q14_union_priority_classes", "q15_semi_join_active_parts",
    "q16_metadata_compiler", "q17_config_driven_extraction",
    "q19_merge_upsert", "q31_grouping_sets", "q33_intersect_nations",
    "q34_top_suppliers_by_revenue", "q36_above_average_orders",
    "q37_part_brand_revenue", "q38_customer_order_quartiles",
    "q39_customer_order_distribution", "q40_small_quantity_revenue",
    "q41_nation_presence_full_outer", "q43_except_all_open_vs_finished",
    "q46_stratified_systematic_sample", "q47_ranking_variants",
    "q48_volume_shipping", "q49_market_share", "q50_primary_supplier_parts",
    "q51_idle_rich_customers", "q52_unpivot_measures",
    "q53_shipping_priority", "q54_order_priority_check",
    "q55_local_supplier_volume", "q56_forecast_revenue_change",
    "q57_returned_item_customers", "q58_promo_revenue_ratio",
    "q59_top_supplier", "q60_parts_supplier_counts",
    "q61_large_volume_customers", "q62_discounted_brand_revenue",
    "q63_waiting_suppliers", "l01_runner_audit_end_to_end",
    "l02_versioned_merge_lifecycle",
}

#: CORRECTNESS_r02.json greens (50/50): the whole x-family plus q18/q44/l03.
_CERTIFIED_R02 = {
    "l03_multiformat_roundtrip", "q18_output_mapping_load",
    "q44_salted_event_type_totals",
    "x01_exact_dedup_docs", "x02_ngram_jaccard_pairs",
    "x03_minhash_lsh_dupes", "x04_simhash_dupes", "x05_cosine_near_dup",
    "x06_dup_groups_cc", "x07_latest_event_per_user", "x08_label_centroids",
    "x10_ann_bruteforce_topk", "x11_ann_ivf_topk", "x12_ivf_recall_at_10",
    "x13_embedding_quantization", "x14_minhash_estimation_error",
    "x20_token_stats", "x21_quality_scores", "x22_lang_id",
    "x23_winnowing_dupes", "x24_bpe_token_stats", "x25_keyword_extraction",
    "x26_vocabulary_top50", "x27_bigrams_top50", "x28_editdist_dupes",
    "x29_train_val_split", "x30_multimodal_features",
    "x31_multimodal_resize_sample", "x32_repetition_stats",
    "x33_pii_masking", "x34_cross_source_contamination", "x35_oov_rate",
    "x36_source_divergence", "x37_mean_token_prob", "x38_length_deciles",
    "x39_temperature_weights", "x40_corpus_curation", "x41_token_budget",
    "x42_embedding_dim_stats", "x43_centroid_distances",
    "x44_sequence_packing", "x45_dup_group_canonical", "x46_doc_chunks",
    "x47_hll_distinct_accuracy", "x48_dup_graph_pagerank",
    "x49_cms_heavy_hitters", "x50_tfidf_cosine_pairs",
    "x51_bloom_contamination", "x52_approx_percentile_gate",
    "x53_chunk_dedup",
}

#: CORRECTNESS_r03.json greens (50/50): events/window suite, lifecycle
#: l04-l16, streaming s01/s02, and the round-3 x additions.
_CERTIFIED_R03 = {
    "l04_bucketed_colocated_join", "l05_partition_pruned_lake",
    "l06_realtime_dispatch_lifecycle", "l07_compaction_lifecycle",
    "l08_partial_failure_rollup", "l09_schema_evolution_lifecycle",
    "l10_incremental_agg_maintenance", "l11_dynamic_partition_overwrite",
    "l12_time_travel_read", "l13_vacuum_lifecycle",
    "l14_jdbc_extraction_lifecycle", "l15_snapshot_diff",
    "l16_changelog_replay",
    "q20_tumbling_window", "q21_sliding_window", "q22_session_window",
    "q23_json_extraction", "q24_window_lag_running",
    "q25_pivot_daily_events", "q26_cube_event_matrix",
    "q27_distinct_users", "q28_incremental_watermark",
    "q29_percentile_stats", "q30_asof_last_purchase",
    "q32_view_purchase_conversions", "q35_data_profile",
    "q42_rolling_hour_user_value", "q45_hourly_gap_fill",
    "q64_event_funnel", "q65_cohort_retention", "q66_user_sessions",
    "q67_rolling_active_users", "q68_important_parts",
    "q69_monthly_revenue_growth", "q70_min_cost_supplier",
    "q71_profit_by_nation_year", "q72_price_histogram",
    "q73_time_weighted_value", "q74_moving_median",
    "q75_running_distinct_types", "q76_mad_outliers",
    "q77_forward_asof_conversion", "q78_unconverted_views",
    "q81_bloom_join_pushdown", "q86_order_consistency_audit",
    "s01_streaming_tumbling_window", "s02_streaming_stateful_totals",
    "x55_dedup_impact_report", "x56_shingle_novelty",
    "x61_incremental_minhash_dedup",
}

#: CORRECTNESS_r04.json greens (50/50): OLAP q88-q104, lifecycle l17-l30,
#: streaming s11-s16, and the round-4 x additions.
_CERTIFIED_R04 = {
    "l17_manifest_commit_lifecycle", "l18_zonemap_pruned_scan",
    "l19_salted_skew_join", "l20_join_view_maintenance",
    "l21_subject_erasure", "l22_deletion_vector_delete",
    "l23_write_audit_publish", "l24_partition_retention",
    "l26_multi_table_transaction", "l27_zero_copy_clone",
    "l28_clustered_rewrite", "l29_bloom_file_index",
    "l30_binpack_minor_compaction", "q100_equi_depth_histogram",
    "q101_sole_failing_supplier", "q102_bitemporal_revision",
    "q103_pareto_abc", "q104_semi_additive_balance", "q88_table_profile",
    "q89_dq_rule_audit", "q90_last_touch_attribution", "q91_ab_welch_ttest",
    "q92_lateral_top_orders", "q93_variant_extraction",
    "q94_rolling_trend_slope", "q95_bitmap_index_intersection",
    "q96_zorder_skipping_audit", "q97_recursive_reachability",
    "q98_band_join_bucketed", "q99_skyline_pareto",
    "s11_streaming_late_data_drop", "s12_streaming_semi_join",
    "s13_state_store_introspection", "s14_dedup_within_watermark",
    "s15_streaming_write_audit_publish", "s16_checkpoint_restart_recovery",
    "x105_lsh_banding_calibration", "x107_image_ahash",
    "x111_triangle_count", "x115_label_spread", "x116_record_linkage_fs",
    "x117_seasonality_index", "x85_pq_adc_topk", "x86_substring_dedup",
    "x88_cc_distributed_tier", "x89_png_decode_roundtrip",
    "x90_intra_doc_repetition", "x91_wav_decode_roundtrip",
    "x94_theta_sketch_set_ops", "x95_kll_quantile_rollup",
}

_CERTIFIED_R05 = {
    "l25_ann_index_persistence", "q79_scd2_user_history",
    "q80_scd2_point_in_time", "q82_burst_detection", "q83_grain_cascade",
    "q84_event_transitions", "q85_rfm_segmentation",
    "q87_conversion_latency_profile", "s03_streaming_interval_join",
    "s04_streaming_dedup", "s05_streaming_session_window",
    "s06_streaming_sliding_window", "s07_streaming_dim_enrichment",
    "s08_streaming_outer_join", "s09_streaming_backlog_drain",
    "s10_streaming_cdc_upsert", "x100_matryoshka_prefix_recall",
    "x101_skipgram_pairs", "x103_quantile_normalization",
    "x104_l_diversity_risk", "x106_ivf_cell_balance",
    "x108_shard_content_checksum", "x109_negative_sampling_table",
    "x112_rank_fusion_rrf", "x113_t_closeness", "x114_randomized_response",
    "x118_join_size_estimate", "x119_winsorized_mean", "x54_semantic_dedup",
    "x57_kmeans_lloyd", "x58_eval_gram_decontamination",
    "x59_sq8_rerank_topk", "x60_gopher_quality_gates",
    "x62_dsir_importance_weights", "x63_semantic_contamination",
    "x64_hard_negative_mining", "x65_corpus_datacard",
    "x68_collocation_lift", "x69_embedding_covariance",
    "x70_lm_score_buckets", "x71_containment_dupes",
    "x73_char_diversity_filter", "x74_eval_leakage_coverage",
    "x76_quality_calibration", "x87_domain_reweighting",
    "x92_boilerplate_coverage", "x93_inverted_index",
    "x96_token_chunking_udtf", "x98_bm25_rational_topk",
    "x99_jl_projection_topk",
}

_CERTIFIED_FALLBACK = (
    _CERTIFIED_R01 | _CERTIFIED_R02 | _CERTIFIED_R03 | _CERTIFIED_R04
    | _CERTIFIED_R05
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _certified_from_disk() -> tuple[set[str], dict[str, str]]:
    """Names with a green driver row in on-disk CORRECTNESS_r*.json, plus
    each green name's most-recent certifying file (for staleness order).

    The driver lands a new CORRECTNESS_r{N}.json after each round closes,
    i.e. AFTER the builder's last commit — so a hardcoded certified set is
    stale (and the slot-waste guard red) the moment a round ends. Deriving
    the tier from the files themselves makes the window self-refreshing:
    every new driver record immediately pushes its green names to the back
    of the registry order and promotes the never-certified complement into
    the next 50-slot sample window. Green means ``hash_match is True``, or
    — ONLY for the oracle-less rows-only checks (custom stateful
    streaming) where the driver records no hash verdict at all —
    ``hash_match`` absent/None with ``rows_match`` True. A row with an
    explicit ``hash_match: false`` is a FAILURE even when its row counts
    agree (ADVICE r7: r01's q18 was exactly that shape), and the LATEST
    round's verdict wins per name, so a regression in a newer record
    demotes the query back into the re-test tier instead of riding an old
    green forever. A malformed/unreadable file is skipped (never fatal on
    import), and if NO files exist (fresh checkout without driver
    artifacts) the frozen r01-r05 literals above are the offline fallback.
    """
    import glob
    import json

    verdicts: dict[str, bool] = {}
    last_green: dict[str, str] = {}
    # lexicographic sort == round order for the zero-padded r{NN} names;
    # later files overwrite, so each name carries its most recent verdict
    for path in sorted(
        glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))
    ):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            hm = row.get("hash_match")
            green = bool(row.get("rows_match")) if hm is None else bool(hm)
            verdicts[name] = green
            if green:
                last_green[name] = os.path.basename(path)
    certified = {n for n, green in verdicts.items() if green}
    return certified, {n: last_green[n] for n in certified}


_CERTIFIED, _CERT_RECENCY = _certified_from_disk()
if not _CERTIFIED:
    _CERTIFIED, _CERT_RECENCY = _CERTIFIED_FALLBACK, {}

#: Already-certified names whose underlying code THIS round touches
#: (perf rewrites, shared-frame caching, dialect edges). They sort right
#: behind every uncertified name, so if the driver window has spare
#: slots a fresh hash re-validates this round's changes — and because
#: every uncertified name still outranks them, a filler can never steal
#: a slot from a never-certified query. Refresh per round alongside the
#: round notes; stale entries cost nothing (they stay certified).
_RECERT_FILLERS = {
    # round 9 advice fixes (ADVICE r8): x156's NULL-hash survivor gate
    # and x158's code-point l0 changed the engine plan — re-hash both
    "x156_crossversion_dedup_stability", "x158_bpe_apply_by_source",
    # round 9 perf rewrites: l25's max_by assignment + local-frame
    # centroids, l37's single-exceptAll gate, l22's one-scan deltas,
    # l26's shared LEFT-join rollup, q97's checkpointed edge table,
    # manifest.commit_all's concurrent per-table writes (l26 again)
    "l25_ann_index_persistence", "l37_changelog_replay",
    "l22_deletion_vector_delete", "l26_multi_table_transaction",
    "q97_recursive_reachability",
    # round 9 refactor: x61's band/scoring blocks extracted to the shared
    # lsh_band_rows/lsh_index_match kernels (now also s26's) — plan-equal
    # by construction, re-hash to prove it
    "x61_incremental_minhash_dedup",
}


def _priority_order(names) -> list[str]:
    """Three evidence tiers, driver-sample-aware: (0) names with no green
    driver row in any on-disk CORRECTNESS file (highest divergence risk —
    new registrations land here automatically), (1) certified names whose
    code changed this round (_RECERT_FILLERS), (2) every other certified
    name ordered OLDEST certification first (VERDICT r7 item 4: with all
    names certified, the 50-slot window is pure re-certs — spend it on
    the rows whose last green is most stale against the fixture
    regenerations, r01/r02 certs being 6+ rounds old). Stable
    (registration) order breaks ties. The driver samples the FIRST 50
    names; because every uncertified name outranks every certified one,
    fillers can never waste a slot a never-certified query could have
    used."""

    def key(n: str):
        if n not in _CERTIFIED:
            return (0, "")
        if n in _RECERT_FILLERS:
            return (1, "")
        # filename sorts by round: CORRECTNESS_r01.json < ..._r07.json
        return (2, _CERT_RECENCY.get(n, ""))

    return sorted(names, key=key)


def all_queries() -> dict[str, QueryFn]:
    # import for registration side effects
    from smfg_datawarehouse_spark.operators import register_all  # noqa: F401

    register_all()
    return {n: _QUERIES[n] for n in _priority_order(_QUERIES)}


def all_oracles() -> dict[str, str]:
    from smfg_datawarehouse_spark.operators import register_all  # noqa: F401

    register_all()
    return {n: _ORACLES[n] for n in _priority_order(_ORACLES)}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Ensure the determinism confs on THIS session. ``session.get_spark``
    owns them for engine-built sessions; this check-then-set exists for
    externally-built sessions (the correctness driver constructs its own
    SparkSession). Keyed on the live conf VALUE, not an applicationId
    memo: ``spark.newSession()`` shares the application but not the
    SQLConf, and a caller may reset the timezone between queries — a memo
    would silently skip re-pinning and shift every date_trunc/window
    result against the zone-naive oracle. Two conf reads per table load
    are sub-millisecond.

    The reads use NO fallback default: Spark 4 VALIDATES an explicit
    ``conf.get(key, default)`` default against the conf's type, so a
    sentinel like ``""`` throws INVALID_CONF_VALUE in any session that
    hasn't explicitly set the key (exactly the externally-built driver
    session this guard exists for). Both keys always have an effective
    engine default, so the no-default read cannot miss; the bare except
    turns any future read quirk into a re-pin instead of a crash."""
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        nanos = None
    if nanos != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


#: Per-(application, sf_dir, table) memo of the fixture tables' parquet
#: SCHEMAS (r9 optimization). ``spark.read.parquet(path)`` re-infers the
#: schema on every call — a driver-side footer read + file listing
#: measured at ~200 ms/call on this host (and ~0.5 s on the first action
#: against the fresh relation); with ~340 queries × 3 bench repeats ×
#: 1-4 table loads each, inference alone costs tens of seconds per
#: suite. Production tables carry their schema in a catalog/metastore —
#: re-deriving it per query is exactly the driver-side metadata work
#: guide §5/§6 says to keep off the hot path. The memo stores ONLY the
#: StructType (never data, never a DataFrame): every action still scans
#: the parquet files cold. Keyed on applicationId so an external driver
#: session can never see a stale entry from a previous app.
_TABLE_SCHEMA_MEMO: dict[tuple[str, str, str], object] = {}


def _memo_schema(key: tuple[str, str, str], schema) -> None:
    """Store a DEFENSIVE COPY in the memo. ``df.schema`` is the caller's
    live (mutable) StructType — aliasing it means any caller-side
    ``schema.add(...)`` silently widens every later memoized read of the
    table (observed: s26's arrival-count read)."""
    from pyspark.sql.types import StructType

    _TABLE_SCHEMA_MEMO[key] = StructType.fromJson(schema.jsonValue())


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (column-pruned / filter-pushed by Catalyst).

    Requires a UTC session timezone (owned by ``session.get_spark``;
    ensured once per application for externally-built sessions): event
    timestamps surface as TIMESTAMP_LTZ, so date_trunc/window/year
    results would otherwise depend on the caller session's zone — the
    DuckDB oracle is zone-naive and expects UTC semantics.

    Schema-defensiveness note: for every table except ``events`` the
    DuckDB oracle reads the SAME parquet files, so Spark and the oracle
    cannot drift apart on a fixture re-encoding — no normalization is
    needed (and casting here would *break* parity by changing only
    Spark's side). ``events`` is the exception because one historical
    encoding (INT64 nanos) is unreadable by Spark's vectorized reader;
    ``load_events`` branches on the observed dtype. The schema memo
    (:data:`_TABLE_SCHEMA_MEMO`) preserves that defensiveness: the
    schema is still OBSERVED from the files on first load per
    application — it is just not re-inferred on every subsequent load.
    """
    _ensure_session_confs(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    schema = _TABLE_SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _memo_schema(key, df.schema)
        return df
    return spark.read.schema(schema).parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-defensive events loader: normalize ``ts`` to TIMESTAMP however
    the fixture encodes it.

    Fixture generations have stored ``ts`` as either parquet INT64
    TIMESTAMP(NANOS) (which Spark's vectorized reader rejects with
    [PARQUET_TYPE_ILLEGAL] unless read as raw long) or plain
    ``timestamp[us]``. Branch on the *observed* dtype rather than assuming
    an encoding, so a fixture regeneration can never invalidate every
    events query again:

    - LongType  → treat as epoch nanos, truncate to micros (matches DuckDB's
      TIMESTAMP_NS cast truncation, keeping oracle comparisons exact).
    - Timestamp(_NTZ) → pass through (cast unifies NTZ vs LTZ; session TZ is
      pinned to UTC in ``t()`` so semantics are identical).
    """
    from pyspark.sql.types import LongType

    _ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    key = (spark.sparkContext.applicationId, sf_dir, "events")
    schema = _TABLE_SCHEMA_MEMO.get(key)
    if schema is None:
        raw = spark.read.parquet(path)
        _memo_schema(key, raw.schema)
    else:
        raw = spark.read.schema(schema).parquet(path)
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def dsum(col: F.Column) -> F.Column:
    """Deterministic float SUM: exact decimal accumulation, double result."""
    return F.sum(col.cast("decimal(30,6)")).cast("double")


def davg(col: F.Column) -> F.Column:
    """Deterministic float AVG matching `CAST(SUM(DECIMAL) AS DOUBLE)/COUNT`."""
    return F.sum(col.cast("decimal(30,6)")).cast("double") / F.count(F.lit(1))


#: Per-session memo of the seeded fixture catalog's compiled artifacts.
#: Config compilation is once-per-engine-run by contract (the reference
#: compiles its extraction SQL once per DAG run, not per task) — queries
#: sharing the fixture catalog should share the compiled plans instead of
#: re-running the metadata joins + dialect parse on every invocation.
_FIXTURE_COMPILE_CACHE: dict[str, tuple] = {}


def fixture_plans(spark: SparkSession):
    """(catalog, {full_table_name: ExtractionPlan}, output_mapping_plan(1))
    for the seeded fixture catalog, compiled once per Spark application."""
    from smfg_datawarehouse_spark.catalog import seed_fixture_catalog
    from smfg_datawarehouse_spark.compiler import compile_extraction_plans
    from smfg_datawarehouse_spark.transform import output_mapping_plan

    key = spark.sparkContext.applicationId
    if key not in _FIXTURE_COMPILE_CACHE:
        cat = seed_fixture_catalog(spark)
        plans = {p.full_table_name: p for p in compile_extraction_plans(cat)}
        _FIXTURE_COMPILE_CACHE[key] = (cat, plans, output_mapping_plan(cat, 1))
    return _FIXTURE_COMPILE_CACHE[key]


def _scratch_path(spark: SparkSession, tag: str) -> str:
    """The per-(application, tag) scratch PATH, without touching the
    filesystem — callers that must inspect or tear down the PREVIOUS
    invocation's state before it is cleared (l14 shuts down the booted
    Derby DB living here) use this so the location can never drift from
    what ``_scratch_dir`` clears."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"sgraft_{tag}_{spark.sparkContext.applicationId}",
    )


def _scratch_dir(spark: SparkSession, tag: str) -> str:
    """Per-(application, tag) scratch directory for the lifecycle queries
    (l01/l02/l03): the PREVIOUS invocation's output is removed before the
    new one starts, so repeated runs (bench repeats, driver passes) can't
    accumulate orphaned lake/audit dirs in /tmp. Consequence, documented:
    re-invoking a lifecycle query invalidates DataFrames still lazily
    reading the prior invocation's files — materialize before re-running.
    """
    import shutil

    path = _scratch_path(spark, tag)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


# SQL fragment helpers for the DuckDB oracle side
def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def _davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)"



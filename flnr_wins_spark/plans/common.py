"""Query registry + determinism helpers.

Every engine capability gets a named entry: a PySpark implementation
``fn(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) an ANSI-SQL
twin the DuckDB oracle runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value-hash, so:

  * every computed column is aliased identically on both sides;
  * double aggregations go through exact DECIMAL arithmetic then cast back to
    DOUBLE (order-insensitive => bit-identical across engines);
  * integer-width types are cast explicitly (DuckDB len()/row_number() return
    BIGINT; Spark's size()/row_number() return INT — we standardize);
  * every ORDER BY carries a unique-key tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None  # DuckDB oracle; None => rows-only check
    note: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, sql: str | None = None, note: str = "", bench: bool = False, tags: tuple[str, ...] = ()):
    """Register a query/operator entry."""

    def deco(fn):
        _REGISTRY[name] = QueryDef(name=name, fn=fn, sql=sql, note=note, bench=bench, tags=tags)
        return fn

    return deco


# Grading priority: the driver evaluates queries() in registration order under
# a budget of ~50 entries/round, so entries that most need a fresh
# driver-graded correctness row go first. ROUND-16 ordering, recomputed BY
# SCRIPT from the CORRECTNESS_r01-r15 artifacts (the standing discipline —
# never hand-kept arithmetic):
# (a) positions 1-23: this round's code-changed entries — the new
#     x_dedup_minhash_r2_equiv equivalence witness (never graded), the
#     qa_reserves fuse (wins_e2e pair + r7), the quality_rules keep=
#     passthrough + pushdown-barrier fix (x_llm_corpus_e2e), the
#     Arrow-boundary spreads (x_text_langid/x_text_nfc), the bm25_topk
#     empty-terms guard (5 search entries), the _fit_conf scoping
#     (6 kmeans/pq entries), and spread-consolidation representatives
#     (minhash trio, topk, dhash);
# (b) positions 24-39: the 16 stalest entries — last graded in ROUND 7
#     (q_set_ops .. x_text_tokenize_bpe, alphabetical) — drains r07
#     completely;
# (c) positions 40-50: the first 11 of the 34-entry r09 cohort,
#     alphabetical; the remaining 23 lead the next round's fill, then
#     r10 (32), r11 (26), r12 (42), r13 (32), r14 (41), r15 (50).
# Names absent from this list follow in import order.
_GRADE_FIRST: tuple[str, ...] = (
    "x_dedup_minhash_r2_equiv", "wins_e2e_rejects", "wins_e2e_kept",
    "r7_reject_duplicates", "x_llm_corpus_e2e", "x_text_langid",
    "x_text_nfc", "x_search_bm25", "x_search_bm25_persisted",
    "x_search_bm25_incremental", "x_search_e2e", "x_search_hybrid_rrf",
    "x_semdedup", "x_similarity_pq", "x_pq_recall",
    "x_similarity_ivf_kmeans", "x_similarity_ivf_persisted", "x_ivf_recall",
    "x_dedup_minhash_lsh", "x_dedup_minhash_portable", "x_dedup_minhash_estimate",
    "x_similarity_topk", "x_multimodal_dhash_dedup", "q_set_ops",
    "q_stats_derived", "q_union_distinct", "x_bucketed_join",
    "x_cdc_diff", "x_corpus_resample", "x_corpus_shard",
    "x_corpus_stats", "x_cusum_changepoint", "x_dedup_spans",
    "x_doc_chunking", "x_holt_forecast_grouped", "x_merge_upsert",
    "x_quality_rules", "x_scd2_history", "x_text_tokenize_bpe",
    "q10_returned_items", "q11_important_value", "q12_shipping_delay",
    "q2_min_cost_supplier", "q4_order_priority", "q7_volume_shipping",
    "q8_national_market_share", "q9_product_type_profit", "q_array_functions",
    "q_asof_tolerance", "q_events_approx_distinct", "q_stream_minhash_gate_compacted",
    "q_stream_minhash_gate", "q_stream_dedup_gate", "x_similarity_int8",
    "x_similarity_binary", "x_similarity_ivf", "x_similarity_ann_lsh",
    "x_similarity_ann_portable", "x_ann_recall", "x_dedup_clusters",
    "x_dedup_clusters_star", "x_knn_classify", "x_hard_negatives",
    "x_rag_retrieve", "x_mmr_rerank", "x_embedding_neardup",
    "x_fuzzy_join", "x_golden_record", "x_multimodal_audio_dedup",
    "x_multimodal_video_dedup", "x_multimodal_decode", "x_multimodal_gif_decode",
    "x_multimodal_video_frames", "x_multimodal_features", "x_multimodal_frames",
    "x_pagerank", "q18_large_volume_customer", "q21_suppliers_kept_waiting",
    "x_ptable_cdc_e2e", "x_ptable_incremental_mv", "x_grid_skew_join",
    "x_grid_skew_left", "x_grid_skew_full", "x_grid_skew_right",
    "x_auto_skew_join", "x_skew_sidecar_join", "x_right_hot_left_join",
    "x_pii_redact", "x_quantile_bottomk", "x_rank_metrics",
    "x_rerank_cross", "x_robust_scale", "x_sample_stratified",
    "x_seasonal_decompose", "x_seq_packing", "x_target_encode",
    "x_text_fingerprint", "x_text_quality", "x_text_stats",
    "x_train_test_split", "x_weighted_sample", "q13_customer_distribution",
    "q14_promo_effect", "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q19_discounted_revenue", "q20_potential_promotion",
    "q22_global_sales_opportunity", "q_asof_join", "q_cube_orders",
    "q_date_functions", "q_distinct_agg", "q_exists_subquery",
    "q_explode_tokens", "q_grouping_sets", "q_having",
    "q_percentile", "q_pivot_status", "q_scalar_functions",
    "q_lateral_topn", "q_listagg", "q_null_safe_join",
    "q_recursive_calendar", "q_skew_salted_join", "q_source_roundtrip",
    "q_unpivot_metrics", "q_window_fill_forward", "q_window_time_range",
    "r1_append_no_test", "r2_conditional_update", "r3_blank_to_null",
    "r4_enrich_left_join", "r6_frequency", "r8_reject_unmatched",
    "x_advisor_colocated", "x_bloom_prefilter", "x_countmin",
    "x_dedup_simhash", "x_holt_forecast", "x_kfold_split",
    "x_repetition_stats", "x_vocab_topk", "q_events_histogram",
    "q_events_interpolate", "q_map_functions", "x_advisor_estimate",
    "x_attribution_last_touch", "x_bigram_lm_quality", "x_bpe_train",
    "x_classify_nb_langid", "x_dedup_containment", "x_dedup_index_incremental",
    "x_dedup_url", "x_embedding_stats", "x_equidepth_bins",
    "x_funnel_counts", "x_global_rank", "x_group_topk_sample",
    "x_incremental_agg", "x_multimodal_audio_chunks", "x_outlier_events",
    "x_packed_sequences", "x_partition_bounds_advisor", "x_ptable_dpp_join",
    "x_ptable_join_advisor", "x_ptable_time_travel", "x_ptable_zonemap_prune",
    "x_ptable_zorder_optimize", "x_retention_cohorts", "x_token_bigrams",
    "x_unigram_quality", "x_url_canonicalize", "x_winsorize",
    "x_zorder_layout", "q_events_interval_join", "x_advisor_auto_read",
    "x_classify_perceptron", "x_compaction_plan", "x_correlation_matrix",
    "x_dedup_simhash_portable", "x_dedup_tfidf", "x_dq_expectations",
    "x_event_paths", "x_group_regression", "x_jdbc_snapshot",
    "x_k_anonymity", "x_kcore", "x_keywords_tfidf",
    "x_multimodal_audio_decode", "x_multimodal_mulaw_decode", "x_multimodal_qoi_decode",
    "x_pandas_udaf_median", "x_pit_join", "x_profile_columns",
    "x_rolling_zscore", "x_search_phrase", "x_sorted_neighborhood",
    "x_tokenize_maxmatch", "x_triangle_count", "x_user_streaks",
    "q_events_json", "q_events_multires_rollup", "q_events_tumbling",
    "q_stream_drift_psi", "q_stream_incremental_agg", "q_stream_kmv_sketch",
    "q_stream_lakehouse_merge", "q_stream_outer_join", "q_stream_quantile_sketch",
    "q_stream_stateful_funnel", "q_stream_watermark", "x_ab_test",
    "x_attribution_linear", "x_binaryfile_ingest", "x_churn_training_set",
    "x_cooccur_pmi", "x_corpus_mixture", "x_distinct_kmv",
    "x_events_m4", "x_geo_geohash", "x_geo_knn",
    "x_graph_bfs", "x_html_strip", "x_impute_nulls",
    "x_incremental_join", "x_join_size_estimate", "x_kmv_set_ops",
    "x_multimodal_adpcm_decode", "x_multimodal_jpeg_decode", "x_multimodal_jpeg_progressive",
    "x_multimodal_palette_png_decode", "x_multimodal_png_decode", "x_quality_filter_pipeline",
    "x_random_projection", "x_recommend_itemknn", "x_skew_report",
    "x_stream_lakehouse_prune", "x_time_to_convert", "x_tokenize_optimal",
    "x_trajectory_similarity", "x_warc_ingest", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume", "q6_revenue_forecast",
    "q_events_dedup", "q_events_late_data", "q_events_sessionize",
    "q_events_sliding", "q_rollup_acctbal", "q_string_functions",
    "q_topk_per_group", "q_window_range_frame", "q_window_rank_family",
    "q_window_running", "x_benford_audit", "x_decontam",
    "x_dedup_exact", "x_dedup_ngram_jaccard", "x_dp_counts",
    "x_drift_psi", "x_embedding_covariance", "x_embedding_pca",
    "x_fd_check", "x_geo_grid_join", "x_kaplan_meier",
    "x_merge_evolve", "x_multimodal_bytes", "x_ptable_bloom_point",
    "x_ptable_metadata_counts", "x_ptable_ndv", "x_tokenize_unigram",
    "x_url_filter",
)

def all_queries() -> dict[str, QueryDef]:
    """Import all plan modules and return the registry in grading-priority
    order (see ``_GRADE_FIRST``)."""
    import flnr_wins_spark.plans.analytics  # noqa: F401
    import flnr_wins_spark.plans.events  # noqa: F401
    import flnr_wins_spark.plans.extensions  # noqa: F401
    import flnr_wins_spark.plans.parity  # noqa: F401
    import flnr_wins_spark.plans.relational  # noqa: F401
    import flnr_wins_spark.plans.tpch  # noqa: F401

    ordered = {n: _REGISTRY[n] for n in _GRADE_FIRST if n in _REGISTRY}
    ordered.update({n: qd for n, qd in _REGISTRY.items() if n not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# Scratch space for entries that materialize a table/index per invocation
# ---------------------------------------------------------------------------

_SCRATCH_ROOT: str | None = None
_SCRATCH_RUNS: dict[str, int] = {}


def scratch_dir(name: str) -> str:
    """A fresh VERSIONED scratch directory per entry invocation
    (``<root>/<name>/run-N``), with a one-run grace window.

    Graded entries that write a ptable / snapshot / index used to
    ``mkdtemp`` per invocation; bench runs min-of-2 and the grader
    re-runs entries every round, so each round leaked multiple full
    copies of orders/customer under /tmp. Versioned subdirs cap the
    footprint at TWO copies per entry (run N-1 survives until run N+1
    starts) while fixing the wipe-on-re-entry hazard: entries return
    LAZY DataFrames that still read from scratch, so wiping the dir the
    previous invocation's result points at would silently serve
    wiped/rewritten data to any deferred evaluation. With the grace
    window, the single-flight pattern every harness uses (consume run
    N's result before invoking run N+1) is safe by construction, and a
    two-generations-stale DataFrame fails LOUDLY (file-not-found)
    instead of returning wrong rows. The whole root is removed at
    interpreter exit (``atexit``)."""
    global _SCRATCH_ROOT
    import atexit
    import os
    import shutil
    import tempfile

    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="flnr_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    n = _SCRATCH_RUNS.get(name, 0) + 1
    _SCRATCH_RUNS[name] = n
    shutil.rmtree(
        os.path.join(_SCRATCH_ROOT, name, f"run-{n - 2}"), ignore_errors=True
    )
    d = os.path.join(_SCRATCH_ROOT, name, f"run-{n}")
    os.makedirs(d)
    return d


_FIXTURES: dict[tuple[str, str], str] = {}


def cached_fixture(name: str, sf_dir: str, builder) -> str:
    """Build-once-per-process fixture directory keyed by (name, sf_dir);
    ``builder(dir)`` materializes it on first use and re-invocations
    REUSE the built artifact.

    For entries whose fixture is a PURE function of the input tables
    (same sf_dir => bit-identical fixture: ptable commits with sidecars,
    snapshot layouts), rebuilding it per invocation conflates fixture
    setup with the operator under test — r8's bench charged two full
    ptable commits to a join-advisor probe whose own cost is
    milliseconds. With the cache, bench's min-of-2 measures the probe on
    the second run and the driver's re-grades stop paying N commits per
    probe. Entries whose COMMITS are the behavior under test (CDC
    sequences, incremental refreshes) must keep using
    :func:`scratch_dir` — their fixture mutation is the point.

    The directory lives under the scratch root (atexit-cleaned); a hash
    of the FULL sf_dir path rides the scratch NAME so two distinct
    sf_dirs can never alias one name — each (name, sf_dir) pair owns its
    own run counter, it only ever reaches run-1, and the versioned-run
    GC (which deletes run N-2 of the SAME name) can never reclaim a
    cached build."""
    import hashlib
    import os

    key = (name, sf_dir)
    if key not in _FIXTURES:
        tag = hashlib.md5(
            os.path.abspath(sf_dir).encode()
        ).hexdigest()[:10]
        d = scratch_dir(f"{name}@{tag}")
        builder(d)
        _FIXTURES[key] = d
    return _FIXTURES[key]


def fixture_path(name: str, sf_dir: str) -> str:
    """The directory :func:`cached_fixture` built for ``(name, sf_dir)``
    in THIS process — for tests that must inspect the fixture an entry
    just read (plan contracts reconstruct pruning stats from it).
    Raises KeyError if the entry has not run yet."""
    return _FIXTURES[(name, sf_dir)]


# ---------------------------------------------------------------------------
# Determinism helpers
# ---------------------------------------------------------------------------

def dsum(col: Column, scale: int = 2, prec: int = 27) -> Column:
    """Order-insensitive double sum: route through exact decimal arithmetic.

    ``SUM(double)`` is order-dependent in IEEE754 — different partitionings
    give different last bits. Casting each row to DECIMAL makes the sum exact
    and therefore identical across Spark and DuckDB; the final cast back to
    DOUBLE is a single deterministic conversion. Cost at scale: decimal sum is
    marginally slower than double sum but stays in whole-stage codegen.
    """
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 2, prec: int = 27) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from flnr_wins_spark.sources import read_table

    return read_table(spark, sf_dir, name)

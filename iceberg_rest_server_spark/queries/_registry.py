"""Query registry: every implemented operator from SURVEY.md §2 registers
itself here with (a) a PySpark callable (spark, sf_dir) -> DataFrame and
(b) an equivalent ANSI-SQL oracle string runnable by DuckDB over the same
parquet tables (None for genuinely non-SQL-expressible ops — the driver
then records a weaker rows-only check).

Column names of the Spark result and the oracle MUST match: the driver
sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The driver's per-round correctness run evaluates queries() in dict
# order and covers a bounded prefix (the first 50 entries) per round.
# ROTATION POLICY (pinned since r8, VERDICT r7 #1): the window is spent
# on (1) entries with NO driver evidence yet, (2) entries whose code or
# oracle changed since their last green row, then (3) the STALEST
# recorded evidence first.
# r11 WINDOW (exactly 50): no no-evidence entries. The r11 code
# changes (ADVICE r10) are all in the catalog MANAGEMENT layer
# (server.py/store.py: warehouse-status inclusion filter, credential
# detach on storage update, 400s on malformed bodies) — no registry
# query operator changed, but per the pinned policy the catalog-
# surface entries whose execution path crosses the changed store code
# (q34/q82/q83 e2e family; q141 Python Data Source) lead their
# cohorts. The window is the entire 34-entry r05-stale cohort
# (recomputed from CORRECTNESS_r01..r10; matches VERDICT r10 #1) +
# the first 16 of the 46-entry r07 cohort (equal staleness —
# alphabetical tie-break). After r11 the oldest evidence anywhere is
# r07 (30 entries). Whole-registry re-check: tools/driver_sim.py,
# recorded in PARITY.md.
# Every entry is always returned — ordering only, never selection.
_DRIVER_ORDER_HEAD = [
    # --- (1) code changed in r11: cosine_neardup_pairs_blocked gained
    # a score-matrix cap (similarity.py target_score_bytes; blocks stays
    # 2 at registry scale so results/plans are unchanged — but per the
    # pinned policy the 2 entries sharing the operator re-run) ---
    "q35_cosine_neardup_pairs",
    "q59_semantic_dedup",
    # --- (2) the 34-entry r05-stale cohort; catalog-surface entries
    # (store.py changed in r11) first, then alphabetical ---
    "q34_catalog_end_to_end",
    "q82_merge_upsert",
    "q83_row_level_delete",
    "q07_inner_join",
    "q08_broadcast_join",
    "q09_multiway_join",
    "q111_hll_union_rollup",
    "q127_kmeans_clustering",
    "q129_scd2_reconstruction",
    "q130_interval_concurrency",
    "q131_markov_transitions",
    "q132_rfm_segmentation",
    "q133_hard_negative_mining",
    "q135_time_weighted_average",
    "q136_cooccurrence_similarity",
    "q137_observed_metrics",
    "q138_quantile_bucket_scores",
    "q139_xml_roundtrip",
    "q142_zscore_outliers",
    "q143_basket_affinity",
    "q144_theta_set_operations",
    "q145_kll_quantile_rollup",
    "q14_asof_join",
    "q15_rollup",
    "q16_window_ranking",
    "q18_topk",
    "q31_exact_dedup",
    "q32_minhash_lsh_pairs",
    "q36_ann_lsh_topk",
    "q38_ann_ivf_topk",
    "q63_tpch_q1",
    "q69_tpch_q8",
    "q74_tpch_q17",
    "q88_cms_heavy_hitters",
    # --- (3) fills: first 14 of the 46-entry r07 cohort (q141 first:
    # its path crosses the changed catalog store; q158/q159 displaced
    # to r12 by the two changed-operator entries above) ---
    "q141_python_datasource",
    "q126_pmi_collocations",
    "q128_edit_distance_join",
    "q146_bigram_lm_perplexity",
    "q147_bm25_topk",
    "q148_vocab_growth",
    "q149_skipgram_associations",
    "q150_winsorized_stats",
    "q151_embedding_dim_audit",
    "q153_join_key_skew_profile",
    "q154_eval_quota_sample",
    "q155_intradoc_repeat_collapse",
    "q156_analyze_column_stats",
    "q157_triangle_count",
    # --- below here falls outside the 50-entry window ---
    # the remaining 32 r07 entries lead the r12 window unless
    # displaced by r12 changes
    "q158_linear_interpolation",
    "q159_bpe_merge_candidates",
    "q160_lateral_topk_per_group",
    "q161_recursive_cte_hierarchy",
    "q162_stream_stream_left_outer",
    "q163_except_all",
    "q163_intersect_all",
    "q164_auc_rank_sum",
    "q165_chi_squared_independence",
    "q167_ewma_bounded",
    "q168_spatial_grid_join",
    "q169_event_pattern_match",
    "q170_calibration_bins",
    "q171_stream_stream_full_outer",
    "q173_threshold_sweep",
    "q174_rolling_anomaly_flags",
    "q175_lagged_cross_correlation",
    "q176_bfs_levels",
    "q177_ordered_listagg",
    "q178_bitmap_distinct_rollup",
    "q179_weighted_median",
    "q180_ab_test_zscore",
    "q181_filtered_aggregates",
    "q182_null_safe_join",
    "q183_union_by_name",
    "q184_try_cast_hygiene",
    "q185_bootstrap_ci",
    "q186_curriculum_interleave",
    "q187_reciprocal_rank_fusion",
    "q188_seasonality_strength",
    "q29_stream_tumbling_window",
    "q32_simhash_pairs",
    "q140_stream_transform_with_state",  # registers only where protobuf exists
]


def _driver_ordered() -> list[str]:
    head = [n for n in _DRIVER_ORDER_HEAD if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(head)]
    return head + rest


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _driver_ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _driver_ordered()
        if REGISTRY[name].oracle is not None
    }

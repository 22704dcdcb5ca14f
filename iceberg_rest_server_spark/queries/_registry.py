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


# The driver's per-round correctness run evaluates queries() in dict order
# and covers a bounded prefix (the first 50 entries) per round. Cumulative
# driver coverage through r5 is all 164 then-existing entries green; the
# r6 driver pass was not recorded (no CORRECTNESS_r06.json), so the
# round-7 window front-loads everything with no driver row yet, in
# order: (1) the 27 entries new in r7 (model-eval tier Q163-Q170,
# Q173-Q175, Q185, Q188, streaming full-outer/sliding Q171-Q172, BFS
# Q176, Spark-4 aggregate/SQL surface Q177-Q184, curriculum Q186, RRF
# Q187), (2) the 17 entries new in r6 (corpus-modeling Q146-Q150,
# curation-QA Q151-Q154, pipeline-hygiene Q155-Q159, LATERAL/
# recursive-CTE Q160-Q161, stream-stream left-outer Q162), (3) entries
# whose code or oracle changed after their last green row (q32_simhash's
# md5-exact oracle, the q126/q96 perf work, the q128 blocking-key
# coalesce, the Data Source fixes behind q141), then (4) streaming
# regression cover and (5) stale-evidence refresh, of which only
# q29_stream fits: 27+17+5 = 49 entries from (1)-(3) leave one slot in
# the 50-window. Everything beyond the window is unchanged code with
# cumulative r01-r05 green rows. Every entry is always returned —
# ordering only, not selection. (tools/driver_sim.py checks the WHOLE
# registry each round regardless; its r7 runs were all-green at 190,
# 195, 198, 204, 205, 206, 207 and 208 entries as the tiers landed.)
_DRIVER_ORDER_HEAD = [
    # --- (1) new in r7 ---
    "q163_intersect_all",
    "q163_except_all",
    "q164_auc_rank_sum",
    "q165_chi_squared_independence",
    "q166_pca_top_components",
    "q167_ewma_bounded",
    "q168_spatial_grid_join",
    "q169_event_pattern_match",
    "q170_calibration_bins",
    "q171_stream_stream_full_outer",
    "q172_stream_sliding_window",
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
    # --- (2) new in r6 ---
    "q146_bigram_lm_perplexity",
    "q147_bm25_topk",
    "q148_vocab_growth",
    "q149_skipgram_associations",
    "q150_winsorized_stats",
    "q151_embedding_dim_audit",
    "q152_cluster_safe_split",
    "q153_join_key_skew_profile",
    "q154_eval_quota_sample",
    "q155_intradoc_repeat_collapse",
    "q156_analyze_column_stats",
    "q157_triangle_count",
    "q158_linear_interpolation",
    "q159_bpe_merge_candidates",
    "q160_lateral_topk_per_group",
    "q161_recursive_cte_hierarchy",
    "q162_stream_stream_left_outer",
    # --- (3) code or oracle changed since last green row ---
    "q32_simhash_pairs",
    "q126_pmi_collocations",
    "q96_pagerank_canonical",
    "q128_edit_distance_join",
    "q141_python_datasource",
    # --- (4) streaming regression cover ---
    "q29_stream_tumbling_window",
    "q30_stream_session_window",
    "q134_stream_cdc_upsert",
    # --- (5) stalest evidence: last green r01 ---
    "q33_lang_id",
    "q33_fingerprint",
    "q33_top_terms",
    # --- (5) stalest evidence: last green r02 ---
    "q02_filter",
    "q04_global_aggregate",
    "q05_distinct_aggregate",
    "q10_left_outer_join",
    "q11_left_semi_join",
    "q12_left_anti_join",
    "q13_theta_join",
    "q15_cube",
    "q15_grouping_sets",
    "q17_window_frames",
    "q19_except",
    "q19_intersect",
    "q19_union_all",
    "q19_union_distinct",
    "q20_string_functions",
    "q21_date_functions",
    "q22_math_functions",
    "q23_array_map_json",
    "q23_explode_json",
    "q24_conditional_null",
    "q25_correlated_subquery",
    # --- below here typically falls outside the 50-entry window ---
    "q25_subqueries",
    "q26_cte",
    "q27_udf_parity",
    "q28_grouped_pandas_udaf",
    "q49_dedup_clusters",
    "q54_full_outer_join",
    "q55_window_navigation",
    "q61_grouping_id",
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

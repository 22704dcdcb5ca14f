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
# r12 WINDOW (exactly 50): no no-evidence entries and no r12 query-
# operator code changes (r12 changes are bench/scaling tooling and
# docs only), so the window is pure staleness: the ENTIRE 32-entry
# r07-stale cohort (recomputed from CORRECTNESS_r01..r11; matches
# VERDICT r11 #3 name-for-name) + the first 18 of the 48-entry r08
# cohort (equal staleness — alphabetical tie-break). After r12 the
# oldest evidence anywhere becomes r08 (30 entries). Whole-registry
# re-check: tools/driver_sim.py, recorded in PARITY.md.
# Every entry is always returned — ordering only, never selection.
_DRIVER_ORDER_HEAD = [
    # --- (1) the 32-entry r07-stale cohort, alphabetical (q158/q159
    # were displaced from the r11 window by the changed-operator
    # entries; the rest is the r07 tail in its pinned order) ---
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
    # --- (2) fills: first 18 of the 48-entry r08 cohort,
    # alphabetical ---
    "q02_filter",
    "q04_global_aggregate",
    "q05_distinct_aggregate",
    "q10_left_outer_join",
    "q11_left_semi_join",
    "q12_left_anti_join",
    "q13_theta_join",
    "q140_processor_logic_batch",
    "q15_cube",
    "q15_grouping_sets",
    "q166_pca_top_components",
    "q172_stream_sliding_window",
    "q17_window_frames",
    "q189_stable_row_ids",
    "q190_ohlc_bars",
    "q191_benford_deviation",
    "q192_fk_integrity_audit",
    "q193_inverted_index_postings",
    # --- below here falls outside the 50-entry window ---
    # the remaining 30 r08 entries lead the r13 window unless
    # displaced by r13 changes (alphabetical)
    "q194_ks_two_sample",
    "q195_gini_concentration",
    "q196_running_distinct_users",
    "q197_activity_streaks",
    "q199_multitouch_attribution",
    "q19_except",
    "q19_intersect",
    "q19_union_all",
    "q19_union_distinct",
    "q200_percentile_rank_transform",
    "q201_priority_sample",
    "q202_ngram_novelty",
    "q203_sliding_distinct_users",
    "q20_string_functions",
    "q21_date_functions",
    "q22_math_functions",
    "q23_array_map_json",
    "q23_explode_json",
    "q24_conditional_null",
    "q25_correlated_subquery",
    "q25_subqueries",
    "q26_cte",
    "q27_udf_parity",
    "q28_grouped_pandas_udaf",
    "q33_fingerprint",
    "q33_lang_id",
    "q33_top_terms",
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

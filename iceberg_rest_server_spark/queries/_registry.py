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
# r13 WINDOW (exactly 50): no no-evidence entries and no r13 query-
# operator code changes (r13 changes are bench/scaling/explain tooling,
# tests and docs only), so the window is pure staleness: the ENTIRE
# 30-entry r08-stale cohort (recomputed from CORRECTNESS_r01..r12;
# matches VERDICT r12 #1 name-for-name) + the first 20 of the 47-entry
# r09 cohort (equal staleness — alphabetical tie-break). After r13 the
# oldest evidence anywhere becomes r09 (27 entries). Whole-registry
# re-check: tools/driver_sim.py, recorded in PARITY.md.
# Every entry is always returned — ordering only, never selection.
_DRIVER_ORDER_HEAD = [
    # --- (1) the 30-entry r08-stale cohort, alphabetical ---
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
    # --- (2) fills: first 20 of the 47-entry r09 cohort,
    # alphabetical ---
    "q115_stream_ingest_dedup",
    "q134_stream_cdc_upsert",
    "q15_sliding_window",
    "q198_char_entropy",
    "q204_array_fold_kernels",
    "q205_regex_extraction",
    "q206_bitwise_aggregates",
    "q23_get_json",
    "q30_stream_session_window",
    "q33_bpe_token_count",
    "q33_quality_score",
    "q33_tfidf_top_terms",
    "q33_token_stats",
    "q36_ann_bruteforce_topk",
    "q37_multimodal_frames",
    "q37_multimodal_metadata",
    "q39_stream_stateful_user_totals",
    "q43_sessionize_batch",
    "q44_pivot_profile",
    "q47_fuzzy_brand_pairs",
    # --- below here falls outside the 50-entry window ---
    # the remaining 27 r09 entries lead the r14 window unless
    # displaced by r14 changes (alphabetical)
    "q48_decontamination",
    "q50_repetition_quality",
    "q51_range_join",
    "q52_latest_by_key",
    "q53_domain_mixture",
    "q57_stream_static_enrich",
    "q58_stream_stream_join",
    "q60_embedding_centroids",
    "q62_stats_moments",
    "q64_tpch_q3",
    "q65_tpch_q4",
    "q66_tpch_q5",
    "q67_tpch_q6",
    "q68_tpch_q7",
    "q70_tpch_q10",
    "q71_tpch_q13",
    "q72_tpch_q14",
    "q73_tpch_q15",
    "q75_tpch_q18",
    "q76_tpch_q19",
    "q77_tpch_q22",
    "q78_pii_redaction",
    "q79_sequence_chunking",
    "q80_token_packing",
    "q81_epoch_shuffle",
    "q87_skyline",
    "q90_stream_catalog_sink",
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

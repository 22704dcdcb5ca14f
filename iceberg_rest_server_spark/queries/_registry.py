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
# driver coverage after r5 is all 164 entries, 163 green (q32_simhash was
# rows-only until its r6 exact oracle). The round-6 window prioritizes, in
# order: (1) entries whose code or oracle changed this round
# (q32_simhash's new md5-exact oracle, the q126/q96 perf work, the q128
# blocking-key coalesce, the Data Source fixes behind q141), (2) the
# stalest evidence — the 3 entries last green in r01 and all 29 last
# green in r02 (VERDICT r5 item 5: no entry's latest green row should be
# older than r04), (3) streaming regression cover (broke once in r02;
# keep warm every round), then (4) the oldest r03-era rows that fit.
# Every entry is always returned — this is ordering only, not selection.
_DRIVER_ORDER_HEAD = [
    # --- (0) new in r6: the curation-QA tier ---
    "q151_embedding_dim_audit",
    "q152_cluster_safe_split",
    "q153_join_key_skew_profile",
    "q154_eval_quota_sample",
    # --- (0) new in r6: the corpus-modeling tier ---
    "q146_bigram_lm_perplexity",
    "q147_bm25_topk",
    "q148_vocab_growth",
    "q149_skipgram_associations",
    "q150_winsorized_stats",
    # --- (1) code or oracle changed in r6 ---
    "q32_simhash_pairs",
    "q126_pmi_collocations",
    "q96_pagerank_canonical",
    "q128_edit_distance_join",
    "q141_python_datasource",
    # --- (2) stalest evidence: last green r01 ---
    "q33_lang_id",
    "q33_fingerprint",
    "q33_top_terms",
    # --- (2) stalest evidence: last green r02 (all 29) ---
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
    "q25_subqueries",
    "q26_cte",
    "q27_udf_parity",
    "q28_grouped_pandas_udaf",
    "q49_dedup_clusters",
    "q54_full_outer_join",
    "q55_window_navigation",
    "q61_grouping_id",
    # --- (3) streaming regression cover ---
    "q29_stream_tumbling_window",
    "q30_stream_session_window",
    "q134_stream_cdc_upsert",
    # --- (4) oldest remaining (r03-era) to fill the window ---
    "q15_sliding_window",
    "q23_get_json",
    "q33_bpe_token_count",
    "q33_quality_score",
    "q33_token_stats",
    "q35_cosine_neardup_pairs",
    "q36_ann_bruteforce_topk",
    "q37_multimodal_metadata",
    "q37_multimodal_frames",
    "q40_curation_pipeline",
    "q44_pivot_profile",
    "q47_fuzzy_brand_pairs",
    "q50_repetition_quality",
    "q51_range_join",
    # --- below here typically falls outside the 50-entry window ---
    "q52_latest_by_key",
    "q53_domain_mixture",
    "q59_semantic_dedup",
    "q60_embedding_centroids",
    "q62_stats_moments",
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

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
# driver coverage after r4 is all 146 entries (r1-r3: 97 unique green,
# r4: the 21 never-windowed + the q99-q126 tier, 50/50 green). The round-5
# window therefore prioritizes, in order: (1) entries added this round,
# (2) entries whose code or oracle changed this round, (3) entries whose
# oracle changed in r4 but rotated out before a driver run saw them
# (q06, q32_simhash), (4) the streaming regression class (broke once in
# r02 on replay-hash drift; keep warm every round), then (5) rotation of
# the oldest-coverage green entries (last windowed in r1) for regression
# cover. Every entry is always returned — this is ordering only, not
# selection.
_DRIVER_ORDER_HEAD = [
    # --- (1) new this round ---
    "q127_kmeans_clustering",
    "q128_edit_distance_join",
    "q129_scd2_reconstruction",
    "q130_interval_concurrency",
    "q131_markov_transitions",
    "q132_rfm_segmentation",
    "q133_hard_negative_mining",
    "q134_stream_cdc_upsert",
    "q135_time_weighted_average",
    "q136_cooccurrence_similarity",
    "q137_observed_metrics",
    "q138_quantile_bucket_scores",
    "q139_xml_roundtrip",
    "q140_stream_transform_with_state",  # registers only where protobuf exists
    "q141_python_datasource",
    "q142_zscore_outliers",
    "q143_basket_affinity",
    "q144_theta_set_operations",
    "q145_kll_quantile_rollup",
    # --- (2) code changed this round ---
    "q36_ann_lsh_topk",
    "q38_ann_ivf_topk",
    "q88_cms_heavy_hitters",
    "q96_pagerank_canonical",
    "q111_hll_union_rollup",
    # --- (3) oracle changed in r4, never driver-verified since ---
    "q06_approx_distinct",
    "q32_simhash_pairs",
    # --- (4) streaming regression cover ---
    "q29_stream_tumbling_window",
    "q30_stream_session_window",
    "q39_stream_stateful_user_totals",
    "q57_stream_static_enrich",
    "q58_stream_stream_join",
    "q90_stream_catalog_sink",
    "q115_stream_ingest_dedup",
    # --- (5) oldest-coverage rotation (r1-era rows; re-prove) ---
    # catalog plane + TPC-H flagships first: these must stay inside the
    # 50-entry window even as section (1) grows
    "q34_catalog_end_to_end",
    "q82_merge_upsert",
    "q83_row_level_delete",
    "q63_tpch_q1",
    "q69_tpch_q8",
    "q74_tpch_q17",
    "q01_scan_projection",
    "q03_hash_aggregate",
    "q07_inner_join",
    "q08_broadcast_join",
    "q09_multiway_join",
    "q14_asof_join",
    "q15_rollup",
    "q16_window_ranking",
    "q18_topk",
    "q31_exact_dedup",
    "q32_minhash_lsh_pairs",
    "q32_ngram_jaccard_pairs",
    "q33_tfidf_top_terms",
    "q35_cosine_neardup_pairs",
    "q40_curation_pipeline",
    "q43_sessionize_batch",
    "q47_fuzzy_brand_pairs",
    "q49_dedup_clusters",
    "q52_latest_by_key",
    "q27_udf_parity",
    # below here typically falls outside the 50-entry window — low-risk
    # r1-proven function/setop entries kept for ordering stability
    "q48_decontamination",
    "q28_grouped_pandas_udaf",
    "q19_intersect",
    "q20_string_functions",
    "q21_date_functions",
    "q22_math_functions",
    "q23_array_map_json",
    "q25_correlated_subquery",
    "q26_cte",
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

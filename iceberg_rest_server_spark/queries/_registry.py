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
# r10 WINDOW (exactly 50): no no-evidence entries (every one of the
# 227 has a green row). ONE r10 change touched registry query code:
# the exact-Jaccard verify cutover re-derivation (operators/dedup.py
# _BITMAP_MAX_GRAMS 8192→1024 + the SPARK_GRAFT_JACCARD_VERIFY
# measurement control), found when the r10 scaling study measured the
# inline-bitmap strategy inverting at 16x corpus scale. Results are
# strategy-independent (both verifies exact), but per the pinned
# policy the 6 entries sharing that operator re-run: q125 is already
# in the stale backlog below; the other 5 lead the window. Then the
# whole 42-entry r04-stale backlog (recomputed from
# CORRECTNESS_r01..r09; matches VERDICT r9 #1), then 3 next-stalest
# fills from the 38-entry r05 cohort (equal staleness — alphabetical
# tie-break). After r10 the oldest evidence anywhere is r05. Whole-
# registry re-check: tools/driver_sim.py, recorded in PARITY.md.
# Every entry is always returned — ordering only, never selection.
_DRIVER_ORDER_HEAD = [
    # --- (1) code changed in r10 (exact-Jaccard verify cutover) ---
    "q32_ngram_jaccard_pairs",
    "q40_curation_pipeline",
    "q49_dedup_clusters",
    "q96_pagerank_canonical",
    "q152_cluster_safe_split",
    # --- (2) stalest evidence: last green r04 (42 entries; includes
    # q125_quality_canonical, the 6th changed-operator entry) ---
    "q100_bloom_decontaminate",
    "q101_incremental_mv",
    "q102_tpch_q2",
    "q103_tpch_q9",
    "q104_tpch_q11",
    "q105_tpch_q16",
    "q106_tpch_q20",
    "q107_tpch_q21",
    "q108_event_funnel",
    "q109_cohort_retention",
    "q110_weighted_sample",
    "q112_domain_kl_drift",
    "q113_paragraph_dedup",
    "q114_embedding_quantization",
    "q116_zorder_clustering",
    "q117_source_roundtrip",
    "q118_python_udtf",
    "q119_right_outer_join",
    "q120_leakage_safe_split",
    "q121_vocabulary_oov",
    "q122_grouped_ols_trend",
    "q123_variant_json",
    "q124_asof_attribution",
    "q125_quality_canonical",
    "q37_multimodal_features",
    "q41_percentiles",
    "q42_histogram",
    "q45_hash_sample",
    "q46_stratified_topk",
    "q56_unpivot",
    "q84_skewed_distinct_agg",
    "q85_salted_join",
    "q86_gap_fill_ffill",
    "q89_approx_percentiles",
    "q91_equidepth_histogram",
    "q92_trailing_window_agg",
    "q93_data_quality_checks",
    "q94_unicode_normalize",
    "q95_tpch_q12",
    "q97_ratio_to_report",
    "q98_median_absolute_deviation",
    "q99_substring_dedup",
    # --- (3) next-stalest fills: first 3 of the r05 cohort (38 equally
    # stale entries, alphabetical tie-break) ---
    "q01_scan_projection",
    "q03_hash_aggregate",
    "q06_approx_distinct",
    # --- below here falls outside the 50-entry window ---
    # the remaining 35 r05 entries lead the r11 window unless displaced
    # by r11 changes (next alphabetically: q07_inner_join,
    # q08_broadcast_join, q09_multiway_join, q111_hll_union_rollup, ...)
    "q07_inner_join",
    "q08_broadcast_join",
    "q09_multiway_join",
    "q111_hll_union_rollup",
    "q127_kmeans_clustering",
    "q129_scd2_reconstruction",
    "q130_interval_concurrency",
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

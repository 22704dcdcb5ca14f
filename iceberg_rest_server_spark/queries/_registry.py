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
# r10 WINDOW (exactly 50): there are no no-evidence entries (every one
# of the 227 has a green row) and no r10 change touched any registry
# entry's query code or oracle (r10 work was bench harness, catalog
# wire fixes, conformance tests, and the read-only scaling study), so
# the whole window goes to stale evidence: the 42 entries whose last
# driver-recorded green is r04 (recomputed from CORRECTNESS_r01..r09
# this round; the exact list matches VERDICT r9 #1) + the 8 next-stalest
# fills drawn from the 38-entry r05 cohort (all equally stale —
# alphabetical order is the pinned tie-break so the pick is
# reproducible). After r10 the oldest evidence anywhere is r05 (30
# entries), cleared by r11+r12 at steady state. tools/driver_sim.py
# re-checks the WHOLE registry each round regardless — its r10 run is
# recorded in PARITY.md.
# Every entry is always returned — ordering only, never selection.
_DRIVER_ORDER_HEAD = [
    # --- (1) stalest evidence: last green r04 (42 entries) ---
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
    # --- (2) next-stalest fills: first 8 of the r05 cohort (38 equally
    # stale entries, alphabetical tie-break) ---
    "q01_scan_projection",
    "q03_hash_aggregate",
    "q06_approx_distinct",
    "q07_inner_join",
    "q08_broadcast_join",
    "q09_multiway_join",
    "q111_hll_union_rollup",
    "q127_kmeans_clustering",
    # --- below here falls outside the 50-entry window ---
    # the remaining 30 r05 entries lead the r11 window unless displaced
    # by r11 changes (next alphabetically: q129_scd2_reconstruction,
    # q130_interval_concurrency, q131_markov_transitions, ...)
    "q129_scd2_reconstruction",
    "q130_interval_concurrency",
    "q131_markov_transitions",
    "q132_rfm_segmentation",
    "q133_hard_negative_mining",
    "q135_time_weighted_average",
    "q136_cooccurrence_similarity",
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

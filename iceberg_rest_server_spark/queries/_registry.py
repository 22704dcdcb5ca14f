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
# and covers a bounded prefix (the first 50 entries) per round. To maximize
# cumulative driver-verified coverage, list first the entries that have
# never appeared in a driver window (r1-r3 missed the 21 at the top), then
# streaming regression cover (the one historical regression class), then
# every entry added or whose oracle changed this round (q99-q123, q34,
# q06). Entries with unchanged code and green rows in CORRECTNESS_r01-r03
# rotate out to make room. Every entry is always returned — this is
# ordering only, not selection.
_DRIVER_ORDER_HEAD = [
    # --- never covered by a driver run (r1-r3 windows missed them) ---
    "q36_ann_lsh_topk",
    "q37_multimodal_features",
    "q38_ann_ivf_topk",
    "q41_percentiles",
    "q42_histogram",
    "q45_hash_sample",
    "q46_stratified_topk",
    "q56_unpivot",
    "q84_skewed_distinct_agg",
    "q85_salted_join",
    "q86_gap_fill_ffill",
    "q88_cms_heavy_hitters",
    "q89_approx_percentiles",
    "q91_equidepth_histogram",
    "q92_trailing_window_agg",
    "q93_data_quality_checks",
    "q94_unicode_normalize",
    "q95_tpch_q12",
    "q96_pagerank_canonical",
    "q97_ratio_to_report",
    "q98_median_absolute_deviation",
    # --- streaming regression cover (broke once in r02; keep warm) ---
    "q115_stream_ingest_dedup",
    # --- new or changed this round: verify ---
    "q99_substring_dedup",
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
    "q111_hll_union_rollup",
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
    "q126_pmi_collocations",
    "q34_catalog_end_to_end",
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

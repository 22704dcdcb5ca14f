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
# r14 WINDOW (exactly 50), per the policy above and VERDICT r13 #1
# (which found the r13 window violated it: the r13 operator changes
# landed AFTER the window was set, so none of the 15 plan-changed
# entries had driver coverage): (2) CHANGED-CODE ENTRIES LEAD — the 15
# query paths whose physical plans changed in r13 commits
# 1a467cd/2bcd5d5 (fused jaccard prefix build, minhash sz-carry,
# connected-components fusion, pagerank setup fusion, q34/q100
# persists, q48/q100 int64 grams, q143/q157 array-side pairs, q176 BFS
# loop, q185 bound digit), plus every entry whose code changes in r14
# (inserted as the work lands, alphabetical); then (3) staleness: the
# remaining 26 entries of the r09 cohort (q48 is already in the
# changed set), then the alphabetically-first entries of the 50-entry
# r10 cohort to fill to exactly 50. Whole-registry re-check:
# tools/driver_sim.py at HEAD, recorded in PARITY.md.
# Every entry is always returned — ordering only, never selection.
_DRIVER_ORDER_HEAD = [
    # --- (2a) r14 changed-code entries, alphabetical: q134's sink
    # merge (max_by, one exchange) plus the eight run_to_table replay
    # drains whose state partitioning changed (8 -> 2) ---
    "q115_stream_ingest_dedup",
    "q134_stream_cdc_upsert",
    "q162_stream_stream_left_outer",
    "q171_stream_stream_full_outer",
    "q29_stream_tumbling_window",
    "q30_stream_session_window",
    "q39_stream_stateful_user_totals",
    "q57_stream_static_enrich",
    "q58_stream_stream_join",
    # --- (2b) the 15 r13 plan-changed entries, alphabetical ---
    "q100_bloom_decontaminate",
    "q125_quality_canonical",
    "q143_basket_affinity",
    "q152_cluster_safe_split",
    "q157_triangle_count",
    "q176_bfs_levels",
    "q185_bootstrap_ci",
    "q32_minhash_lsh_pairs",
    "q32_ngram_jaccard_pairs",
    "q34_catalog_end_to_end",
    "q40_curation_pipeline",
    "q48_decontamination",
    "q49_dedup_clusters",
    "q59_semantic_dedup",
    "q96_pagerank_canonical",
    # --- (3) staleness: the remaining r09-cohort entries (q48 is in
    # the r13 changed set; q57/q58 moved to the r14 changed set),
    # alphabetical ---
    "q50_repetition_quality",
    "q51_range_join",
    "q52_latest_by_key",
    "q53_domain_mixture",
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
    # --- (3) fills from the r10 cohort (alphabetical, minus entries
    # already above) to reach exactly 50 ---
    "q01_scan_projection",
    "q03_hash_aggregate",
    # --- below here falls outside the 50-entry window ---
    # next-stalest r10 entries continue the r15 window unless
    # displaced by changes (alphabetical)
    "q06_approx_distinct",
    "q101_incremental_mv",
    "q102_tpch_q2",
    "q103_tpch_q9",
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

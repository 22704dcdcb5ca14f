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
# and covers a bounded prefix (50 entries in rounds 1-2, while the registry
# has grown past that). To maximize cumulative driver-verified coverage
# across rounds, list first the entries whose r02 failures were just fixed,
# then as many entries without a correctness row in any prior round as fit
# the 50-entry window (oracled ones preferred — they get the strong hash
# check; the never-checked set now exceeds the window, so the remainder —
# q84-q86, q88-q89, q91-q94 — waits for the next round's rotation);
# entries already hash-verified in CORRECTNESS_r01/r02 follow. Every entry
# is always returned — this is ordering only, not selection.
_DRIVER_ORDER_HEAD = [
    # fixed this round (events.ts layout change broke them in r02)
    "q14_asof_join",
    "q15_sliding_window",
    "q23_get_json",
    "q29_stream_tumbling_window",
    "q30_stream_session_window",
    "q58_stream_stream_join",
    # never covered by a driver run (registered past the r01/r02 prefix)
    "q33_token_stats",
    "q33_bpe_token_count",
    "q33_quality_score",
    "q33_tfidf_top_terms",
    "q34_catalog_end_to_end",
    "q35_cosine_neardup_pairs",
    "q36_ann_bruteforce_topk",
    "q40_curation_pipeline",
    "q37_multimodal_metadata",
    "q37_multimodal_frames",
    "q59_semantic_dedup",
    "q60_embedding_centroids",
    "q87_skyline",
    "q90_stream_catalog_sink",
    "q62_stats_moments",
    "q43_sessionize_batch",
    "q44_pivot_profile",
    "q47_fuzzy_brand_pairs",
    "q48_decontamination",
    "q50_repetition_quality",
    "q51_range_join",
    "q52_latest_by_key",
    "q53_domain_mixture",
    # new this round: TPC-H-adapted suite + training-data export ops
    "q63_tpch_q1",
    "q64_tpch_q3",
    "q65_tpch_q4",
    "q66_tpch_q5",
    "q67_tpch_q6",
    "q68_tpch_q7",
    "q69_tpch_q8",
    "q70_tpch_q10",
    "q71_tpch_q13",
    "q72_tpch_q14",
    "q73_tpch_q15",
    "q74_tpch_q17",
    "q75_tpch_q18",
    "q76_tpch_q19",
    "q77_tpch_q22",
    "q82_merge_upsert",
    "q83_row_level_delete",
    "q78_pii_redaction",
    "q79_sequence_chunking",
    "q80_token_packing",
    "q81_epoch_shuffle",
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

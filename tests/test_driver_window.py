"""Driver-window contract: the correctness driver checks only the FIRST
50 ``queries()`` entries per round, so the registry's explicit ordering
is load-bearing evidence policy, not cosmetics. These tests freeze the
r14 rotation (policy pinned in _registry.py since r8): entries with no
driver evidence lead, then entries whose code changed since their last
green row, then the stalest recorded evidence; every _DRIVER_ORDER_HEAD
name must actually exist (a typo would silently demote an entry to the
unchecked tail)."""

from __future__ import annotations

from iceberg_rest_server_spark.queries import REGISTRY, queries
from iceberg_rest_server_spark.queries._registry import _DRIVER_ORDER_HEAD

# (2a) entries whose code changes in r14 and that are not already in the
# r13-changed set below — extended as r14 work lands.
CHANGED_R14 = [
    # sink latest-wins: 2 windows → 1 max_by aggregate per micro-batch
    "q134_stream_cdc_upsert",
    # the eight run_to_table replay drains: state partitions 8 → 2
    "q115_stream_ingest_dedup",
    "q162_stream_stream_left_outer",
    "q171_stream_stream_full_outer",
    "q29_stream_tumbling_window",
    "q30_stream_session_window",
    "q39_stream_stateful_user_totals",
    "q57_stream_static_enrich",
    "q58_stream_stream_join",
]

# (2b) the 15 query paths whose physical plans changed in r13 commits
# 1a467cd/2bcd5d5 with no driver coverage that round (VERDICT r13 #2:
# "rotate the driver window so the 15 changed-code entries lead").
CHANGED_R13 = [
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
]


def _staleness_through(evidence_through: int) -> dict[str, int]:
    """Latest driver-recorded green round per entry, from the committed
    CORRECTNESS artifacts up to and including ``evidence_through``."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd > evidence_through:
            continue
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    return latest


def _expected_window() -> list[str]:
    """The r14 window, derived: changed-code entries lead (r14 then r13,
    each alphabetical), then recorded staleness ascending with the
    pinned alphabetical tie-break, to exactly 50."""
    latest = _staleness_through(13)
    changed = sorted(CHANGED_R14) + sorted(CHANGED_R13)
    fills = [
        n
        for _, n in sorted((latest.get(n, 0), n) for n in REGISTRY)
        if n not in set(changed)
    ]
    return (changed + fills)[:50]


def test_every_head_name_exists():
    missing = [n for n in _DRIVER_ORDER_HEAD if n not in REGISTRY]
    # the single allowed absentee is the protobuf-gated TWS entry
    assert missing in ([], ["q140_stream_transform_with_state"]), missing


def test_window_is_changed_then_stalest():
    window = list(queries())[:50]
    expected = _expected_window()
    assert window == expected, (
        "driver window diverges from policy:\n"
        f"window:   {window}\nexpected: {expected}"
    )
    assert len(set(window)) == 50


def test_changed_r13_matches_verdict():
    """The 15-name changed set is frozen from VERDICT r13's audit; all
    must exist (they're registered query paths, not operator names)."""
    assert len(CHANGED_R13) == 15
    missing = [n for n in CHANGED_R13 if n not in REGISTRY]
    assert not missing, missing


def test_ordering_is_reordering_not_selection():
    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)

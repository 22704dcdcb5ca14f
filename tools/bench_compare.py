"""Compare a calibrated bench record against a previous round's raw
record (VERDICT r9 #2 'done' criterion: an untouched query's CALIBRATED
delta vs the previous round should sit within noise, so raw swings are
attributable to box phase inside the artifact itself).

The calibration reference (bench.py _CALIB_REF_GEMM) is pinned to the
r9 end-of-run probe, so BENCH_r09's raw seconds ARE its calibrated
seconds and the comparison is one-sided by construction.

Usage: python tools/bench_compare.py [NEW_JSON] [OLD_JSON]
       (defaults: BENCH_FULL.json vs BENCH_r09.json)
Prints one JSON line with per-decile calibrated deltas + the biggest
movers, and a markdown table to stderr for PARITY.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compare(new: dict, old: dict) -> dict:
    new_cal = new.get("queries_calibrated") or new.get("queries", {})
    new_raw = new.get("queries", {})
    old_raw = old.get("queries", {})
    deltas = {}
    for name, old_sec in old_raw.items():
        if name in new_cal and old_sec and old_sec > 0:
            deltas[name] = (new_cal[name] - old_sec) / old_sec
    if not deltas:
        return {"compared": 0}
    vals = sorted(deltas.values())
    movers = sorted(deltas.items(), key=lambda kv: abs(kv[1]), reverse=True)[:8]
    return {
        "compared": len(deltas),
        "median_delta_pct": round(100 * statistics.median(vals), 1),
        "p10_pct": round(100 * vals[int(0.10 * len(vals))], 1),
        "p90_pct": round(100 * vals[int(0.90 * len(vals))], 1),
        "within_10pct": sum(1 for v in vals if abs(v) <= 0.10),
        "biggest_movers": {
            n: {
                "old_raw": old_raw[n],
                "new_raw": new_raw.get(n),
                "new_calibrated": new_cal[n],
                "delta_pct": round(100 * d, 1),
            }
            for n, d in movers
        },
    }


def compare_same_code(a: dict, b: dict) -> dict:
    """Same-code A/B reproducibility (VERDICT r10 #3 / r11 #2): given
    two full BENCH_FULL records from IDENTICAL code, report the share
    of per-query values agreeing within ±10%, raw and calibrated,
    split by the fast(<2 s)/slow boundary, plus the biggest movers.
    Unlike compare(), both sides use the same key (min-of-samples), so
    this measures the MEASUREMENT's stability, not code deltas."""
    out: dict = {}
    for label, key in (("raw", "queries"), ("calibrated", "queries_calibrated")):
        qa, qb = a.get(key, {}), b.get(key, {})
        rel = {
            n: (qb[n] - qa[n]) / qa[n]
            for n in set(qa) & set(qb)
            if qa[n] and qa[n] > 0
        }
        if not rel:
            out[label] = {"compared": 0}
            continue
        fast = {n for n in rel if max(qa[n], qb[n]) < 2.0}
        vals = sorted(abs(v) for v in rel.values())
        movers = sorted(rel.items(), key=lambda kv: -abs(kv[1]))[:8]
        out[label] = {
            "compared": len(rel),
            "within_10pct": sum(1 for v in rel.values() if abs(v) <= 0.10),
            "within_10pct_share": round(
                sum(1 for v in rel.values() if abs(v) <= 0.10) / len(rel), 3
            ),
            # the tracking lens that acknowledges the box's absolute
            # noise floor: most queries run sub-second, where +-10% is
            # +-30-150 ms — under the scheduler/steal floor regardless
            # of sampling scheme. 0.2 s = the measured floor (r12).
            "within_10pct_or_200ms_share": round(
                sum(
                    1 for n, v in rel.items()
                    if abs(v) <= 0.10 or abs(qb[n] - qa[n]) <= 0.2
                ) / len(rel), 3,
            ),
            "fast_within_10pct_share": round(
                sum(1 for n in fast if abs(rel[n]) <= 0.10) / len(fast), 3
            ) if fast else None,
            "slow_within_10pct_share": round(
                sum(1 for n in rel if n not in fast and abs(rel[n]) <= 0.10)
                / max(len(rel) - len(fast), 1), 3,
            ),
            "median_abs_delta_pct": round(100 * statistics.median(vals), 1),
            "movers": {n: round(100 * v, 1) for n, v in movers},
        }
    out["totals"] = {
        "a": [a.get("value"), a.get("value_calibrated")],
        "b": [b.get("value"), b.get("value_calibrated")],
    }
    return out


def main() -> None:
    argv = [x for x in sys.argv[1:] if x != "--ab"]
    ab = "--ab" in sys.argv
    new_path = argv[0] if argv else os.path.join(REPO, "BENCH_FULL.json")
    old_path = argv[1] if len(argv) > 1 else os.path.join(REPO, "BENCH_r09.json")
    with open(new_path) as fh:
        new = json.load(fh)
    with open(old_path) as fh:
        old = json.load(fh)
    print(json.dumps(compare_same_code(new, old) if ab else compare(new, old)))


if __name__ == "__main__":
    main()

"""Align a query's recorded run window against the bench's probe series
— the attribution step VERDICT r11 #1 asked for, as a tool instead of a
one-off analysis.

Usage: python tools/probe_align.py [BENCH_FULL.json] [query ...]
       (no queries -> the 10 largest raw entries)

For each query it prints the measurement midpoint, the 5 nearest probes
(the calibration estimator's window) with their GEMM times as multiples
of the steady floor, the factor actually applied, and a verdict:

- "slow phase (calibrated)"  — all 5 nearest probes elevated ≥2x: a
  genuine wide phase; the min-of-5 estimator saw it and corrected.
- "slow phase (UNCORRECTED)" — the probes bracketing the run window are
  elevated but a fast probe inside the nearest-5 window pulled the
  estimate down: the recorded time is inflated and the calibration did
  NOT compensate (the r11 q100 case — its whole isolated window sat in
  a measured 6-8x phase while the estimator reached a post-phase probe).
- "steady"                   — probes around the run are within 1.5x of
  the floor. NOTE: probe-steady does NOT exclude hypervisor steal that
  slows JVM work while leaving the ~10 ms BLAS burst untouched (the r11
  q32_simhash/q59 case) — only re-measurement settles those; see
  bench_compare --ab.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def align(full: dict, name: str) -> dict:
    """Pure analysis over one BENCH_FULL record; returns the alignment
    row for `name` (see module docstring for the verdict semantics)."""
    probes = full.get("probes") or []
    mid = (full.get("query_mid") or {}).get(name)
    if mid is None or not probes:
        return {"query": name, "verdict": "no mark/probes recorded"}
    floor = min(p["numpy_gemm_1024_sec"] for p in probes)
    nearest = sorted(probes, key=lambda p: abs(p["t"] - mid))[:5]
    best = min(p["numpy_gemm_1024_sec"] for p in nearest)
    # the two probes actually bracketing the midpoint in time
    before = [p for p in nearest if p["t"] <= mid]
    after = [p for p in nearest if p["t"] > mid]
    bracket = ([max(before, key=lambda p: p["t"])] if before else []) + (
        [min(after, key=lambda p: p["t"])] if after else []
    )
    bracket_min = min(p["numpy_gemm_1024_sec"] for p in bracket)
    if all(p["numpy_gemm_1024_sec"] >= 2 * floor for p in nearest):
        verdict = "slow phase (calibrated)"
    elif bracket_min >= 2 * floor and best < 1.5 * floor:
        verdict = "slow phase (UNCORRECTED)"
    elif bracket_min <= 1.5 * floor:
        verdict = "steady"
    else:
        verdict = "mixed"
    t0 = probes[0]["t"]
    return {
        "query": name,
        "mid_rel_sec": round(mid - t0, 1),
        "raw": (full.get("queries") or {}).get(name),
        "calibrated": (full.get("queries_calibrated") or {}).get(name),
        "runs": (full.get("reruns") or {}).get(name),
        "floor_gemm": floor,
        "nearest5": [
            {
                "t_rel": round(p["t"] - t0, 1),
                "gemm_x_floor": round(p["numpy_gemm_1024_sec"] / floor, 2),
                "label": p["label"],
            }
            for p in nearest
        ],
        "bracket_x_floor": round(bracket_min / floor, 2),
        "estimator_x_floor": round(best / floor, 2),
        "verdict": verdict,
    }


def main() -> None:
    args = sys.argv[1:]
    path = args[0] if args and args[0].endswith(".json") else os.path.join(REPO, "BENCH_FULL.json")
    names = [a for a in args if not a.endswith(".json")]
    with open(path) as fh:
        full = json.load(fh)
    if not names:
        names = sorted(full.get("queries", {}), key=lambda n: -full["queries"][n])[:10]
    for name in names:
        print(json.dumps(align(full, name)))


if __name__ == "__main__":
    main()

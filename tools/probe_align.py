"""Align a query's recorded run window against the bench's probe series
— the attribution step VERDICT r11 #1 asked for, as a tool instead of a
one-off analysis.

Usage: python tools/probe_align.py [BENCH_FULL.json] [query ...]
       (no queries -> the 10 largest raw entries)

Accepts both a BENCH_FULL-shaped record and a committed per-round
wrapper ({n, rc, tail, parsed}) — but a wrapper's `parsed` is the
TRIMMED stdout line, which carries no probes/query_mid/samples, so the
tool says exactly which shape it needs instead of a generic "no
mark/probes recorded" (ADVICE r12: the r11 attribution replay required
extracting the full record from git to discover this).

For each query it prints the measurement midpoint, the 5 nearest probes
(the calibration estimator's window) with their GEMM times as multiples
of the steady floor, the factor actually applied, the within-run sample
spread (r13 records), and a verdict:

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
  q32_simhash/q59 case) — re-measurement (bench_compare --ab) or the
  within-run spread settles those: a cross-round delta covered by the
  record's own `spread_sec` is sampling noise, no rerun needed.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_record(path: str) -> dict:
    """Read a record, descending into a committed per-round wrapper's
    `parsed` line when the top level is not itself a bench record."""
    with open(path) as fh:
        data = json.load(fh)
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        return data["parsed"]
    return data


def align(full: dict, name: str) -> dict:
    """Pure analysis over one BENCH_FULL record; returns the alignment
    row for `name` (see module docstring for the verdict semantics)."""
    probes = full.get("probes") or []
    mid = (full.get("query_mid") or {}).get(name)
    if mid is None or not probes:
        if not probes and "queries" in full:
            # a trimmed summary line (committed wrapper's `parsed`):
            # name the missing shape rather than shrugging (ADVICE r12)
            return {
                "query": name,
                "verdict": "no mark/probes recorded — this record carries "
                "no probe series/query_mid (trimmed summary line?); "
                "probe alignment needs the full BENCH_FULL.json record",
            }
        return {"query": name, "verdict": "no mark/probes recorded"}
    # ADVICE r12: older/partial records may carry probe rows without the
    # GEMM key — skip those instead of raising KeyError mid-analysis
    usable = [p for p in probes if "numpy_gemm_1024_sec" in p and "t" in p]
    if not usable:
        return {"query": name, "verdict": "no usable probes (no probe "
                "carries numpy_gemm_1024_sec)"}
    floor = min(p["numpy_gemm_1024_sec"] for p in usable)
    nearest = sorted(usable, key=lambda p: abs(p["t"] - mid))[:5]
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
    t0 = usable[0]["t"]
    out = {
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
    # diagnostic second channel (r13): the single-core python loop.
    # Hypervisor steal can slow JVM/python work while leaving the ~10 ms
    # 32-thread BLAS burst untouched (the r11 q32_simhash/q59 finding,
    # observed RUN-WIDE in the r13 record: GEMM medians identical across
    # two runs while the loop ran +10% and queries +18%) — an elevated
    # loop_x_floor with a steady GEMM bracket is that signature.
    loops = [p["python_loop_2m_sec"] for p in usable if p.get("python_loop_2m_sec")]
    if loops:
        lf = min(loops)
        out["loop_x_floor"] = [
            round(p["python_loop_2m_sec"] / lf, 2)
            if p.get("python_loop_2m_sec") else None
            for p in nearest
        ]
    # third channel (r14, VERDICT r13 #3): first-touch fault service.
    # A lazily-faulted VM phase stalls JVM allocation at ~37-60 MB/s
    # while GEMM and the python loop read the box as healthy; the fault
    # probe is the only one of the three that sees it. Absolute
    # threshold, not relative: healthy fault service is GB/s-scale, and
    # a record whose whole series is slow must still flag (a relative
    # floor would normalize the pathology away).
    faults = [p.get("memfault_256m_mb_s") for p in nearest]
    if any(f is not None for f in faults):
        out["fault_mb_s"] = faults
        bracket_fault = [
            p["memfault_256m_mb_s"]
            for p in bracket
            if p.get("memfault_256m_mb_s") is not None
        ]
        if bracket_fault and min(bracket_fault) < 200:
            out["verdict"] = verdict + " + FAULT-BOUND window (first-touch "
            out["verdict"] += f"{min(bracket_fault):.0f} MB/s; raw seconds "
            out["verdict"] += "inflated for allocation-heavy work and the "
            out["verdict"] += "GEMM calibration cannot correct it)"
    samples = (full.get("samples") or {}).get(name)
    if samples:
        # r13 within-run spread: [pass_label, sec, t_mid] per execution.
        # steady_spread_sec is the attribution signal — a cross-round
        # delta of recorded MINS (which land in steady state) that the
        # record's own steady sampling already spans is noise. spread_sec
        # keeps the raw max-min: for isolated-family queries it is
        # dominated by each fresh JVM's cold first run (2-4x steady) and
        # must NOT be used to judge deltas, only to see warm-up cost.
        secs = [s[1] for s in samples]
        by_label: dict[str, list[float]] = {}
        for label, sec, _mid in samples:
            by_label.setdefault(label, []).append(sec)
        steady = [
            s
            for label, ss in by_label.items()
            for s in (ss[1:] if label.startswith("iso") and len(ss) > 1 else ss)
        ]
        out["samples"] = samples
        out["spread_sec"] = round(max(secs) - min(secs), 4)
        out["steady_spread_sec"] = round(max(steady) - min(steady), 4)
        out["spread_x_min"] = (
            round(max(steady) / min(steady), 2) if min(steady) > 0 else None
        )
    return out


def main() -> None:
    args = sys.argv[1:]
    path = args[0] if args and args[0].endswith(".json") else os.path.join(REPO, "BENCH_FULL.json")
    names = [a for a in args if not a.endswith(".json")]
    full = load_record(path)
    if not names:
        names = sorted(full.get("queries", {}), key=lambda n: -full["queries"][n])[:10]
    for name in names:
        print(json.dumps(align(full, name)))


if __name__ == "__main__":
    main()

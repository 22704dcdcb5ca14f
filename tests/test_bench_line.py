"""The bench's final stdout line must fit the driver's 2000-char tail
capture AND stay valid JSON with the headline fields intact — otherwise
the round record shows parsed: null and the metric is lost."""

from __future__ import annotations

import json

from bench import summary_line


def _out(n_queries: int, with_errors: bool = False) -> dict:
    times = {f"q{i:03d}_some_descriptive_query_name": 1.2345 + i for i in range(n_queries)}
    out = {
        "metric": "sum_query_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "n_queries": len(times),
        "sf": 0.1,
    }
    if with_errors:
        out["errors"] = {f"q{i}_bad": "SomeError: " + "x" * 300 for i in range(8)}
        out["value"] = None
    return out


def test_line_fits_tail_capture():
    for n in (0, 5, 146, 400):
        line = summary_line(_out(n))
        assert len(line) <= 1900, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "sum_query_wall_sec"
        assert parsed["n_queries"] == n
        assert parsed["value"] is not None
        assert parsed["queries_shown"] <= n


def test_slowest_queries_kept():
    parsed = json.loads(summary_line(_out(300)))
    kept = parsed["queries"]
    # the slowest entries (highest index in the synthetic data) survive
    assert "q299_some_descriptive_query_name" in kept
    assert "q000_some_descriptive_query_name" not in kept


def test_errors_truncated_but_present():
    line = summary_line(_out(146, with_errors=True))
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] is None
    assert parsed["errors"]
    assert all(len(v) <= 80 for v in parsed["errors"].values())


def test_box_calibration_survives_line_trim():
    """The calibration probes exist to make BENCH_r{N}.json numbers
    box-comparable — they must ride the stdout line, not just
    BENCH_FULL.json, and never be sacrificed to the per-query trim."""
    out = _out(300)
    out["box_calibration"] = {
        "start": {"numpy_gemm_1024_sec": 0.0142, "python_loop_2m_sec": 0.0975},
        "end": {"numpy_gemm_1024_sec": 0.0112, "python_loop_2m_sec": 0.1037},
    }
    line = summary_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["box_calibration"]["start"]["numpy_gemm_1024_sec"] == 0.0142
    assert parsed["queries_shown"] > 10  # trim still leaves the slow tail

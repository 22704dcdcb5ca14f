"""Distributed 2-criteria skyline (Pareto frontier) operator.

Spark has no skyline primitive (the EDBT'23 "Integration of Skyline
Queries into Spark SQL" line of work adds one at the planner level; see
PAPERS.md). This implements the standard two-phase distributed scheme
for the 2-criteria case:

  1. **Local skyline per partition** (Arrow-batched sweep): sort by the
     maximized criterion descending (minimized ascending as tiebreak)
     and keep points that strictly improve the running best of the
     minimized criterion. O(n log n) per partition, eliminates almost
     everything — a partition's skyline is tiny for any non-adversarial
     distribution.
  2. **Final skyline over the union of local skylines**: the survivors
     of phase 1 are a superset of the global skyline (dominance is
     transitive, so a globally-dominated point is dominated within its
     own partition by any local witness or by a point that itself
     survives), and they are few — one more sweep in a single task
     finishes the job.

Duplicate points (equal in both criteria) do not strictly dominate each
other, so all copies belong to the skyline — the sweep keeps them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sweep(pdf: pd.DataFrame, maximize: str, minimize: str) -> pd.DataFrame:
    """2D skyline sweep: rows not strictly dominated by any other."""
    if not len(pdf):
        return pdf
    s = pdf.sort_values([maximize, minimize], ascending=[False, True], kind="mergesort")
    mx = s[maximize].to_numpy()
    mn = s[minimize].to_numpy()
    keep = []
    best_mn = None  # best (lowest) minimized value seen at strictly larger mx
    prev_key = None
    for i in range(len(s)):
        key = (mx[i], mn[i])
        if best_mn is None or mn[i] < best_mn or key == prev_key:
            keep.append(i)
            prev_key = key
            best_mn = mn[i] if best_mn is None else min(best_mn, mn[i])
    return s.iloc[keep]


def skyline(df: DataFrame, maximize: str, minimize: str) -> DataFrame:
    """Rows not dominated by any other row, where `a` dominates `b` iff
    a[maximize] >= b[maximize], a[minimize] <= b[minimize], and at least
    one inequality is strict."""

    cols = df.columns
    schema = df.schema

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _sweep(pdf, maximize, minimize)

    def final(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one partition still arrives as MULTIPLE Arrow batches
        # (arrow.maxRecordsPerBatch); dominance must be checked across
        # all of them, so concatenate before the final sweep — the
        # phase-1 survivors are small by construction
        pdfs = [p for p in it if len(p)]
        if pdfs:
            yield _sweep(pd.concat(pdfs, ignore_index=True), maximize, minimize)

    candidates = df.mapInPandas(local, schema)
    # final pass: candidates are few; one task finishes the frontier
    out = candidates.repartition(1).mapInPandas(final, schema)
    return out.select(*cols)

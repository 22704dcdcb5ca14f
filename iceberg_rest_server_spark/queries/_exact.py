"""Determinism helpers.

Floating-point aggregation order is nondeterministic under distributed
execution (partial aggregates combine in arbitrary order), so every money
aggregate goes through exact decimal arithmetic and is only converted to
double at the end — the same double on Spark and on the DuckDB oracle
regardless of partitioning. SURVEY.md §7 "What's hard" item 5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL fragment equivalents are embedded in each oracle string.


def dec(col: str | Column) -> Column:
    """Exact 2-dp decimal view of a money/quantity double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dsum(col: str | Column) -> Column:
    """Exact decimal sum, returned as double (deterministic)."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Deterministic average: exact decimal sum cast to double, then one
    double division — engines' decimal-division scale rules differ, so the
    division happens in double on both sides."""
    return F.sum(dec(col)).cast("double") / F.count(F.lit(1))

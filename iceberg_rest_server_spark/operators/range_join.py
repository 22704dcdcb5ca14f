"""Bucketed interval (range) join.

Spark plans `point BETWEEN start AND end` joins as broadcast-nested-loop
(all pairs) unless one side fits in memory — quadratic at scale. The
bucketed formulation discretizes time into fixed buckets: each interval
explodes to the buckets it overlaps, each point maps to its bucket, and
the join becomes a pure equi-join on bucket followed by the exact
boundary filter. Cost is |points| + Σ interval_len/bucket, shuffle-
parallel on the bucket key; pick the bucket near the median interval
length so most intervals explode to O(1) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_us: int = 3600 * 1_000_000,
    broadcast_intervals: bool = True,
    half_open: bool = True,
) -> DataFrame:
    """Rows of `points` matched to every interval containing their
    timestamp: start <= ts < end (half-open) or <= end (closed).

    Returns points columns + intervals columns. `broadcast_intervals`
    should be False when the (exploded) interval side is itself large —
    the equi-join then shuffles both sides on the bucket key."""
    # degenerate intervals (end <= start half-open, end < start closed)
    # match nothing — drop them BEFORE bucket explosion, where a
    # reversed interval would otherwise make sequence() count DOWN and
    # emit every bucket between the ends
    lower = F.col(end_col) > F.col(start_col) if half_open else F.col(
        end_col
    ) >= F.col(start_col)
    intervals = intervals.filter(lower)
    iv_b = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bucket_us),
                F.floor(
                    (F.unix_micros(F.col(end_col)) - (1 if half_open else 0))
                    / bucket_us
                ),
            )
        ),
    )
    if broadcast_intervals:
        iv_b = F.broadcast(iv_b)
    p_b = points.withColumn("__bucket", F.floor(F.unix_micros(F.col(ts_col)) / bucket_us))
    upper = (
        F.col(ts_col) < F.col(end_col)
        if half_open
        else F.col(ts_col) <= F.col(end_col)
    )
    return (
        p_b.join(iv_b, "__bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & upper)
        .drop("__bucket")
    )

"""Ordered funnel analysis over an event stream.

The classic conversion question — how many users completed stage 1,
then stage 2 strictly after it, then stage 3, all within a deadline
anchored at the first stage — computed with conditional MIN windows
over a single user partitioning: one shuffle, no self-joins, no row
explosion. Stage k's timestamp is the earliest qualifying event
strictly after stage k-1's timestamp and within `within` of stage 1.
At 100 TB this is the only funnel formulation that survives: the
join-chain alternative shuffles the event table once per stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    within: Column,
) -> DataFrame:
    """One row per user with t_<stage> columns (NULL where the user never
    reached the stage under the ordering/deadline constraints)."""
    w = Window.partitionBy(user_col)
    d = events
    prev: str | None = None
    for stage in stages:
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = (
                cond
                & (F.col(ts_col) > F.col(f"t_{prev}"))
                & (F.col(ts_col) <= F.col(f"t_{stages[0]}") + within)
            )
        d = d.withColumn(f"t_{stage}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = stage
    return d.select(user_col, *[f"t_{s}" for s in stages]).distinct()

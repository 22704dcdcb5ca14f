"""Temporal operators: SCD2 island reconstruction and time-weighted
aggregation — the CDC-log and irregular-sampling primitives behind
Q129/Q135, factored out for reuse and property testing.

Both are single-key-shuffle shapes: every window partitions by the
entity key, so one hash exchange serves all passes and nothing ever
funnels through a global partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_islands(
    df: DataFrame,
    key: str,
    attr: str,
    order_cols: list[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Collapse a change-event stream into SCD2 (type-2 dimension) rows.

    Consecutive same-``attr`` runs per ``key`` (ordered by
    ``order_cols``, which must be a total order within the key) become
    one row with (valid_from, valid_to, n_events, is_current) — the
    gaps-and-islands row_number-difference construction. ``valid_to``
    chains from the next island's valid_from; ordering between islands
    uses a unique per-island ordinal (min global row number), so equal
    timestamps across adjacent islands cannot make lead()
    non-deterministic.
    """
    ts_col = ts_col or order_cols[0]
    w_all = Window.partitionBy(key).orderBy(*order_cols)
    w_attr = Window.partitionBy(key, attr).orderBy(*order_cols)
    numbered = df.select(
        key,
        attr,
        ts_col,
        F.row_number().over(w_all).alias("_rn_all"),
        (F.row_number().over(w_all) - F.row_number().over(w_attr)).alias("_grp"),
    )
    islands = numbered.groupBy(key, attr, "_grp").agg(
        F.min(ts_col).alias("valid_from"),
        F.min("_rn_all").alias("_island_ord"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_next = Window.partitionBy(key).orderBy("_island_ord")
    return (
        islands.withColumn("valid_to", F.lead("valid_from").over(w_next))
        .select(
            key,
            attr,
            "valid_from",
            "valid_to",
            "n_events",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: Column,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key time-weighted average: each reading weighted by the
    seconds until the next one (the last reading carries no weight).

    ``value`` should already be an exact (decimal) column — the weighted
    sum then stays exact until the single final double cast, making the
    result bit-stable under repartitioning. Keys whose readings span
    zero total time are dropped (no weight to average over).
    Output: (key, twap, n_spans).
    """
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key).orderBy(*order_cols)
    spans = df.select(
        key,
        value.alias("_v"),
        (
            F.unix_timestamp(F.lead(ts_col).over(w)) - F.unix_timestamp(ts_col)
        ).alias("_dt"),
    ).filter(F.col("_dt").isNotNull())
    agg = spans.groupBy(key).agg(
        F.sum(F.col("_v") * F.col("_dt")).alias("_wsum"),
        F.sum("_dt").alias("_tsum"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return agg.filter(F.col("_tsum") > 0).select(
        key,
        F.round(F.col("_wsum").cast("double") / F.col("_tsum"), 6).alias("twap"),
        F.col("n_spans").cast("long").alias("n_spans"),
    )

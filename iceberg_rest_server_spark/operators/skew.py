"""Skew-mitigation operators: salted joins and two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew, but two shapes still need explicit structure at 100 TB:

- **Salted join**: a shuffle join where one side's key distribution is
  pathological (a handful of hot keys own most rows) and the other side
  is too large to broadcast. Salting splits each hot key's rows across
  `salt_factor` reducers and replicates the other side's matching rows
  once per salt — turning one straggler task into `salt_factor` even
  tasks at the cost of replicating only the small side's rows.
- **Two-stage distinct aggregation**: `count(DISTINCT x)` per low-
  cardinality group key funnels every row of a group through one
  reducer. De-duplicating on (group, x) first is a full-width shuffle
  but an evenly-partitioned one; the second aggregate then counts tiny
  pre-shrunk partitions. Same result, no single-reducer bottleneck.

Both are result-identical to their naive forms (property + oracle
tested) — they only change the physical distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed ⋈ other` on column `on`, with the skewed side's
    rows salted across `salt_factor` sub-keys and `other`'s rows
    replicated once per salt.

    The join key becomes (on, salt), so a hot key's rows land on
    `salt_factor` different reducers instead of one. Replication cost is
    |other| × salt_factor rows — choose the *smaller* relation as
    `other`. Output columns: all of `skewed`'s, then `other`'s minus the
    join key (same as a plain `join(..., on)`).

    Only inner and left joins are supported: the salting direction
    preserves exactly the skewed side's match semantics. A right/full
    join would surface each unmatched `other` row once per salt, and
    semi/anti joins drop `other`'s columns entirely."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # Salt must be independent of row CONTENT: hashing the row's columns
    # would collapse identical duplicate rows of a hot key onto one salt
    # (keeping the straggler) and break on unhashable types (MapType).
    # monotonically_increasing_id is unique per row within the stage, so
    # pmod spreads a hot key's rows evenly regardless of duplication —
    # and the id never leaves this operator, so its non-determinism
    # across retries can't leak into results (the join output is
    # identical for any salt assignment).
    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("int"),
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out_cols = skewed.columns + [c for c in other.columns if c != on]
    return salted.join(replicated, [on, "__salt"], how).select(*out_cols)


def two_stage_distinct_agg(
    df: DataFrame, group_col: str, distinct_col: str, alias: str = "n_distinct"
) -> DataFrame:
    """count(DISTINCT distinct_col) GROUP BY group_col without a
    per-group single-reducer bottleneck: shuffle once on the pair
    (evenly distributed), then count the de-duplicated pairs.
    count(col) in stage 2 skips the NULL pair, matching SQL
    COUNT(DISTINCT)'s null semantics."""
    return (
        df.select(group_col, distinct_col)
        .distinct()  # shuffle on (group, value): no hot partition
        .groupBy(group_col)
        .agg(F.count(F.col(distinct_col)).alias(alias))
    )

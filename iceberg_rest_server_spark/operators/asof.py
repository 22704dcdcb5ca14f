"""Distributed as-of join (SURVEY.md §2F Q14; §4.2 lists it as custom —
Spark has no native as-of join).

Strategy: the *union + window* trick rather than a range join.

A naive implementation joins on the key with ``l.ts >= r.ts`` and takes
max — that is O(|L| × |R|) per key and explodes on skewed keys at scale.
Instead we union both sides into one stream per key, sort by (ts,
side-tag) once inside each key partition, and carry the most recent
right-side payload forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. One shuffle on the key, linear work per key,
no pair explosion — this survives a 100×-scale-up where the range join
does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    inclusive: bool = True,
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (``<`` if ``inclusive=False``) per key.

    ``right_cols`` maps right column → output alias (the as-of payload).
    Returns all left columns plus the aliased payload columns (null when
    no right row precedes the left row).

    ``tolerance`` (pandas ``merge_asof``-style) bounds staleness: a
    match older than ``left.ts - tolerance`` is treated as no match
    (payload NULLed). Pass an interval Column, e.g.
    ``F.expr("INTERVAL 1 HOUR")``. Same single-shuffle plan — the bound
    is a post-window projection, not a join condition.
    """
    # Tag order inside equal timestamps decides inclusivity: with the
    # right side sorted first (tag 0 < 1), an equal-ts right row is
    # visible to the left row → inclusive. For exclusive, sort left first.
    left_tag, right_tag = (1, 0) if inclusive else (0, 1)

    payload_src = list(right_cols)
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_src],
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(
            l.schema["__left"].dataType
        ).alias("__left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_src],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = l.unionByName(r).select(
        "__tag",
        "__left",
        F.col("__ts"),
        F.last(
            F.when(F.col("__tag") == right_tag, F.col("__ts")), ignorenulls=True
        )
        .over(w)
        .alias("__matched_rts"),
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"__a_{c}")
            for c in payload_src
        ],
    )
    fresh = (
        F.lit(True)
        if tolerance is None
        else F.col("__matched_rts") >= F.col("__ts") - tolerance
    )
    out = joined.filter(F.col("__tag") == left_tag).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[
            F.when(fresh, F.col(f"__a_{c}")).alias(alias)
            for c, alias in right_cols.items()
        ],
    )
    return out

"""Frequency sketches as pure DataFrame aggregations.

A count-min sketch is d hash rows × w counters; `estimate(key) =
min_i counters[i][h_i(key)]`. Built declaratively it is just d
small groupBy aggregations (the counter matrix is d·w longs regardless
of input size) — map-side combining gives the same mergeability as the
classic streaming formulation, and the whole thing stays inside
whole-stage codegen. Estimates are deterministic for fixed seeds, never
under the true count, and within eps·N with probability 1-delta for
w = ceil(e/eps), d = ceil(ln(1/delta)).

This complements the engine's other sketch tiers (HLL approx-distinct,
MinHash/SimHash similarity): frequency estimation with bounded memory —
the 100 TB shape for heavy-hitter detection where exact per-key counts
would shuffle the full key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_counters(df: DataFrame, key_col: str, width: int = 2048, depth: int = 4) -> DataFrame:
    """Build the d×w counter matrix: rows (row, bucket, cnt)."""
    rows = []
    for i in range(depth):
        rows.append(
            df.select(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).alias("bucket"),
            )
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cms_estimate(
    counters: DataFrame, keys: DataFrame, key_col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Estimate each key's frequency: min over the d rows of its counter.
    `counters` is tiny (d·w rows max) — broadcast to the keys side."""
    probes = keys.select(
        key_col,
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).alias(f"b{i}")
            for i in range(depth)
        ],
    )
    out = probes
    for i in range(depth):
        c = counters.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("cnt").alias(f"c{i}")
        )
        out = out.join(F.broadcast(c), f"b{i}", "left")
    est = F.least(*[F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(depth)])
    return out.select(key_col, est.alias("est_count"))

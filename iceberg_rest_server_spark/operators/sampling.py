"""Deterministic, engine-reproducible sampling primitives.

Weighted Bernoulli (Poisson) sampling with inclusion probability
min(1, k·w/W): include a row iff u < k·w/W, where u is a uniform
deviate derived from the row's key — here the first 6 hex digits of
md5(key), giving an exact integer test  u6·W < k·w·16^6  with no
floating point anywhere. Reproducible across engines, runs, and
partitionings (unlike df.sample), and a pure scan predicate after a
broadcast scalar total — no sort, no shuffle, which is why this (not
exp-key reservoir ordering) is the 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX6_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST({{key}} AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (5 - i)}"
    for i in range(6)
)


def hex6_sql(key: str) -> str:
    """ANSI-ish SQL for the 6-hex-digit uniform integer in [0, 16^6) —
    usable verbatim in a DuckDB oracle (strpos/VARCHAR spellings)."""
    return "(" + HEX6_SQL.format(key=key) + ")"


def _hex6_spark(key: str) -> str:
    return (
        "(" + HEX6_SQL.format(key=key)
        .replace("strpos", "instr")
        .replace("AS VARCHAR", "AS STRING") + ")"
    )


def weighted_bernoulli_sample(
    df: DataFrame, key_col: str, weight_col: str, expected_k: int
) -> DataFrame:
    """Rows sampled with probability min(1, expected_k·w/W) — exact
    integer arithmetic end to end (weights must be non-negative
    integers whose products with 16^6·k stay inside int64)."""
    total = df.agg(F.sum(weight_col).alias("__total"))
    pred = F.expr(
        f"{_hex6_spark(key_col)} * __total < {expected_k} * {weight_col} * {16 ** 6}"
    )
    return (
        df.crossJoin(F.broadcast(total)).filter(pred).drop("__total")
    )

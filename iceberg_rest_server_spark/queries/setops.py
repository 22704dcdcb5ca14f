"""Q19: set operations (SURVEY.md §2F) — INTERSECT / EXCEPT / UNION ALL
between customer and supplier nation keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ._registry import register


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c, s


@register(
    "q19_intersect",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nkey
    """,
    doc="INTERSECT (distinct semantics) — planned as a left-semi join + distinct.",
)
def q19_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _sides(spark, sf_dir)
    return c.intersect(s).orderBy("nkey")


@register(
    "q19_except",
    oracle="""
    SELECT c_nationkey AS nkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nkey
    """,
    doc="EXCEPT (distinct semantics) — planned as a left-anti join + distinct.",
)
def q19_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _sides(spark, sf_dir)
    return c.subtract(s).orderBy("nkey")


@register(
    "q19_union_all",
    oracle="""
    SELECT nkey, count(*) AS cnt FROM (
      SELECT c_nationkey AS nkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) GROUP BY nkey ORDER BY nkey
    """,
    doc="UNION ALL (bag semantics), aggregated for a compact deterministic result.",
)
def q19_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _sides(spark, sf_dir)
    return c.unionAll(s).groupBy("nkey").agg(F.count(F.lit(1)).alias("cnt")).orderBy("nkey")


@register(
    "q19_union_distinct",
    oracle="""
    SELECT nkey FROM (
      SELECT c_nationkey AS nkey FROM customer
      UNION
      SELECT s_nationkey FROM supplier
    ) ORDER BY nkey
    """,
    doc="UNION with distinct semantics — union-all then one hash "
    "aggregate for the dedup (Spark plans union().distinct() exactly "
    "so; partial aggregation collapses each side map-side first).",
)
def q19_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _sides(spark, sf_dir)
    return c.union(s).distinct().orderBy("nkey")

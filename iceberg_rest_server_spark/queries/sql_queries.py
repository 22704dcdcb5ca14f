"""Q25–Q26: subqueries (scalar, correlated, IN) and CTEs, expressed in
Spark SQL so Catalyst's subquery decorrelation and CTE resolution do the
planning (SURVEY.md §2F). The scalar averages are written as
decimal-sum / count so the threshold is the same double on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import register_views
from ._registry import register

_Q25_SQL = """
SELECT count(*) AS cnt,
       min(o_orderkey) AS min_orderkey,
       max(o_orderkey) AS max_orderkey
FROM orders
WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM orders
      )
  AND o_custkey IN (
        SELECT c_custkey FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
        )
      )
"""

_Q25_CORR_SQL = """
SELECT c_custkey, c_nationkey
FROM customer c
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
      )
ORDER BY c_custkey
"""

_Q26_SQL = """
WITH cust_spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
)
SELECT n.n_name,
       count(*) AS n_cust,
       CAST(sum(CAST(cs.total AS DECIMAL(18,2))) AS DOUBLE) AS nation_spend,
       CAST(sum(cs.n_orders) AS BIGINT) AS nation_orders
FROM cust_spend cs
JOIN customer c ON c.c_custkey = cs.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register(
    "q25_subqueries",
    oracle=_Q25_SQL,
    doc="Scalar subquery (above-average price) + nested IN subqueries — "
    "Catalyst rewrites to joins (decorrelation / semi-join).",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_Q25_SQL)


@register(
    "q25_correlated_subquery",
    oracle=_Q25_CORR_SQL,
    doc="Correlated scalar subquery (per-nation average) — decorrelated by "
    "Catalyst into an aggregate + join.",
)
def q25_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_Q25_CORR_SQL)


@register(
    "q26_cte",
    oracle=_Q26_SQL,
    doc="CTE feeding a join + re-aggregation.",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_Q26_SQL)

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


# Q160/Q161 (round-7): the two SQL-surface features Spark 4 added that
# complete this module's subquery/CTE family — correlated LATERAL
# derived tables and RECURSIVE CTEs. Both oracles are the IDENTICAL SQL
# string run on DuckDB (the dialects agree except integer division:
# Spark `DIV`, DuckDB `//`).

_Q160_SPARK = """
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 3) l
ORDER BY n.n_name, l.c_acctbal DESC, l.c_name
"""


@register(
    "q160_lateral_topk_per_group",
    oracle=_Q160_SPARK,
    doc="Correlated LATERAL derived table: top-3 customers by account "
    "balance per nation, written as a per-row subquery with its own "
    "ORDER BY ... LIMIT. Catalyst decorrelates it into the scale plan "
    "you would hand-write: WindowGroupLimit(3) PARTIAL before the "
    "shuffle (each map task forwards at most 3 rows per nation), final "
    "WindowGroupLimit + row_number filter after, then a BROADCAST join "
    "back to nation — no per-nation re-execution, no cartesian. "
    "Tie-break on (acctbal DESC, name) makes the limit deterministic; "
    "acctbal doubles are raw input values so the hash matches.",
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_Q160_SPARK)


def _q161_sql(intdiv: str) -> str:
    return f"""
    WITH RECURSIVE tree AS (
      SELECT p_partkey, 0 AS depth,
             CAST(p_retailprice AS DECIMAL(18,2)) AS path_cost
      FROM part WHERE p_partkey = 1
      UNION ALL
      SELECT c.p_partkey, t.depth + 1,
             CAST(t.path_cost + CAST(c.p_retailprice AS DECIMAL(18,2))
                  AS DECIMAL(18,2))
      FROM part c JOIN tree t ON c.p_partkey {intdiv} 2 = t.p_partkey
    )
    SELECT p_partkey, depth, CAST(path_cost AS DOUBLE) AS path_cost
    FROM tree
    ORDER BY p_partkey
    """


@register(
    "q161_recursive_cte_hierarchy",
    oracle=_q161_sql("//"),
    doc="RECURSIVE CTE (Spark 4): walk the implicit binary hierarchy "
    "parent(p) = p DIV 2 over part from root 1, carrying depth and the "
    "decimal-exact root-path cost — the BOM/org-chart transitive-"
    "closure shape. Each recursion level is ONE equi-join of the "
    "frontier against part (broadcast-able frontier, never all-pairs); "
    "levels = tree depth (log2 N ≈ 11 at sf0.01), the same bounded-"
    "round discipline as the q49 pointer-jumping CC. Path costs are "
    "DECIMAL(18,2) folds so every engine sums them bit-identically.",
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part",))
    return spark.sql(_q161_sql("DIV"))

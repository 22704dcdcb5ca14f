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


# ---------------------------------------------------------------- Q181

_Q181_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
         AS n_discounted,
       CAST(count(DISTINCT l_partkey) FILTER (WHERE l_quantity >= 25)
            AS BIGINT) AS n_bulk_parts,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
              FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS rev_finished
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "q181_filtered_aggregates",
    oracle=_Q181_SQL,
    doc="FILTER-clause aggregates (SQL:2003 surface): four differently-"
    "filtered aggregates — plain, filtered count, filtered DISTINCT, "
    "filtered DECIMAL sum — in ONE pass over the fact table, the "
    "declarative replacement for N separate filtered scans or CASE-"
    "WHEN pyramids. The identical SQL string runs on both engines. "
    "Catalyst plans the mixed distinct/non-distinct filtered set via "
    "one Expand (same machinery as grouping sets) — still a single "
    "scan, map-side-combined. Money in DECIMAL for order-independence.",
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q181_SQL)


# ---------------------------------------------------------------- Q182

_Q182_SQL_DUCK = """
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN NULL ELSE o_orderstatus END AS status_key
  FROM orders
),
l AS (
  SELECT l_orderkey,
         CASE WHEN l_returnflag = 'R' THEN NULL ELSE l_linestatus END
           AS status_key,
         l_quantity
  FROM lineitem
)
SELECT o.status_key IS NULL AS key_is_null,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM o JOIN l
  ON o.o_orderkey = l.l_orderkey
 AND o.status_key IS NOT DISTINCT FROM l.status_key
GROUP BY 1
ORDER BY key_is_null
"""


@register(
    "q182_null_safe_join",
    oracle=_Q182_SQL_DUCK,
    doc="Null-safe equality join (Spark `<=>` ≡ SQL IS NOT DISTINCT "
    "FROM): NULL keys MATCH each other instead of vanishing — the "
    "semantics every identity-resolution join over incomplete keys "
    "needs, and a silent-wrong-answer trap with plain `=` (which drops "
    "all NULL-key rows). Derived nullable keys on both sides; output "
    "splits matched pairs by key-nullness so the NULL-matching "
    "behavior itself carries the hash. Plan: `<=>` is an equi-key to "
    "Catalyst — a plain hash join (null-safe comparison in the key), "
    "NOT a nested loop; the composite (orderkey, status_key) key "
    "shuffles like any other. Money/quantity in DECIMAL.",
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..tables import load

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(None)
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_status_key"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.when(F.col("l_returnflag") == "R", F.lit(None))
        .otherwise(F.col("l_linestatus"))
        .alias("l_status_key"),
        "l_quantity",
    )
    joined = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & F.col("o_status_key").eqNullSafe(F.col("l_status_key")),
    )
    return (
        joined.groupBy(F.col("o_status_key").isNull().alias("key_is_null"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("key_is_null")
    )


# ---------------------------------------------------------------- Q183


@register(
    "q183_union_by_name",
    oracle="""
    WITH parties AS (
      SELECT 'customer' AS party_type, c_custkey AS key,
             c_nationkey AS nationkey, c_acctbal AS acctbal
      FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS party_type, s_suppkey AS key,
             s_nationkey AS nationkey
      FROM supplier
    )
    SELECT party_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(acctbal) AS BIGINT) AS n_null_acctbal,
           CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM parties
    GROUP BY party_type
    ORDER BY party_type
    """,
    doc="Schema-evolution union: unionByName(allowMissingColumns=True) "
    "aligns two sources by COLUMN NAME and null-fills the columns one "
    "side lacks (suppliers carry no acctbal) — the union every "
    "multi-generation parquet lake needs, where positional UNION ALL "
    "silently mis-aligns or errors. DuckDB's UNION ALL BY NAME is the "
    "oracle spelling. The null-fill behavior itself carries the hash "
    "(per-type null counts + DECIMAL balance sum). Map-only + one "
    "small aggregate — scales like a scan.",
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..tables import load

    cust = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party_type"),
        F.col("c_custkey").alias("key"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party_type"),
        F.col("s_suppkey").alias("key"),
        F.col("s_nationkey").alias("nationkey"),
    )
    parties = cust.unionByName(supp, allowMissingColumns=True)
    return (
        parties.groupBy("party_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.count(F.lit(1)) - F.count("acctbal")).cast("bigint").alias(
                "n_null_acctbal"
            ),
            F.sum(F.col("acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("party_type")
    )


# ---------------------------------------------------------------- Q184

_Q184_SQL = """
WITH raw AS (
  SELECT event_id,
         CASE WHEN user_id % 7 = 0
              THEN regexp_extract(props, '[0-9]+', 0) || 'x'
              ELSE regexp_extract(props, '[0-9]+', 0) END AS k_str
  FROM events
),
parsed AS (
  SELECT event_id, k_str, TRY_CAST(k_str AS INTEGER) AS k
  FROM raw
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(k) AS BIGINT) AS n_unparseable,
       CAST(sum(k) AS BIGINT) AS sum_parsed,
       CAST(min(k) AS BIGINT) AS min_parsed,
       CAST(max(k) AS BIGINT) AS max_parsed
FROM parsed
"""


@register(
    "q184_try_cast_hygiene",
    oracle=_Q184_SQL.replace("regexp_extract(props, '[0-9]+', 0)",
                             "regexp_extract(props, '[0-9]+')"),
    doc="Error-safe parsing with TRY_CAST: a numeric field is extracted "
    "from the semi-structured props column and every 7th user's value "
    "is deterministically corrupted; TRY_CAST yields NULL instead of "
    "failing the job — the ingest-hygiene idiom that separates 'count "
    "and quarantine bad rows' from 'one malformed row kills a 100 TB "
    "job' (ANSI-mode CAST throws). Unparseable count, sum/min/max of "
    "the parsed values carry the hash. Map-only projection + one "
    "global aggregate. (Spark spells the regex group arg explicitly; "
    "DuckDB's regexp_extract defaults to group 0 — same match.)",
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_Q184_SQL)

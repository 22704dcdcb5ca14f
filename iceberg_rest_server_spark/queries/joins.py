"""Q07–Q14: join strategies (SURVEY.md §2F).

Broadcast vs shuffle choice is explicit where it matters at scale:
dimension tables (region/nation/supplier at TPC-H ratios) are broadcast;
fact-fact joins (orders ⋈ lineitem) shuffle on the join key and benefit
from AQE skew splitting. The as-of join (Q14) uses the union+window
operator from operators/asof.py — no range-join pair explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..tables import load
from ._exact import dec
from ._registry import register


def _revenue() -> F.Column:
    return F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).cast("double")


_REVENUE_SQL = "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)"


@register(
    "q07_inner_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS cnt,
           {_REVENUE_SQL} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Fact-fact equi join (shuffle/sort-merge at scale) + aggregate.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), _revenue().alias("revenue"))
        .orderBy("o_orderpriority")
    )


@register(
    "q08_broadcast_join",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM nation n JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Dimension join: nation (25 rows) is broadcast explicitly — no "
    "shuffle of the customer side at any scale.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q09_multiway_join",
    oracle=f"""
    SELECT n.n_name, {_REVENUE_SQL} AS revenue
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN supplier s  ON s.s_nationkey = n.n_nationkey
    JOIN customer c  ON c.c_nationkey = s.s_nationkey
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle; "
    "Catalyst + AQE handle ordering and strategy.",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, (orders.o_custkey == customer.c_custkey) & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy("n_name")
    )


@register(
    "q10_left_outer_join",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
    doc="Left outer join keeping customers with no orders (null-preserving "
    "aggregate: count skips nulls, sum of empty group stays null).",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q11_left_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left semi join: customers having ≥1 order; no row multiplication.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q12_left_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left anti join: customers with no orders.",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "q13_theta_join",
    oracle="""
    SELECT p.p_brand, count(*) AS cnt,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size % 10
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    doc="Theta join: equi key + non-equi residual predicate (stays a hash "
    "join with a post-filter, not a cartesian product).",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey) & (li.l_quantity > part.p_size % 10),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy("p_brand")
    )


@register(
    "q14_asof_join",
    oracle="""
    SELECT c.event_id, c.user_id,
           (SELECT max(v.ts) FROM events v
             WHERE v.event_type = 'view' AND v.user_id = c.user_id
               AND v.ts <= c.ts) AS asof_view_ts
    FROM events c
    WHERE c.event_type = 'click'
    ORDER BY c.event_id
    """,
    doc="As-of join: for each click, the most recent view by the same user "
    "at or before the click. Spark side uses the union+window operator "
    "(operators/asof.py) — one shuffle, no range-join explosion.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"ts": "asof_view_ts"},
    )
    return out.select("event_id", "user_id", "asof_view_ts").orderBy("event_id")


@register(
    "q54_full_outer_join",
    oracle="""
    WITH rich AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    ),
    freq AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    )
    SELECT coalesce(r.c_custkey, f.o_custkey) AS custkey,
           CAST(r.c_acctbal AS DOUBLE) AS acctbal,
           f.n_orders,
           CAST(r.c_custkey IS NOT NULL AND f.o_custkey IS NOT NULL AS BOOLEAN) AS in_both
    FROM rich r FULL OUTER JOIN freq f ON r.c_custkey = f.o_custkey
    ORDER BY custkey
    """,
    doc="Full outer join of two overlapping-but-distinct key sets "
    "(high-balance customers vs frequent orderers) — both sides "
    "contribute unmatched rows, exercising null production on each "
    "side. Shuffle hash join on the key; at scale AQE converts to "
    "broadcast if one filtered side collapses.",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    freq = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )
    j = rich.join(freq, rich.c_custkey == freq.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
        "n_orders",
        (F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull()).alias("in_both"),
    ).orderBy("custkey")


@register(
    "q119_right_outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           o.o_orderkey, o.o_totalprice
    FROM orders o
    RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
                               AND o.o_orderdate >= DATE '2001-01-01'
    ORDER BY c.c_custkey, o.o_orderkey
    """,
    doc="Right outer join with a join-side (not WHERE) filter on the "
    "stream side — customers preserved even when no 2001+ order "
    "matches, NULLs on the order columns. Completes the outer-join "
    "family (left: q10, full: q54). Spark plans the preserved side as "
    "the build/stream choice AQE picks; the date predicate stays IN "
    "the join condition (a WHERE would wrongly drop unmatched "
    "customers).",
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderdate >= F.lit("2001-01-01"))
    return (
        o.join(c, cond, "right_outer")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "q124_asof_attribution",
    oracle="""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    m AS (
      SELECT p.user_id, p.ts,
             (SELECT max(v.ts) FROM v
              WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS vts
      FROM p
    )
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN vts IS NOT NULL
                          AND vts >= ts - INTERVAL 1 HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
    FROM m GROUP BY 1 ORDER BY 1
    """,
    doc="Last-touch attribution via tolerance-bounded as-of join "
    "(pandas merge_asof semantics, distributed): each purchase is "
    "attributed to the same user's most recent view, but only if that "
    "view is at most 1 hour stale — the staleness bound marketing/"
    "feature-store joins need (a 3-day-old view is not a 'touch'). "
    "Same union+window single-shuffle plan as q14; the tolerance is a "
    "post-window projection, never a range-join condition, so skewed "
    "users cannot explode pairs. The oracle states the same semantics "
    "as a correlated max-subquery.",
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    matched = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="vts",
        right_cols={"vts": "view_ts"},
        inclusive=True,
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return (
        matched.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("view_ts").isNotNull().cast("long")).alias("n_attributed"),
        )
        .orderBy("day")
    )

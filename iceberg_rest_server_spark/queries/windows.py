"""Q15–Q18: multi-dimensional aggregates (rollup/cube), window ranking,
window frames, top-k (SURVEY.md §2F).

Determinism notes: ranking windows order by a unique tiebreaker
(o_orderkey) wherever the frame or row_number depends on physical order;
rank/dense_rank are computed over the value alone (well-defined under
ties). Frame sums go through decimal (see _exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load, register_views
from ._exact import dec
from ._registry import register


@register(
    "q15_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="GROUP BY ROLLUP: hierarchical subtotals + grand total.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "q15_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="GROUP BY CUBE: all grouping-set combinations.",
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


_Q15_GS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register(
    "q15_grouping_sets",
    oracle=_Q15_GS_SQL,
    doc="Explicit GROUPING SETS (disjoint single-dimension sets + grand total).",
)
def q15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q15_GS_SQL)


@register(
    "q15_sliding_window",
    oracle="""
    SELECT ws AS window_start, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT unnest([
        TIMESTAMP '1970-01-01'
          + ((epoch_us(ts) // 1800000000) * 1800) * INTERVAL 1 SECOND,
        TIMESTAMP '1970-01-01'
          + ((epoch_us(ts) // 1800000000) * 1800 - 1800) * INTERVAL 1 SECOND
      ]) AS ws, value
      FROM events
    )
    GROUP BY ws
    ORDER BY ws
    """,
    doc="Sliding (hopping) window: 1 h windows every 30 min over events — "
    "each event lands in exactly two windows; the oracle expands the "
    "two hop-aligned window starts per event.",
)
def q15_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), "cnt", "total_value")
        .orderBy("window_start")
    )


@register(
    "q16_window_ranking",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             row_number()  OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank()        OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
             dense_rank()  OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Top-3 orders per customer: row_number (unique tiebreak), rank, "
    "dense_rank. One shuffle on o_custkey serves all three.",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    w_val = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_val).alias("rnk"),
            F.dense_rank().over(w_val).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q17_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum,
           CAST(lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
           CAST(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Analytic window with ROWS frame (rolling 3-order sum, decimal-exact) "
    "plus lag/lead over the same sort — one window shuffle total.",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_frame = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w_frame).cast("double").alias("rolling_sum"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q18_topk",
    oracle="""
    SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey
    LIMIT 10
    """,
    doc="Top-10 customers by spend: aggregate + TakeOrderedAndProject "
    "(per-partition top-k, no global sort).",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
        .limit(10)
    )


@register(
    "q55_window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist() OVER w AS DOUBLE) AS cume,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(nth_value(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Window navigation/distribution functions: ntile, percent_rank, "
    "cume_dist, first_value, nth_value — all over ONE window spec, so "
    "Catalyst plans a single shuffle+sort on (o_custkey; date,key). "
    "percent_rank/cume_dist are (k-1)/(n-1)-style integer-derived "
    "divisions — bit-deterministic across engines.",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # nth_value/first_value default frame in both engines is RANGE
    # UNBOUNDED PRECEDING..CURRENT ROW; with a unique sort key that makes
    # nth_value(.,2) null until row 2, matching DuckDB.
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).cast("double").alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q61_grouping_id",
    oracle="""
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           coalesce(c_nationkey, -1) AS nation,
           GROUPING(c_mktsegment) * 2 + GROUPING(c_nationkey) AS gid,
           count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    ORDER BY gid, segment, nation
    """,
    doc="ROLLUP with GROUPING() level identification — consumers of "
    "multi-level aggregates need to tell a real NULL group from a "
    "rollup supertotal; grouping_id is the standard disambiguator. One "
    "Expand + single hash aggregate, same as plain rollup.",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (
        customer.rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(dec("c_acctbal")).cast("double").alias("acctbal_sum"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("c_nationkey", F.lit(-1)).alias("nation"),
            "gid",
            "n_cust",
            "acctbal_sum",
        )
        .orderBy("gid", "segment", "nation")
    )


@register(
    "q86_gap_fill_ffill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY 1
    ), grid AS (
      SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hr
      FROM bounds b
    )
    SELECT g.event_type, g.hr,
           coalesce(h.n_events, 0) AS n_events,
           last_value(h.hour_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hr
             ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr
    ORDER BY g.event_type, g.hr
    """,
    doc="Time-series gap filling + forward fill — an operator Spark has "
    "no primitive for: per group, materialize the dense hourly grid "
    "between its first and last observation (sequence+explode — rows "
    "generated distributed, never on the driver), left-join the sparse "
    "aggregates, and carry the last seen value across gaps with "
    "last(ignorenulls) over an unbounded-preceding window. One shuffle "
    "on the group key serves the grid join and the fill window.",
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("hour_value"),
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_type", "hr")
    )

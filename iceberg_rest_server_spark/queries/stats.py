"""Q41+: statistics operators — exact percentiles and histogram binning.
(Beyond the SURVEY §2F base inventory; rounds out the aggregate surface
a lakehouse analytics engine is expected to answer.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ._exact import dec
from ._registry import register


@register(
    "q41_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` ≡ "
    "DuckDB quantile_cont: both linear-interpolate on the sorted set). "
    "All five stats come from ONE array-argument accumulator (min/max "
    "are exactly percentile 0.0/1.0) so the group's value buffer is "
    "collected and sorted once, not five times. Exact percentile still "
    "buffers every group value — correct-but-bounded-scale; "
    "q89_approx_percentiles is the sketch-based 100 TB path for when "
    "per-group cardinality exceeds executor memory.",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pcts = F.percentile(
        "o_totalprice",
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99), F.lit(0.0), F.lit(1.0)),
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(pcts.alias("pcts"))
        .select(
            "o_orderpriority",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
            F.col("pcts")[3].alias("lo"),
            F.col("pcts")[4].alias("hi"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q42_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Fixed-width histogram binning (floor-divide bucketing + aggregate) "
    "— the scalable building block for distribution profiling.",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "q62_stats_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           sqrt(greatest(0, sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
           (sxy - sx * sy / n)
             / (sqrt(greatest(0, sxx - sx * sx / n))
                * sqrt(greatest(0, syy - sy * sy / n))) AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
    doc="Statistical profiling (mean/stddev/covariance/correlation per "
    "group) computed from EXACT decimal power sums in one aggregate "
    "pass, with the float math applied once to the exact sums — "
    "native stddev/corr accumulate doubles in partition order and are "
    "not reproducible under repartitioning at 100 TB; this formulation "
    "is bit-deterministic and map-side combines like any sum.",
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # clamp: floating-point cancellation can push a tiny variance term
    # epsilon-negative; DuckDB raises on sqrt(<0) while Spark yields NaN,
    # so keep the formulation total (and identical) on both sides
    vx = F.greatest(F.lit(0.0), sxx - sx * sx / n)
    vy = F.greatest(F.lit(0.0), syy - sy * sy / n)
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        F.sqrt(vx / (n - 1)).alias("stddev_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qty_price"),
        ((sxy - sx * sy / n) / (F.sqrt(vx) * F.sqrt(vy))).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "q88_cms_heavy_hitters",
    oracle=None,
    doc="Count-min-sketch heavy hitters: user frequencies estimated from "
    "a d×w counter matrix built as d map-side-combining aggregations "
    "(bounded memory at any scale — the full key space never shuffles), "
    "then keys whose estimate clears the threshold. CMS never "
    "underestimates, so recall of true heavy hitters is 1 by "
    "construction; precision is checked against exact counts in "
    "tests/test_sketch.py. Engine-specific estimates ⇒ rows-only check.",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_counters, cms_estimate

    events = load(spark, sf_dir, "events")
    counters = cms_counters(events, "user_id").persist()
    keys = events.select("user_id").distinct()
    est = cms_estimate(counters, keys, "user_id")
    n = events.count()
    threshold = max(n // 200, 1)  # 0.5% heavy hitters
    return est.filter(F.col("est_count") >= threshold).orderBy("user_id")


@register(
    "q89_approx_percentiles",
    oracle=None,
    doc="Approximate percentiles (Greenwald-Khanna style "
    "percentile_approx, single-pass mergeable summaries) per group — "
    "the bounded-memory tier of q41's exact percentiles. Accuracy vs "
    "the exact answer is asserted in tests/test_sketch.py; sketch "
    "internals are engine-specific ⇒ rows-only check.",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q91_equidepth_histogram",
    oracle="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, count(*) AS cnt,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM t GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-depth (quantile-bucketed) histogram via ntile with a "
    "unique tiebreak — the complement of q42's fixed-width bins: bucket "
    "boundaries adapt to the distribution. The global sort is the one "
    "serial point; at scale it is a range-partitioned sort (Spark's "
    "TakeOrderedAndProject/RangePartitioner), not a single-task sort.",
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = orders.select(
        "o_totalprice", F.ntile(10).over(w).alias("bucket")
    )
    return (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q92_trailing_window_agg",
    oracle="""
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    doc="Trailing 1-hour range-frame aggregates over an irregular event "
    "series (per-user rolling count/sum — the feature-engineering "
    "staple). Spark's RANGE frame needs a numeric order key, so the "
    "frame runs over unix microseconds with a µs-exact 1h bound — "
    "semantically identical to the oracle's INTERVAL frame. One shuffle "
    "on user_id; the frame scan is linear per partition.",
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_1h"),
        )
        .orderBy("event_id")
    )


@register(
    "q97_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT n.n_name,
             sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS revenue_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, CAST(revenue_dec AS DOUBLE) AS revenue,
           CAST(revenue_dec AS DOUBLE)
             / CAST(sum(revenue_dec) OVER () AS DOUBLE) AS revenue_share
    FROM rev ORDER BY n_name
    """,
    doc="Ratio-to-report: per-nation revenue share via an unpartitioned "
    "window aggregate over the (tiny, post-aggregate) per-nation rows — "
    "the grand total never re-scans the facts. The empty-frame window "
    "runs on ≤ |nations| rows in one task; the fact-side work is the "
    "usual map-side-combining aggregate. Share division happens in "
    "double on both engines after exact decimal sums.",
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
            ).alias("revenue_dec")
        )
    )
    # the grand total is window-summed as DECIMAL (exact, order-
    # independent) and converted to double once — a double window sum
    # would round differently per summation order across engines
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        F.col("revenue_dec").cast("double").alias("revenue"),
        (
            F.col("revenue_dec").cast("double")
            / F.sum("revenue_dec").over(w).cast("double")
        ).alias("revenue_share"),
    ).orderBy("n_name")


@register(
    "q98_median_absolute_deviation",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(m.med_price AS DOUBLE) AS med_price,
           CAST(quantile_cont(abs(l.l_extendedprice - m.med_price), 0.5) AS DOUBLE)
             AS mad_price
    FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag, m.med_price
    ORDER BY l.l_returnflag
    """,
    doc="Median absolute deviation per group — robust dispersion needing "
    "TWO dependent aggregation passes (median, then median of absolute "
    "deviations from it). The per-group medians are a tiny broadcast "
    "back onto the facts; both passes use the exact interpolated "
    "percentile so results are deterministic and engine-identical. "
    "Like q41, exact percentile buffers each group's values; at 100 TB "
    "swap both passes to percentile_approx (q89's path) — the MAD "
    "structure (broadcast medians back onto the facts) is unchanged.",
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "med_price")
        .agg(
            F.expr("percentile(abs(l_extendedprice - med_price), 0.5)").alias(
                "mad_price"
            )
        )
        .select(
            "l_returnflag",
            F.col("med_price").cast("double").alias("med_price"),
            F.col("mad_price").cast("double").alias("mad_price"),
        )
        .orderBy("l_returnflag")
    )

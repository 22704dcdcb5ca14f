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
    # CMS estimates are seed/engine-specific, so the raw est_count can't
    # be hash-compared — but the sketch's guarantees CAN: (a) CMS never
    # undercounts, so {est ≥ thr} ⊇ {exact ≥ thr} and intersecting the
    # sketch-selected keys with exact counts yields EXACTLY the true
    # heavy-hitter set (decidable); (b) est ≤ exact + ceil(e/w · N) with
    # w=2048 — both emitted as booleans the oracle pins TRUE.
    oracle="""
    WITH thr AS (
      SELECT greatest(count(*) // 200, 1) AS t FROM events
    ), c AS (
      SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id
    )
    SELECT c.user_id, c.exact_count,
           TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM c, thr WHERE c.exact_count >= thr.t
    ORDER BY c.user_id
    """,
    doc="Count-min-sketch heavy hitters: user frequencies estimated from "
    "a d×w counter matrix built as d map-side-combining aggregations "
    "(bounded memory at any scale — the full key space never shuffles), "
    "then keys whose estimate clears the 0.5% threshold. Self-verified: "
    "the CMS-selected keys are rescored with their exact counts — "
    "no-undercount means the exact-filtered intersection IS the true "
    "heavy set — and the eps·N overcount bound is asserted per key. "
    "At 100 TB you keep only the sketch pass; the exact rescore here is "
    "confined to the (tiny) selected-key set anyway.",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import CMS_WIDTH, cms_counters, cms_estimate

    events = load(spark, sf_dir, "events")
    counters = cms_counters(events, "user_id", width=CMS_WIDTH)
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(counters, exact.select("user_id"), "user_id", width=CMS_WIDTH)
    n = events.count()
    threshold = max(n // 200, 1)  # 0.5% heavy hitters
    eps_bound = int(2.718281828 / CMS_WIDTH * n) + 1
    return (
        est.filter(F.col("est_count") >= threshold)
        .join(exact, "user_id")
        .filter(F.col("exact_count") >= threshold)
        .select(
            "user_id",
            "exact_count",
            (F.col("est_count") >= F.col("exact_count")).alias("est_ge_exact"),
            (F.col("est_count") <= F.col("exact_count") + eps_bound).alias(
                "est_within_eps"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "q89_approx_percentiles",
    # The sketch values are engine-specific, so the query emits the
    # EXACT interpolated quantiles (hash-comparable: Spark percentile ≡
    # DuckDB quantile_cont) plus booleans asserting each approx value
    # landed within 1% relative error of its exact counterpart — the
    # measured error with accuracy=10000 is ≤0.2% at every SF, so the
    # gate has 5× margin while still being a real assertion.
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5)  AS p50_exact,
           quantile_cont(l_extendedprice, 0.9)  AS p90_exact,
           quantile_cont(l_extendedprice, 0.99) AS p99_exact,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Approximate percentiles (Greenwald-Khanna style "
    "percentile_approx, single-pass mergeable summaries) per group — "
    "the bounded-memory 100 TB tier of q41's exact percentiles. "
    "Self-verified: each sketch value is compared in-query against the "
    "exact interpolated quantile (≤1% relative error booleans pinned "
    "TRUE by the oracle); the exact values carry the hash match.",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    tol = 0.01
    qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("a"),
        F.percentile("l_extendedprice", qs).alias("e"),
    )

    def ok(i: int):
        return (F.abs(F.col("a")[i] - F.col("e")[i]) / F.col("e")[i] <= tol).alias(
            f"p{(50, 90, 99)[i]}_ok"
        )

    return agg.select(
        "l_returnflag",
        F.col("e")[0].alias("p50_exact"),
        F.col("e")[1].alias("p90_exact"),
        F.col("e")[2].alias("p99_exact"),
        ok(0),
        ok(1),
        ok(2),
    ).orderBy("l_returnflag")


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


@register(
    "q111_hll_union_rollup",
    # Apache DataSketches HLL binary images are engine-specific, so the
    # sketches themselves can't be hash-compared — the query instead
    # proves the MERGEABILITY contract: per-day sketches unioned up to
    # per-event-type must estimate within 5% of the exact distinct count
    # (lgk=12 ⇒ ~1.6% rse, so 3σ margin). Exact counts carry the hash.
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS union_within_tol
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Mergeable-sketch rollup: per-(event_type, day) HLL sketches of "
    "user_id built with hll_sketch_agg, then unioned per event_type with "
    "hll_union_agg — the re-aggregation pattern that lets a 100 TB "
    "pipeline keep daily sketch partials and answer any coarser rollup "
    "without rescanning raw data (impossible with exact distinct "
    "counts, which don't merge). Self-verified: the unioned estimate "
    "must land within 5% of the exact distinct count per group.",
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("union_within_tol"),
        )
        .orderBy("event_type")
    )


@register(
    "q122_grouped_ols_trend",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             count(*) AS n,
             CAST(sum(CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS DECIMAL(18,2))
                      * CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
    FROM s ORDER BY o_orderpriority
    """,
    doc="Grouped least-squares trend (price drift per order priority): "
    "closed-form OLS slope/intercept from EXACT decimal power sums in "
    "ONE aggregate pass — the q62 pattern extended to regression. The "
    "float division happens once per group on exact sums, so the "
    "result is bit-deterministic under any partitioning (a naive "
    "per-partition double accumulation is not); map-side combines like "
    "any sum, output is group-count-sized. Day offsets from a fixed "
    "epoch keep x integer-exact.",
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("decimal(18,2)")
    y = F.col("o_totalprice").cast("decimal(18,2)")
    s = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "o_orderpriority",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("o_orderpriority")


@register(
    "q144_theta_set_operations",
    # Sketch images are engine-specific; the exact set-algebra counts
    # carry the hash and the ≤5%-error booleans (lgk=12 ⇒ ~1.6% rse,
    # 3σ margin) are pinned TRUE by the oracle.
    oracle="""
    WITH t AS (SELECT min(event_type) AS a,
                      max(event_type) AS b FROM events),
    ua AS (SELECT DISTINCT user_id FROM events, t WHERE event_type = t.a),
    ub AS (SELECT DISTINCT user_id FROM events, t WHERE event_type = t.b)
    SELECT (SELECT count(*) FROM (SELECT user_id FROM ua UNION
                                  SELECT user_id FROM ub)) AS exact_union,
           (SELECT count(*) FROM (SELECT user_id FROM ua INTERSECT
                                  SELECT user_id FROM ub)) AS exact_intersect,
           (SELECT count(*) FROM (SELECT user_id FROM ua EXCEPT
                                  SELECT user_id FROM ub)) AS exact_diff,
           TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
    """,
    doc="Theta-sketch set algebra (Apache DataSketches via Spark 4 "
    "theta_sketch_agg / theta_union / theta_intersection / "
    "theta_difference): user-set overlap between two event types "
    "estimated from two mergeable sketches — the capability HLL "
    "fundamentally lacks (HLL unions but cannot intersect). At 100 TB "
    "you keep one small sketch per segment and answer any "
    "overlap/exclusion question without rescanning or shuffling the "
    "raw key sets. Self-verified: each estimate must land within 5% "
    "of the exact distinct-set computation run in the same job.",
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ab = events.agg(
        F.min("event_type").alias("a"), F.max("event_type").alias("b")
    ).collect()[0]
    a_users = events.filter(F.col("event_type") == ab["a"]).select("user_id")
    b_users = events.filter(F.col("event_type") == ab["b"]).select("user_id")
    sk = (
        a_users.agg(F.theta_sketch_agg("user_id").alias("ska"))
        .crossJoin(b_users.agg(F.theta_sketch_agg("user_id").alias("skb")))
        .select(
            F.theta_sketch_estimate(F.theta_union("ska", "skb")).alias("est_union"),
            F.theta_sketch_estimate(F.theta_intersection("ska", "skb")).alias(
                "est_intersect"
            ),
            F.theta_sketch_estimate(F.theta_difference("ska", "skb")).alias(
                "est_diff"
            ),
        )
        .collect()[0]
    )
    exact_union = a_users.union(b_users).distinct().count()
    exact_intersect = a_users.distinct().intersect(b_users.distinct()).count()
    exact_diff = a_users.distinct().exceptAll(b_users.distinct()).count()

    def ok(est: float, exact: int) -> bool:
        return exact == 0 or abs(est - exact) / exact <= 0.05

    return spark.createDataFrame(
        [
            (
                exact_union,
                exact_intersect,
                exact_diff,
                ok(sk["est_union"], exact_union),
                ok(sk["est_intersect"], exact_intersect),
                ok(sk["est_diff"], exact_diff),
            )
        ],
        "exact_union long, exact_intersect long, exact_diff long, "
        "union_ok boolean, intersect_ok boolean, diff_ok boolean",
    )


@register(
    "q145_kll_quantile_rollup",
    # Same mergeability contract as q111's HLL rollup, for QUANTILES.
    # KLL's guarantee is on RANK error (k=200 ⇒ ~1.65% at 99%
    # confidence, preserved under merge), NOT value error — a
    # value-relative gate flaked when the per-day partials' partition
    # merge order shifted (observed r6: one p50_ok=False run on
    # identical data). The gate is therefore the rank band: the merged
    # estimate must land between the exact 45th and 55th percentiles
    # (±5% rank ≫ the 1.65% bound). Exact quantiles carry the hash.
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50_exact,
           TRUE AS p50_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Mergeable quantile rollup (Apache DataSketches KLL via Spark 4 "
    "kll_sketch_agg_double / kll_sketch_merge_double): per-(event_type, "
    "day) sketches of value merged up to per-event-type, then the "
    "median read from the merged sketch — the re-aggregation pattern "
    "that lets a 100 TB pipeline keep daily quantile partials and "
    "answer any coarser rollup without rescanning raw data (exact "
    "percentiles don't merge; GK percentile_approx merges but is not "
    "exposed as a storable partial). Self-verified: the merged-sketch "
    "median must land inside the exact 45th–55th percentile band (the "
    "rank-error form of KLL's guarantee).",
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    # kll_sketch_merge_double is a binary scalar (not an aggregate), so
    # the per-day partials fold pairwise: collect the (days-per-type,
    # bounded) sketch list, sort it for a deterministic merge order, and
    # left-fold with the merge function
    skl = F.sort_array(F.collect_list("sk"))
    merged = F.aggregate(
        F.slice(skl, 2, F.greatest(F.size(skl) - 1, F.lit(0))),
        F.element_at(skl, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    rolled = daily.groupBy("event_type").agg(
        F.kll_sketch_get_quantile_double(merged, F.lit(0.5)).alias("p50_est")
    )
    exact = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.percentile("value", F.lit(0.45)).alias("p45_exact"),
        F.percentile("value", F.lit(0.55)).alias("p55_exact"),
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "p50_exact",
            (
                (F.col("p50_est") >= F.col("p45_exact"))
                & (F.col("p50_est") <= F.col("p55_exact"))
            ).alias("p50_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "q150_winsorized_stats",
    # Cutoffs are exact interpolated percentiles (Spark `percentile` ≡
    # DuckDB quantile_cont bit-for-bit — proven by q41's hash match);
    # clamped values are rounded to 2 dp and summed as decimals so the
    # winsorized moments are partition-order-independent.
    oracle="""
    WITH cut AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    ), w AS (
      SELECT e.event_type,
             CAST(round(least(greatest(e.value, c.lo), c.hi), 2)
                  AS DECIMAL(18,2)) AS wv,
             CASE WHEN e.value < c.lo THEN 1 ELSE 0 END AS clo,
             CASE WHEN e.value > c.hi THEN 1 ELSE 0 END AS chi
      FROM events e JOIN cut c ON c.event_type = e.event_type
    ), agg AS (
      SELECT event_type, count(*) AS n,
             sum(wv) AS s1, sum(wv * wv) AS s2,
             sum(clo) AS n_lo, sum(chi) AS n_hi
      FROM w GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n_lo AS BIGINT) AS n_lo, CAST(n_hi AS BIGINT) AS n_hi,
           round(CAST(s1 AS DOUBLE) / n, 6) AS win_mean,
           round(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)), 6) AS win_std
    FROM agg
    ORDER BY event_type
    """,
    doc="Winsorized (5%/95%-clamped) robust moments per event type — the "
    "outlier-resistant feature normalization a training pipeline applies "
    "before z-scoring heavy-tailed signals (complements q142's raw "
    "z-scores and q98's MAD). One exact-percentile aggregate produces "
    "the cutoff table (group-cardinality-sized, broadcast back); the "
    "clamp + decimal power sums are one map-side-combining pass — two "
    "corpus scans total, no window over the fact table. 100 TB: "
    "percentile buffers per-group values (q89's sketch path is the "
    "swap-in when groups outgrow memory); everything else is "
    "aggregate-shaped.",
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    cut = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    wv = F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 2).cast(
        "decimal(18,2)"
    )
    w = events.join(F.broadcast(cut), "event_type").select(
        "event_type",
        wv.alias("wv"),
        F.when(F.col("value") < F.col("lo"), 1).otherwise(0).alias("clo"),
        F.when(F.col("value") > F.col("hi"), 1).otherwise(0).alias("chi"),
    )
    agg = w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wv").alias("s1"),
        F.sum(F.col("wv") * F.col("wv")).alias("s2"),
        F.sum("clo").alias("n_lo"),
        F.sum("chi").alias("n_hi"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    return agg.select(
        "event_type",
        "n",
        "n_lo",
        "n_hi",
        F.round(s1d / F.col("n"), 6).alias("win_mean"),
        F.round(
            F.sqrt((s2d - s1d * s1d / F.col("n")) / (F.col("n") - 1)), 6
        ).alias("win_std"),
    ).orderBy("event_type")

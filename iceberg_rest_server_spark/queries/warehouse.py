"""Q189–Q203: warehouse-operations & data-quality tier — the jobs a
lakehouse team runs against the SAME tables between analytics rounds:
stable id assignment, OHLC downsampling, fraud/entry-error screens
(Benford), referential-integrity audits, inverted-index builds,
distribution-shift tests (KS), concentration metrics (Gini), adoption
curves (running distinct), engagement streaks (gaps-and-islands),
content-entropy quality scoring, multi-touch attribution, rank-based
feature transforms, deterministic priority sampling, n-gram novelty
scoring, and sliding-window distinct counts (DAU/WAU).

Determinism (driver hash-match contract, memory: the playbook): every
float output is (a) double division of exact integers — IEEE-identical
in both engines, (b) a DECIMAL-accumulated sum (addition-order-free), or
(c) ln() applied to bit-identical exact-integer-ratio inputs with the
result rounded at 6 dp (the q126/q146 precedent). No bare decimal
literals in division; money goes through DECIMAL(18,2) cents.

Scale notes are per-docstring; the recurring pattern in this tier is
TWO-LEVEL CUMULATION (q189, q194): a global running total is computed as
row_number/cumsum WITHIN range buckets plus a bucket-offset table that
is metadata-sized (n/bucket_width rows), so no window ever runs on an
unpartitioned data-sized stream — the classic distributed prefix-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sampling import hex6_sql
from ..tables import load
from ._registry import register

# ---------------------------------------------------------------- Q189


@register(
    "q189_stable_row_ids",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) AS global_id
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Stable dense global row ids 1..N ordered by key — the id "
    "assignment every training-data export and dimension build needs, "
    "computed WITHOUT a single-partition global sort: rows bucket by "
    "key range (o_orderkey >> 12, an exact bit shift), each bucket "
    "ranks locally (window partitioned by bucket), and bucket offsets "
    "come from a cumsum over the metadata-sized bucket-count table "
    "(N/4096 rows) — the distributed prefix-sum. Result is exactly "
    "row_number() OVER (ORDER BY key), verified by the oracle. "
    "100 TB: both shuffles hash on the bucket key; the only ordered "
    "window runs over bucket counts (metadata), never over data. "
    "monotonically_increasing_id() gives stable-but-gapped ids with "
    "zero shuffles; this is the gap-free contract.",
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    bucketed = orders.withColumn("bkt", F.shiftright("o_orderkey", 12))
    counts = bucketed.groupBy("bkt").agg(F.count(F.lit(1)).alias("c"))
    # offsets: cumsum over the tiny bucket table (metadata-sized window)
    offsets = counts.select(
        "bkt",
        (
            F.sum("c").over(
                Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("off"),
    ).fillna({"off": 0})
    w = Window.partitionBy("bkt").orderBy("o_orderkey")
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "bkt")
        .select(
            "o_orderkey", (F.col("off") + F.col("rn")).cast("bigint").alias("global_id")
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------- Q190


@register(
    "q190_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS bar_ts, event_type, value, ts, event_id,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT bar_ts, event_type,
           count(*) AS n_events,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM r
    GROUP BY bar_ts, event_type
    ORDER BY bar_ts, event_type
    """,
    doc="OHLC(V) time-series downsampling: hourly bars per event_type — "
    "open/close are the first/last value by (ts, event_id) (the id "
    "tiebreak makes simultaneous events deterministic), high/low are "
    "min/max, volume is the DECIMAL-accumulated value sum. Open/close "
    "ride the same two windows in both engines; all emitted doubles are "
    "raw input values (no arithmetic) so nothing can drift. 100 TB: one "
    "hash exchange on (bar, type) serves both windows AND the final "
    "aggregate (the q164 shared-partitioning discipline); bars output "
    "is hours×types — metadata-sized however large the input.",
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("bar_ts"), "event_type", "value", "ts", "event_id"
    )
    wa = Window.partitionBy("bar_ts", "event_type").orderBy("ts", "event_id")
    wd = Window.partitionBy("bar_ts", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.select(
        "bar_ts",
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        r.groupBy("bar_ts", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
        )
        .orderBy("bar_ts", "event_type")
    )


# ---------------------------------------------------------------- Q191

# Benford expected first-digit rates log10(1 + 1/d), pre-rounded to 6 dp
# so both engines consume the SAME literal — no runtime log10 anywhere.
_BENFORD = {
    1: 0.301030,
    2: 0.176091,
    3: 0.124939,
    4: 0.096910,
    5: 0.079181,
    6: 0.066947,
    7: 0.057992,
    8: 0.051153,
    9: 0.045757,
}


@register(
    "q191_benford_deviation",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM orders
    ), digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             count(*) AS n_obs
      FROM cents GROUP BY 1
    ), bf AS (
      -- cast the literal grid: a bare VALUES decimal would type the
      -- column DECIMAL(7,6), which Spark's result (double) can't match
      SELECT digit, CAST(benford_rate AS DOUBLE) AS benford_rate
      FROM (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD.items())})
           AS t0(digit, benford_rate)
    )
    SELECT b.digit, COALESCE(d.n_obs, 0) AS n_obs,
           round(COALESCE(d.n_obs, 0) / CAST(t.n AS DOUBLE), 6) AS obs_rate,
           b.benford_rate,
           round(abs(COALESCE(d.n_obs, 0) / CAST(t.n AS DOUBLE)
                     - b.benford_rate), 6) AS abs_dev
    FROM bf b
    LEFT JOIN digits d ON d.digit = b.digit
    CROSS JOIN (SELECT sum(n_obs) AS n FROM digits) t
    ORDER BY b.digit
    """,
    doc="Benford's-law first-digit screen over order totals — the "
    "entry-error / synthetic-data detector auditors run on money "
    "columns. Totals quantize to exact integer cents through "
    "DECIMAL(18,2) (first digit of cents = first digit of the amount); "
    "digit extraction is integer-to-string (engine-identical, unlike "
    "double formatting); expected rates are pre-rounded literals, so "
    "the only floats are int/int divisions minus a shared literal. "
    "100 TB: one 9-group aggregate; the digit grid joins broadcast.",
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    digits = (
        orders.select(
            F.substring(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    bf = spark.createDataFrame(
        list(_BENFORD.items()), "digit int, benford_rate double"
    )
    total = digits.agg(F.sum("n_obs").alias("n"))
    obs_rate = F.coalesce(F.col("n_obs"), F.lit(0)) / F.col("n").cast("double")
    return (
        F.broadcast(bf)
        .join(digits, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            F.round(obs_rate, 6).alias("obs_rate"),
            "benford_rate",
            F.round(F.abs(obs_rate - F.col("benford_rate")), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------- Q192


@register(
    "q192_fk_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           (SELECT count(*) FROM lineitem) AS child_rows,
           (SELECT count(*) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows,
           (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS null_keys
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE l.l_partkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)),
           (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE l.l_suppkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey)),
           (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
             WHERE c.c_nationkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT count(*) FROM customer WHERE c_nationkey IS NULL)
    ORDER BY relation
    """,
    doc="Referential-integrity audit across the star schema's five FK "
    "edges: child rows, orphans (left-anti join on the parent), and "
    "null keys per relation — the pre-publication contract check every "
    "warehouse load runs. Zero orphans on consistent data is the "
    "expected (and asserted) answer; the counts stay exact wherever "
    "they aren't. 100 TB: each edge is one anti-join that hashes on "
    "the FK; small parents (nation, supplier, customer, part) "
    "broadcast — only lineitem→orders genuinely shuffles, and AQE "
    "picks that automatically.",
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    def edge(name, child, key, parent, pkey):
        orphans = (
            child.filter(F.col(key).isNotNull())
            .join(parent.select(F.col(pkey).alias(key)), key, "left_anti")
            .agg(F.count(F.lit(1)).alias("orphan_rows"))
        )
        stats = child.agg(
            F.count(F.lit(1)).alias("child_rows"),
            F.sum(F.col(key).isNull().cast("bigint")).alias("null_keys"),
        )
        return stats.crossJoin(orphans).select(
            F.lit(name).alias("relation"), "child_rows", "orphan_rows", "null_keys"
        )

    out = (
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"))
        .unionAll(
            edge("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey")
        )
        .unionAll(edge("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(
            edge("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey")
        )
    )
    return out.orderBy("relation")


# ---------------------------------------------------------------- Q193


@register(
    "q193_inverted_index_postings",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
      SELECT tok, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY 1
    ), sel AS (
      SELECT tok, df, total_tf FROM df ORDER BY df DESC, tok LIMIT 40
    )
    SELECT s.tok AS term, s.df, s.total_tf,
           string_agg(CAST(t.doc_id AS VARCHAR), ','
                      ORDER BY t.doc_id) AS postings
    FROM sel s JOIN tf t ON t.tok = s.tok
    GROUP BY s.tok, s.df, s.total_tf
    ORDER BY s.df DESC, s.tok
    """,
    doc="Inverted-index build: per term, document frequency, total term "
    "frequency, and the doc-id posting list (comma-joined, ascending — "
    "the on-disk layout a search index materializes), for the 40 "
    "highest-df terms (deterministic tie-break on token). Tokenization "
    "is the q147 idiom so index and BM25 probe agree. 100 TB: tf "
    "shuffles once on (token, doc); posting-list assembly shuffles the "
    "selected terms only — cap the list per segment in a real index; "
    "here df-bounded selection keeps rows driver-safe.",
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tf = toks.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    sel = df_tbl.orderBy(F.desc("df"), "tok").limit(40)
    return (
        tf.join(F.broadcast(sel), "tok")
        .groupBy("tok", "df", "total_tf")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("doc_id"))).cast("array<string>"),
                ",",
            ).alias("postings")
        )
        .select(F.col("tok").alias("term"), "df", "total_tf", "postings")
        .orderBy(F.desc("df"), "term")
    )


# ---------------------------------------------------------------- Q194


@register(
    "q194_ks_two_sample",
    oracle="""
    WITH a AS (SELECT value AS v FROM events WHERE event_type = 'click'),
         b AS (SELECT value AS v FROM events WHERE event_type = 'purchase'),
         n AS (SELECT (SELECT count(*) FROM a) AS n1,
                      (SELECT count(*) FROM b) AS n2),
         pts AS (
           SELECT v,
                  count(*) FILTER (WHERE side = 1) AS c1,
                  count(*) FILTER (WHERE side = 2) AS c2
           FROM (SELECT v, 1 AS side FROM a
                 UNION ALL SELECT v, 2 FROM b)
           GROUP BY v
         ),
         cum AS (
           SELECT sum(c1) OVER (ORDER BY v) AS k1,
                  sum(c2) OVER (ORDER BY v) AS k2
           FROM pts
         )
    SELECT n.n1, n.n2,
           round(max(abs(k1 / CAST(n.n1 AS DOUBLE)
                         - k2 / CAST(n.n2 AS DOUBLE))), 6) AS ks_d
    FROM cum CROSS JOIN n
    GROUP BY n.n1, n.n2
    """,
    doc="Two-sample Kolmogorov–Smirnov statistic between the click and "
    "purchase value distributions — the distribution-shift gate a "
    "feature pipeline runs between snapshots. D = max |F1 − F2| over "
    "the merged support; each ECDF value is an exact-integer division "
    "(IEEE-identical in both engines), so D matches bit-for-bit. The "
    "Spark cumulative counts use the q189 two-level prefix-sum: "
    "cumsum WITHIN floor(value) range buckets + a metadata-sized "
    "bucket-offset table — no unpartitioned data-sized window. "
    "100 TB: two hash aggregations + one bucket-partitioned window; "
    "the offset table is (value range)-sized, independent of N.",
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(F.col("value").alias("v"))
    b = ev.filter(F.col("event_type") == "purchase").select(F.col("value").alias("v"))
    pts = (
        a.withColumn("side", F.lit(1))
        .unionAll(b.withColumn("side", F.lit(2)))
        .groupBy("v")
        .agg(
            F.sum((F.col("side") == 1).cast("bigint")).alias("c1"),
            F.sum((F.col("side") == 2).cast("bigint")).alias("c2"),
        )
        .withColumn("bkt", F.floor(F.col("v")).cast("bigint"))
    )
    # two-level prefix sum: within-bucket cumsum + bucket offsets
    per_bkt = pts.groupBy("bkt").agg(F.sum("c1").alias("s1"), F.sum("c2").alias("s2"))
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bkt.select(
        "bkt",
        F.sum("s1").over(woff).alias("o1"),
        F.sum("s2").over(woff).alias("o2"),
    ).fillna({"o1": 0, "o2": 0})
    win = Window.partitionBy("bkt").orderBy("v")
    cum = (
        pts.join(F.broadcast(offsets), "bkt")
        .select(
            (F.col("o1") + F.sum("c1").over(win)).alias("k1"),
            (F.col("o2") + F.sum("c2").over(win)).alias("k2"),
        )
    )
    n = a.agg(F.count(F.lit(1)).alias("n1")).crossJoin(
        b.agg(F.count(F.lit(1)).alias("n2"))
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("k1") / F.col("n1").cast("double")
                        - F.col("k2") / F.col("n2").cast("double")
                    )
                ),
                6,
            ).alias("ks_d")
        )
    )


# ---------------------------------------------------------------- Q195


@register(
    "q195_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey, c.c_custkey,
             CAST(COALESCE(sum(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100), 0)
                  AS BIGINT) AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_nationkey, cents,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY cents, c_custkey) AS i
      FROM spend
    ), agg AS (
      SELECT c_nationkey,
             count(*) AS n_customers,
             sum(CAST(cents AS DECIMAL(38,0))) AS s0,
             sum(CAST(i * cents AS DECIMAL(38,0))) AS s1
      FROM ranked GROUP BY 1
    )
    SELECT n.n_name AS nation, a.n_customers,
           round(CAST(a.s0 AS DOUBLE) / 100, 2) AS total_spend,
           round(CAST(2 * a.s1 - (a.n_customers + 1) * a.s0 AS DOUBLE)
                 / CAST(a.n_customers * a.s0 AS DOUBLE), 6) AS gini
    FROM agg a JOIN nation n ON n.n_nationkey = a.c_nationkey
    ORDER BY nation
    """,
    doc="Gini concentration of customer spend per nation — the "
    "inequality/concentration metric a marketplace tracks per region. "
    "Spend quantizes to exact integer cents; the rank-weighted form "
    "G = (2Σi·xᵢ − (n+1)Σx)/(nΣx) needs one per-nation ordering "
    "(tie-broken by custkey; equal-value swaps cannot change the sum, "
    "so ties are safe) and all numerator/denominator terms stay exact "
    "integers in DECIMAL(38,0) — the one double division happens on "
    "identical exact inputs. Zero-spend customers are included (LEFT "
    "join), matching the textbook population Gini. 100 TB: one shuffle "
    "to (nation, customer) totals, one rank window partitioned by "
    "nation, one per-nation aggregate — no global ordering anywhere.",
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    spend = (
        cust.join(
            orders.select("o_custkey", "o_totalprice"),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100), F.lit(0)
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    ranked = spend.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
        ),
    )
    agg = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s0"),
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)")).alias("s1"),
    )
    return (
        agg.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            agg.c_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            F.round(F.col("s0").cast("double") / 100, 2).alias("total_spend"),
            F.round(
                (2 * F.col("s1") - (F.col("n_customers") + 1) * F.col("s0")).cast(
                    "double"
                )
                / (F.col("n_customers") * F.col("s0")).cast("double"),
                6,
            ).alias("gini"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------- Q196


@register(
    "q196_running_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1
    ), daily AS (
      SELECT day, count(*) AS new_users FROM first_seen GROUP BY 1
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
             AS cum_distinct_users
    FROM daily
    ORDER BY day
    """,
    doc="Running DISTINCT user count per day — the adoption curve. A "
    "naive per-day COUNT(DISTINCT ... WHERE ts <= day) rescans the "
    "corpus per day; the scalable identity is cum_distinct(d) = "
    "Σ_{d'<=d} |{users first seen on d'}|: one groupBy(user) for "
    "first-seen (the only data-sized shuffle), one tiny daily rollup, "
    "and a cumsum window over the days-sized table. Integers only. "
    "100 TB: days are metadata-sized however large events grows.",
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(Window.orderBy("day")).alias("cum_distinct_users"),
    ).orderBy("day")


# ---------------------------------------------------------------- Q197


@register(
    "q197_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS dd
      FROM events
    ), grp AS (
      SELECT user_id, dd,
             dd - row_number() OVER (PARTITION BY user_id ORDER BY dd) AS g
      FROM days
    ), streaks AS (
      SELECT user_id, g, count(*) AS len FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           count(*) AS n_streaks,
           max(len) AS longest_streak
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gaps-and-islands: per-user consecutive-day activity streaks via "
    "the day − row_number() grouping identity (consecutive days share "
    "one group key) — the engagement/retention feature. Day indices "
    "are exact integer offsets from a fixed epoch so both engines "
    "group identically. 100 TB: distinct (user, day) is the only "
    "data-sized shuffle; the window partitions by user — no global "
    "ordering. Differs from q52 sessionization (event-time gaps "
    "within a day) — this is the calendar-grain variant.",
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")).alias(
            "dd"
        ),
    ).distinct()
    grp = days.withColumn(
        "g",
        F.col("dd")
        - F.row_number().over(Window.partitionBy("user_id").orderBy("dd")),
    )
    streaks = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------- Q198


@register(
    "q198_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, substr(text, CAST(g AS INTEGER), 1) AS ch
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text) + 1)) AS g
            FROM documents)
    ), counts AS (
      SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2
    ), per_doc AS (
      SELECT doc_id,
             sum(c) AS n,
             count(*) AS distinct_chars,
             sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                      AS DECIMAL(38,12))) AS s
      FROM counts GROUP BY 1
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted, distinct_chars,
           round(ln(CAST(n AS DOUBLE))
                 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS entropy
    FROM per_doc
    ORDER BY doc_id
    """,
    doc="Per-document character-level Shannon entropy H = ln n − "
    "(Σ cᵢ·ln cᵢ)/n — the repetitive/degenerate-content quality signal "
    "(near-zero entropy ⇒ one repeated character; boilerplate scores "
    "low). ln() sees only exact integer counts (bit-identical inputs, "
    "the q126 precedent); each term quantizes to DECIMAL(38,12) before "
    "the per-doc sum so accumulation order can't matter; the final "
    "subtraction is scalar. Character extraction is substr over a "
    "position sequence — UTF-8-character-based in both engines, "
    "unlike empty-separator splits whose edge behavior differs. "
    "100 TB: the char fan-out is map-side and collapses immediately "
    "to (doc, char) counts; everything after is doc-sized.",
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Empty docs must vanish in BOTH engines: Spark's sequence(1, 0)
    # defaults step to -1 and yields [1, 0] (two phantom '' rows), while
    # DuckDB's range(1, 1) is empty — guard with an explicit length
    # filter so the engines agree on zero-length text.
    chars = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("g"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, g, 1)").alias("ch"))
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.sum(
            (F.col("c").cast("double") * F.log(F.col("c").cast("double"))).cast(
                "decimal(38,12)"
            )
        ).alias("s"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        "distinct_chars",
        F.round(
            F.log(F.col("n").cast("double"))
            - F.col("s").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("entropy"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- Q199


@register(
    "q199_multitouch_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts, value AS pval
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id AS vuser, ts AS vts
      FROM events WHERE event_type = 'view'
    ), touched AS (
      SELECT p.pid, p.user_id, p.pval, v.vts,
             count(v.vts) OVER (PARTITION BY p.pid) AS n_touch
      FROM p LEFT JOIN v
        ON v.vuser = p.user_id
       AND v.vts < p.pts
       AND v.vts >= p.pts - INTERVAL 7 DAY
    )
    SELECT user_id,
           count(DISTINCT pid) AS n_purchases,
           count(vts) AS n_touches,
           CAST(sum(CASE WHEN vts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_direct,
           round(CAST(sum(CASE WHEN vts IS NOT NULL THEN
                 CAST(pval / CAST(n_touch AS DOUBLE) AS DECIMAL(38,12))
               END) AS DOUBLE), 6) AS attributed_value,
           CAST(sum(CASE WHEN vts IS NULL THEN CAST(pval AS DECIMAL(18,2))
               END) AS DOUBLE) AS direct_value
    FROM touched
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Linear multi-touch attribution: each purchase's value splits "
    "1/n across the user's views in the preceding 7 days; purchases "
    "with no touch stay 'direct'. The per-purchase touch count rides "
    "one window over the interval join's output; per-touch credit is "
    "double-division of identical inputs, quantized to DECIMAL before "
    "the per-user sum. Completes the attribution family: q124 is "
    "as-of (LAST touch), this is the credit-splitting variant. "
    "100 TB: the join is user- and time-bounded (the q58/q162 "
    "interval-join shape); in the shuffle-join regime each side "
    "exchanges ONCE on the user key and nothing else does — the "
    "touch-count window partitions by (user_id, pid) so the q164 "
    "prefix rule lets it and the final per-user aggregate reuse the "
    "join's partitioning (plan-pinned in tests/test_plans.py).",
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.col("value").alias("pval"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vuser"), F.col("ts").alias("vts")
    )
    touched = p.join(
        v,
        (F.col("vuser") == F.col("user_id"))
        & (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
        "left",
    ).select(
        "pid",
        "user_id",
        "pval",
        "vts",
        # partition by (user_id, pid), not pid alone: pid is globally
        # unique so the semantics are identical, but the prefix rule
        # (HashPartitioning(user_id) satisfies clustering by (user_id,
        # pid) — the q164 discipline) lets this window REUSE the join's
        # user_id exchange instead of adding a pid exchange
        F.count("vts").over(Window.partitionBy("user_id", "pid")).alias("n_touch"),
    )
    credit = F.when(
        F.col("vts").isNotNull(),
        (F.col("pval") / F.col("n_touch").cast("double")).cast("decimal(38,12)"),
    )
    return (
        touched.groupBy("user_id")
        .agg(
            F.countDistinct("pid").alias("n_purchases"),
            F.count("vts").alias("n_touches"),
            F.sum(F.col("vts").isNull().cast("bigint")).alias("n_direct"),
            F.round(F.sum(credit).cast("double"), 6).alias("attributed_value"),
            F.sum(F.when(F.col("vts").isNull(), F.col("pval").cast("decimal(18,2)")))
            .cast("double")
            .alias("direct_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------- Q200


@register(
    "q200_percentile_rank_transform",
    oracle="""
    SELECT event_id, event_type, value,
           round(percent_rank() OVER (PARTITION BY event_type
                                      ORDER BY value), 6) AS pr,
           ntile(10) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS decile
    FROM events
    ORDER BY event_id
    """,
    doc="Percentile-rank feature transform: percent_rank (= (rank−1)/"
    "(n−1), exact integer ratio, tie-sharing) and a (value, event_id)-"
    "tie-broken decile per event_type — the rank-based normalization a "
    "feature pipeline applies before models that want uniform "
    "marginals. 100 TB: the exact transform sorts within event_type "
    "partitions; when types are few and huge, the scale path is q138's "
    "broadcast-quantile bucketing (approx boundaries, map-only "
    "assignment) — this entry anchors its correctness at the exact "
    "end, the same exact/approx pairing as q41/q89.",
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wp = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.percent_rank().over(wp), 6).alias("pr"),
        F.ntile(10).over(wn).alias("decile"),
    ).orderBy("event_id")


# ---------------------------------------------------------------- Q201


@register(
    "q201_priority_sample",
    oracle=f"""
    SELECT doc_id, n_chars,
           round(CAST(n_chars AS DOUBLE) * 16777216
                 / ({hex6_sql("concat('ps', CAST(doc_id AS VARCHAR))")} + 1),
                 6) AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT 200
    """,
    doc="Deterministic weighted sampling without replacement via "
    "PRIORITY SAMPLING (Duffield–Lund–Thorup): priority = w/u with u a "
    "per-row md5-derived uniform (the repo's hex6 source), take the "
    "top-k — longer documents proportionally likelier, reproducible "
    "across engines/runs/partitionings, unlike rand()-based sampling. "
    "Complements q110's Bernoulli sampler (independent inclusion, "
    "random size) with the fixed-size-k variant a training-mix builder "
    "wants. 100 TB: scan + TakeOrdered(k) — per-partition heaps, no "
    "global sort, no shuffle of the corpus.",
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import _hex6_spark

    docs = load(spark, sf_dir, "documents")
    u = _hex6_spark("concat('ps', CAST(doc_id AS STRING))")
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.round(
                # int literal, not 16777216.0 — a bare decimal literal
                # would make this DECIMAL division with engine-specific
                # scale promotion (the playbook trap)
                F.expr(f"CAST(n_chars AS DOUBLE) * 16777216 / ({u} + 1)"),
                6,
            ).alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(200)
    )


# ---------------------------------------------------------------- Q202


@register(
    "q202_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
             )) AS g
      FROM toks
    ), ref AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0
    ), cand AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 2 = 1
    )
    SELECT c.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unseen,
           round(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM cand c LEFT JOIN ref r ON r.g = c.g
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
    doc="Token-trigram novelty scoring: for each candidate document "
    "(odd doc_id), the fraction of its DISTINCT trigrams absent from "
    "the reference corpus (even doc_ids) — the freshness/memorization "
    "screen a data-mixing pipeline runs against the already-trained "
    "corpus (q48 decontamination asks 'does eval leak into train'; "
    "this asks 'how much NEW text does a candidate source add'). "
    "Trigrams are built by identical 3-window list comprehensions "
    "(Spark transform / DuckDB list_transform, off-by-one-audited "
    "across 0- vs 1-based indexing); novelty is an exact integer "
    "ratio. 100 TB: distinct-gram sets shuffle on the gram hash; the "
    "membership probe is one hash join — the q100 bloom prefilter "
    "drops in unchanged when the reference set outgrows memory.",
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # tokenize ONCE into a column (the q149 lesson: repeating split()
    # inside one expression re-splits per reference)
    grams = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 3 THEN "
                "transform(sequence(1, size(toks) - 2), "
                "i -> concat_ws(' ', toks[i - 1], toks[i], toks[i + 1])) "
                "ELSE array() END"
            )
        ).alias("g"),
    )
    ref = grams.filter(F.col("doc_id") % 2 == 0).select("g").distinct()
    cand = grams.filter(F.col("doc_id") % 2 == 1).distinct()
    joined = cand.join(
        ref.withColumn("seen", F.lit(1)), "g", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("seen").isNull().cast("bigint")).alias("n_unseen"),
            F.round(
                F.sum(F.col("seen").isNull().cast("bigint"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- Q203


@register(
    "q203_sliding_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS dd
      FROM events
    ), days AS (SELECT DISTINCT dd FROM ud)
    SELECT DATE '2024-01-01' + CAST(d.dd AS INTEGER) AS day,
           (SELECT count(DISTINCT u.user_id) FROM ud u
             WHERE u.dd = d.dd) AS dau,
           (SELECT count(DISTINCT u.user_id) FROM ud u
             WHERE u.dd BETWEEN d.dd - 6 AND d.dd) AS wau,
           round((SELECT count(DISTINCT u.user_id) FROM ud u
                   WHERE u.dd = d.dd)
                 / CAST((SELECT count(DISTINCT u.user_id) FROM ud u
                          WHERE u.dd BETWEEN d.dd - 6 AND d.dd) AS DOUBLE),
                 6) AS stickiness
    FROM days d
    ORDER BY day
    """,
    doc="Sliding-window COUNT DISTINCT (DAU / trailing-7-day WAU / "
    "stickiness): the oracle's per-day correlated rescan is the "
    "textbook definition; the Spark plan uses the scalable identity — "
    "each distinct (user, day) contributes to exactly 7 window days "
    "(map-side sequence explode), so WAU(d) = |distinct (user, wd)| "
    "after one dedup — shuffle volume is 7·|user-days|, never "
    "days × corpus rescans, and no per-day subquery exists. Integer "
    "counts and one exact division. 100 TB: two hash dedups + one "
    "count; the 7× fan-out is map-side and collapses immediately; "
    "swap 7 for any horizon without changing the shape.",
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")).alias(
            "dd"
        ),
    ).distinct()
    days = ud.select("dd").distinct()
    dau = ud.groupBy("dd").agg(F.countDistinct("user_id").alias("dau"))
    contrib = (
        ud.select(
            "user_id", F.explode(F.sequence(F.col("dd"), F.col("dd") + 6)).alias("wd")
        )
        .distinct()
        .groupBy("wd")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "dd")
        .join(contrib, days.dd == contrib.wd)
        .select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("dd").cast("int")).alias(
                "day"
            ),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )

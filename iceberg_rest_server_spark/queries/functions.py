"""Q20–Q24: scalar function suites (string / date / math / array-map-json /
conditional-null) — SURVEY.md §2F. All run JVM-side inside whole-stage
codegen; no Python UDFs in these paths (Q27 re-derives Q20 via UDFs to
prove parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ._registry import register


@register(
    "q20_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           substring(p_name, 1, 5) AS prefix5,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           concat(p_brand, '-', p_type) AS brand_type,
           length(p_name) AS name_len,
           (p_name LIKE '%red%') AS has_red,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           replace(p_name, ' ', '_') AS snake
    FROM part
    ORDER BY p_partkey
    """,
    doc="String kernel: upper/lower/substring/trim/concat/length/like/"
    "regexp_extract/replace over part.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%red%").alias("has_red"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
    ).orderBy("p_partkey")


@register(
    "q21_date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           dayofmonth(o_orderdate) AS dom,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           date_trunc('month', o_orderdate) AS order_month,
           dayofweek(o_orderdate) + 1 AS dow
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Date kernel: year/month/day/datediff/date_add/date_trunc/dayofweek. "
    "DuckDB dayofweek is 0=Sunday-based vs Spark 1=Sunday, hence the +1.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).orderBy("o_orderkey")


@register(
    "q22_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice)  AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           ((l_partkey % 7) + 7) % 7 AS pmod7,
           CAST(power(l_linenumber, 2) AS DOUBLE) AS line_sq,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(greatest(l_tax, l_discount) AS DOUBLE) AS max_rate,
           CAST(least(l_tax, l_discount) AS DOUBLE) AS min_rate
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math kernel: round/abs/ceil/floor/pmod/power/sqrt/greatest/least. "
    "sqrt is IEEE correctly-rounded so cross-engine exact.",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.pmod("l_partkey", F.lit(7)).alias("pmod7"),
        F.power("l_linenumber", F.lit(2)).alias("line_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q23_array_map_json",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_tokens,
           string_split(p_name, ' ')[1] AS first_token,
           list_contains(string_split(p_name, ' '), 'red') AS has_red,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_tokens,
           p_size AS size_from_map
    FROM part
    ORDER BY p_partkey
    """,
    doc="Array kernel over split tokens: size/element_at/array_contains/"
    "array_join(sort_array) + a map_from_arrays lookup round-trip.",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    tokens = F.split(F.col("p_name"), " ")
    m = F.map_from_arrays(F.array(F.lit("size")), F.array(F.col("p_size")))
    return part.select(
        "p_partkey",
        F.size(tokens).alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),
        F.array_contains(tokens, "red").alias("has_red"),
        F.array_join(F.sort_array(tokens), ",").alias("sorted_tokens"),
        F.element_at(m, "size").alias("size_from_map"),
    ).orderBy("p_partkey")


@register(
    "q23_explode_json",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
    GROUP BY token
    ORDER BY token
    """,
    doc="explode(split(...)) + aggregate — the lateral-view word count shape.",
)
def q23b(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("token")
    )


@register(
    "q23_get_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    ORDER BY event_id
    """,
    doc="JSON extraction from the events.props string column.",
)
def q23c(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return events.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_num"),
    ).orderBy("event_id")


@register(
    "q24_conditional_null",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS segment_or_other,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           ifnull(nullif(c_mktsegment, c_mktsegment), 'was_null') AS always_default,
           (c_acctbal IS NOT NULL) AS bal_present
    FROM customer
    ORDER BY c_custkey
    """,
    doc="Conditional/null kernel: coalesce/nullif/when-otherwise/ifnull.",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.ifnull(F.nullif(F.col("c_mktsegment"), F.col("c_mktsegment")), F.lit("was_null")).alias(
            "always_default"
        ),
        F.col("c_acctbal").isNotNull().alias("bal_present"),
    ).orderBy("c_custkey")


@register(
    "q123_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT type over semi-structured JSON: props parsed "
    "ONCE into the binary variant encoding (parse_json), then typed "
    "extractions via variant_get('$.k', 'bigint') feed the aggregate, "
    "with try_variant_get returning NULL for absent paths — the "
    "shredded-JSON path that replaces per-access get_json_object "
    "string re-parsing (q23's tier): at 100 TB, parse-once-extract-"
    "many is the difference between one scan-side decode and one "
    "decode per extraction expression.",
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    v = events.withColumn("v", F.parse_json("props"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("try_variant_get(v, '$.missing', 'bigint')")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.sum(missing.isNull().cast("long")).alias("n_missing"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- Q204


@register(
    "q204_array_fold_kernels",
    # list_reduce folds left-to-right exactly like Spark's aggregate();
    # prepending the 0.0 initial value reproduces the same fold, so the
    # sequential double sums are BIT-identical — no DECIMAL needed for a
    # within-row (fixed-order) reduction.
    oracle="""
    SELECT vec_id,
           round(list_reduce(list_prepend(0.0, embedding),
                             (acc, x) -> acc + CAST(x AS DOUBLE)
                                             * CAST(x AS DOUBLE)), 6)
             AS sum_sq,
           round(sqrt(list_reduce(list_prepend(0.0, embedding),
                                  (acc, x) -> acc + CAST(x AS DOUBLE)
                                                  * CAST(x AS DOUBLE))), 6)
             AS l2_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           CAST(list_max(embedding) AS DOUBLE) AS max_component
    FROM embeddings
    ORDER BY vec_id
    """,
    doc="Array higher-order-function kernels over the embedding column — "
    "the per-row fold/filter/max surface (Spark aggregate(), filter(), "
    "array_max ↔ DuckDB list_reduce, list_filter, list_max) a vector "
    "pipeline uses before anything distributed happens. A within-row "
    "fold has a FIXED left-to-right order in both engines, so the "
    "double sum-of-squares is bit-identical without DECIMAL; sqrt is "
    "IEEE-correctly-rounded. 100 TB: map-only (no shuffle at all) — "
    "whole-stage-codegen'd lambda evaluation per row, the cheapest "
    "possible plan shape.",
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    sum_sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        F.round(sum_sq, 6).alias("sum_sq"),
        F.round(F.sqrt(sum_sq), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.array_max("embedding").cast("double").alias("max_component"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------- Q205


@register(
    "q205_regex_extraction",
    # both engines return '' (not NULL) from regexp_extract on no match,
    # and both support regexp_extract_all; the patterns below use only
    # character classes + quantifiers, identical in Java regex and RE2
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[aeiou]{2,}')) AS n_vowel_runs,
           regexp_extract(text, '[aeiou]{3,}') AS first_long_run,
           len(regexp_extract_all(text, '[a-z]{8,}')) AS n_long_words,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowels
    FROM documents
    ORDER BY doc_id
    """,
    doc="Regex extraction kernels over document text: match counting "
    "(regexp_extract_all + cardinality), first-match extraction (both "
    "engines yield '' on no match — normalized behavior, tested), and "
    "global regexp_replace. Patterns are class+quantifier only, where "
    "Java regex and DuckDB's RE2 agree exactly. Complements q169 "
    "(sequence pattern mining on derived event strings) with the "
    "direct text-extraction surface. 100 TB: map-only scan — the only "
    "caveat at scale is regex cost per row, which whole-stage codegen "
    "amortizes; no shuffle anywhere.",
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[aeiou]{2,}', 0)")).alias(
            "n_vowel_runs"
        ),
        F.regexp_extract("text", "[aeiou]{3,}", 0).alias("first_long_run"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{8,}', 0)")).alias(
            "n_long_words"
        ),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("len_novowels"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- Q206

_TYPE_BIT = "CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1 WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"


@register(
    "q206_bitwise_aggregates",
    oracle=f"""
    WITH m AS (
      SELECT user_id,
             (1::BIGINT << ({_TYPE_BIT})) AS mask,
             event_id
      FROM events
    )
    SELECT user_id,
           bit_or(mask) AS type_mask,
           CAST(bit_count(bit_or(mask)) AS INTEGER) AS n_types,
           bit_xor(event_id) AS event_xor
    FROM m
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Bitwise aggregate surface: per-user capability bitmask via "
    "BIT_OR of single-bit event-type masks (the feature-flag rollup "
    "idiom — bit_count(mask) equals COUNT(DISTINCT type) but merges as "
    "a single int64), plus BIT_XOR of event ids (the parity/checksum "
    "aggregate replication auditors use). All operations are exact "
    "integer ops, trivially order-free. 100 TB: one map-side-combining "
    "aggregate; the mask rollup is the cheapest mergeable 'distinct "
    "types' representation — 8 bytes of state per key, vs a set.",
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = ev.select(
        "user_id",
        F.expr(f"shiftleft(1L, {_TYPE_BIT})").alias("mask"),
        "event_id",
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.expr("bit_or(mask)").alias("type_mask"),
            F.expr("CAST(bit_count(bit_or(mask)) AS INT)").alias("n_types"),
            F.expr("bit_xor(event_id)").alias("event_xor"),
        )
        .orderBy("user_id")
    )

"""Q01–Q06: scan/projection, filter, hash aggregate, global aggregate,
distinct aggregate, approx distinct (SURVEY.md §2F).

Reference context: the reference catalog delegates all of these to Spark
(tests/python/tests/test_spark.py drives SELECT/aggregations via Spark SQL);
here they are first-class declarative plans. Filters and projections are
written so Catalyst pushes them into the parquet scan (PushedFilters /
ReadSchema visible in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ._exact import dec, dsum
from ._registry import register


@register(
    "q01_scan_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="Scan + projection + deterministic top-100 (TakeOrderedAndProject).",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "q02_filter",
    oracle="""
    SELECT count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Predicate pushdown: range + between filters reach the parquet scan.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q03_hash_aggregate",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      count(*) AS cnt,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: partial+final hash aggregate; decimal-exact sums.",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q04_global_aggregate",
    oracle="""
    SELECT
      count(*) AS cnt,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM lineitem
    """,
    doc="Global aggregate — Catalyst plans partial (map-side) + final stages.",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min(dec("l_extendedprice")).cast("double").alias("min_price"),
        F.max(dec("l_extendedprice")).cast("double").alias("max_price"),
    )


@register(
    "q05_distinct_aggregate",
    oracle="""
    SELECT
      count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    """,
    doc="Distinct aggregate — Catalyst expands to a two-phase distinct plan.",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "q06_approx_distinct",
    # HLL++ sketch values are engine-specific, so the raw estimates can't
    # be hash-compared — instead the query returns the EXACT distinct
    # counts alongside booleans asserting the HLL estimate landed within
    # 5% relative error (rsd=0.02, so 2.5σ). The oracle recomputes the
    # exact counts and pins the booleans TRUE: the approx path is fully
    # exercised and the driver gets a decidable hash check.
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol
    FROM lineitem
    """,
    doc="approx_count_distinct (HyperLogLog++) self-verified against the "
    "exact distinct count: emits within-5%-relative-error booleans the "
    "oracle pins TRUE, plus the exact counts for the hash match. Both "
    "stats come from ONE pass per column over the pre-deduped values — "
    "an HLL sketch is duplicate-insensitive, so HLL(distinct(col)) ≡ "
    "HLL(col) and the exact count rides the same tiny aggregate instead "
    "of a separate expand-based multi-distinct plan (7.9 s → 1.5 s at "
    "sf0.1). At 100 TB you'd drop the exact branch and keep the HLL.",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    tol = 0.05

    def stats(col: str, label: str) -> DataFrame:
        return (
            li.select(col)
            .distinct()
            .agg(
                F.count(F.lit(1)).alias(f"exact_{label}"),
                F.approx_count_distinct(col, rsd=0.02).alias(f"approx_{label}"),
            )
        )

    rel_err = lambda a, e: F.abs(F.col(a) - F.col(e)) / F.col(e)  # noqa: E731
    return (
        stats("l_partkey", "parts")
        .crossJoin(stats("l_orderkey", "orders"))  # two 1-row frames
        .select(
            "exact_parts",
            "exact_orders",
            (rel_err("approx_parts", "exact_parts") <= tol).alias("parts_within_tol"),
            (rel_err("approx_orders", "exact_orders") <= tol).alias("orders_within_tol"),
        )
    )

"""Skew-mitigation operators must be result-identical to their naive
forms — only the physical distribution changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_rest_server_spark.operators.skew import salted_join, two_stage_distinct_agg
from iceberg_rest_server_spark.tables import load


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(*key).collect()]


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "value", "event_id")
    cu = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey as user_id", "c_mktsegment"
    )
    for how in ("inner", "left"):
        a = salted_join(ev, cu, "user_id", salt_factor=4, how=how)
        b = ev.join(cu, "user_id", how).select(*a.columns)
        assert _sorted_rows(a, ["event_id"]) == _sorted_rows(b, ["event_id"]), how


def test_salted_join_spreads_hot_key(spark):
    """A single hot key's rows must land in multiple shuffle partitions
    of the salted join key."""
    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "x")], "k long, attr string")
    out = salted_join(hot, dim, "k", salt_factor=8)
    assert out.count() == 1000
    n_salts = (
        hot.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts == 8  # all salt buckets used for the hot key


def test_two_stage_distinct_equals_native(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = two_stage_distinct_agg(ev, "event_type", "user_id", "n")
    b = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
    assert _sorted_rows(a, ["event_type"]) == _sorted_rows(b, ["event_type"])


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key (the co-location strategy
    for repeated fact-fact joins at scale) must produce a join plan with
    no shuffle exchange on either side."""
    import os

    from iceberg_rest_server_spark.tables import load

    warehouse = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{warehouse}'")
    try:
        orders = load(spark, sf_dir, "orders").limit(2000)
        li = load(spark, sf_dir, "lineitem").limit(5000)
        (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
         .sortBy("o_orderkey").format("parquet").saveAsTable("buckets.o"))
        (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
         .sortBy("l_orderkey").format("parquet").saveAsTable("buckets.l"))
        # disable broadcast so the co-location is what avoids the shuffle
        before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("buckets.l").join(
                spark.table("buckets.o"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckets CASCADE")


def test_two_stage_distinct_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 5), (1, 5), (2, None)], "g long, x long"
    )
    a = two_stage_distinct_agg(df, "g", "x", "n")
    b = df.groupBy("g").agg(F.countDistinct("x").alias("n"))
    assert _sorted_rows(a, ["g"]) == _sorted_rows(b, ["g"])


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full")

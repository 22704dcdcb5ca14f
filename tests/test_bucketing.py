"""Bucketed co-located joins: the shuffle-elimination tier for repeated
large-fact joins (SURVEY 'partitioning & shuffle' checklist). Writing
both fact tables bucketed by the join key lets Spark plan the join with
ZERO Exchange on either side — at 100 TB this converts every repeated
orders-lineitem join from a full shuffle into a local zip of co-located
buckets, paid once at write time."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf on a live session: give the test
    # database its own LOCATION instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'wh'}'")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .format("parquet").saveAsTable("bktdb.lineitem_b"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .format("parquet").saveAsTable("bktdb.orders_b"))
    yield "bktdb.lineitem_b", "bktdb.orders_b"
    spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    """Join on the bucket key: no Exchange anywhere in the plan (both
    sides pre-partitioned by bucket), and the result matches the plain
    parquet join."""
    li_b, o_b = bucketed_tables
    # disable broadcast so the join genuinely tests co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(li_b)
            .join(spark.table(o_b), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side; the only allowed
        # exchange is the final small aggregation's
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_section, join_section[:500]
        got = {r["o_orderpriority"]: r["n"] for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r["o_orderpriority"]: r["n"]
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_bucketed_table_metadata(spark, sf_dir, bucketed_tables):
    li_b, _ = bucketed_tables
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {li_b}").collect()
    }
    assert desc.get("Num Buckets") == "8", desc
    assert "l_orderkey" in desc.get("Bucket Columns", ""), desc

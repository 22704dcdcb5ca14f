"""MERGE INTO composition + change-event feed (reference parity:
test_spark.py:72-81 MERGE semantics; event_publisher.rs CloudEvents
mapped to a Structured Streaming source)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_rest_server_spark.catalog.client import RestCatalogClient
from iceberg_rest_server_spark.catalog.events import change_feed, change_log
from iceberg_rest_server_spark.catalog.server import ServerThread
from iceberg_rest_server_spark.catalog.spark_table import (
    SparkCatalogTable,
    iceberg_schema_from_spark,
)


@pytest.fixture()
def env(spark):
    with ServerThread() as server, tempfile.TemporaryDirectory() as wh:
        client = RestCatalogClient(server.base_url)
        client.create_warehouse("p", "wh", wh)
        client.configure("p", "wh")
        client.create_namespace(["ns"])
        yield spark, client, wh


def test_merge_matched_update_not_matched_insert(env):
    """The reference's MERGE test shape (test_spark.py:72-81):
    target (1,'a',1.1),(2,'b',2.2); source (1,'c',4.4),(3,'d',3.3)
    → matched row 1 updated, row 3 inserted, row 2 untouched."""
    spark, client, wh = env
    target_df = spark.createDataFrame(
        [(1, "a", 1.1), (2, "b", 2.2)], "id long, s string, f double"
    )
    client.create_table(["ns"], "m", iceberg_schema_from_spark(target_df.schema))
    table = SparkCatalogTable(spark, client, ["ns"], "m")
    table.append(target_df)

    source = spark.createDataFrame([(1, "c", 4.4), (3, "d", 3.3)], "id long, s string, f double")
    table.merge(source, on=["id"])

    rows = {r.id: (r.s, r.f) for r in table.read().collect()}
    assert rows == {1: ("c", 4.4), 2: ("b", 2.2), 3: ("d", 3.3)}

    # delete_where (row-level delete, copy-on-write)
    table.delete_where(F.col("id") == 2)
    assert sorted(r.id for r in table.read().collect()) == [1, 3]


def test_change_feed_streams_commit_events(env):
    spark, client, wh = env
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    client.create_table(["ns"], "t1", iceberg_schema_from_spark(df.schema))
    table = SparkCatalogTable(spark, client, ["ns"], "t1")
    table.append(df)
    table.append(df)
    table.set_properties({"k": "v"})

    log = change_log(spark, wh)
    by_type = {r.event_type: r.cnt for r in log.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_type == {"createTable": 1, "updateTable": 3}

    # and as a streaming source
    import uuid as _uuid

    name = f"feed_{_uuid.uuid4().hex}"
    q = (
        change_feed(spark, wh)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table(name).count() == 4
    types = {r.event_type for r in spark.table(name).collect()}
    assert types == {"createTable", "updateTable"}

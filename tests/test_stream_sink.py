"""Streaming sink → catalog table: exactly-once under replay."""

from __future__ import annotations

import tempfile

import pytest

from iceberg_rest_server_spark.catalog.client import RestCatalogClient
from iceberg_rest_server_spark.catalog.server import ServerThread
from iceberg_rest_server_spark.catalog.spark_table import (
    SparkCatalogTable,
    iceberg_schema_from_spark,
)
from iceberg_rest_server_spark.streaming.queries import read_events_stream
from iceberg_rest_server_spark.streaming.sink import stream_to_table
from iceberg_rest_server_spark.tables import load


@pytest.fixture()
def sink_table(spark, sf_dir):
    with ServerThread() as server, tempfile.TemporaryDirectory() as wh:
        client = RestCatalogClient(server.base_url)
        client.create_warehouse("p", "wh", wh)
        client.configure("p", "wh")
        client.create_namespace(["stream"])
        schema = iceberg_schema_from_spark(read_events_stream(spark, sf_dir).schema)
        client.create_table(["stream"], "events_sink", schema)
        yield SparkCatalogTable(spark, client, ["stream"], "events_sink")


def test_stream_lands_all_events(spark, sf_dir, sink_table):
    expected = load(spark, sf_dir, "events").count()
    with tempfile.TemporaryDirectory() as ckpt:
        n = stream_to_table(
            read_events_stream(spark, sf_dir), sink_table, ckpt, "q-events"
        )
    assert n >= 1
    assert sink_table.read().count() == expected


def test_replay_is_exactly_once(spark, sf_dir, sink_table):
    expected = load(spark, sf_dir, "events").count()
    with tempfile.TemporaryDirectory() as ckpt:
        stream_to_table(read_events_stream(spark, sf_dir), sink_table, ckpt, "q-replay")
    snapshots_before = sink_table.snapshots_df().count()
    # fresh checkpoint ⇒ Spark re-delivers every batch with the same
    # epoch ids; the summary protocol must skip them all
    with tempfile.TemporaryDirectory() as ckpt2:
        n2 = stream_to_table(
            read_events_stream(spark, sf_dir), sink_table, ckpt2, "q-replay"
        )
    assert n2 == 0
    assert sink_table.read().count() == expected
    assert sink_table.snapshots_df().count() == snapshots_before


def test_distinct_queries_append_independently(spark, sf_dir, sink_table):
    expected = load(spark, sf_dir, "events").count()
    with tempfile.TemporaryDirectory() as ckpt:
        stream_to_table(read_events_stream(spark, sf_dir), sink_table, ckpt, "writer-a")
    with tempfile.TemporaryDirectory() as ckpt:
        stream_to_table(read_events_stream(spark, sf_dir), sink_table, ckpt, "writer-b")
    # different query ids are different writers: both land their data
    assert sink_table.read().count() == 2 * expected

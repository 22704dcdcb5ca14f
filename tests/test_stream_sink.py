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


def test_upsert_late_batch_cannot_regress(spark):
    """A micro-batch carrying OLDER changes applied after a newer one
    must not regress the key — latest-wins is on (ts, event_id), not on
    arrival order."""
    import os

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from iceberg_rest_server_spark.streaming.sink import stream_upsert_to_table

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("val", StringType()),
        ]
    )
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    newer = spark.createDataFrame(
        [(2, t0 + datetime.timedelta(hours=2), 1, "new")], schema
    )
    older = spark.createDataFrame([(1, t0, 1, "old")], schema)
    with ServerThread() as server, tempfile.TemporaryDirectory() as tmp:
        client = RestCatalogClient(server.base_url)
        client.create_warehouse("p2", "wh", os.path.join(tmp, "wh"))
        client.configure("p2", "wh")
        client.create_namespace(["cdc"])
        client.create_table(["cdc"], "t", iceberg_schema_from_spark(schema))
        table = SparkCatalogTable(spark, client, ["cdc"], "t")
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        # file source lists lexicographically: the NEWER change arrives
        # in batch 0, the OLDER one in batch 1
        import glob
        import shutil

        for name, df in (("a.parquet", newer), ("b.parquet", older)):
            stage = os.path.join(tmp, f"stage_{name}")
            df.coalesce(1).write.parquet(stage)
            (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
            shutil.copy(part, os.path.join(src, name))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(src)
        )
        n = stream_upsert_to_table(
            stream, table, ["user_id"], ["ts", "event_id"],
            os.path.join(tmp, "ckpt"), "late-test",
        )
        assert n == 2
        rows = table.read().collect()
        assert len(rows) == 1
        assert rows[0]["val"] == "new"  # the late-arriving older row lost


def test_checkpoint_resume_appends_only_new_data(spark, sf_dir, sink_table):
    """The OTHER half of recovery: replay (fresh checkpoint, same data)
    is covered above — here the SAME checkpoint is reused after new
    source files arrive, so Structured Streaming must resume from its
    committed offsets and deliver ONLY the delta, and the sink must
    commit it as a fresh epoch (not skip it as a replay)."""
    from iceberg_rest_server_spark.tables import normalize_events_ts

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        # seed the source dir with the events table as one initial file set
        events = load(spark, sf_dir, "events")
        base = events.limit(500)
        base.write.mode("append").parquet(src)
        n_base = base.count()

        def stream():
            raw = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .format("parquet")
                .load(src)
            )
            return normalize_events_ts(raw)

        n1 = stream_to_table(stream(), sink_table, ckpt, "q-resume")
        assert n1 >= 1
        assert sink_table.read().count() == n_base

        # new file arrives; SAME checkpoint + SAME query id
        extra = events.limit(600).exceptAll(base)
        extra.write.mode("append").parquet(src)
        n_extra = extra.count()
        assert n_extra > 0

        n2 = stream_to_table(stream(), sink_table, ckpt, "q-resume")
        # the delta is a NEW epoch: committed, not skipped
        assert n2 >= 1
        assert sink_table.read().count() == n_base + n_extra

        # and a third drain with nothing new commits nothing
        n3 = stream_to_table(stream(), sink_table, ckpt, "q-resume")
        assert n3 == 0
        assert sink_table.read().count() == n_base + n_extra


def test_latest_per_key_equals_window_reference(spark):
    """r14: the sink's latest-wins collapse moved from a sort-based
    Window (row_number=1) to a max_by hash aggregate (guide §2.3 —
    map-side partial aggregation). The two must agree row-for-row on a
    dataset with multiple changes per key, late arrivals, and a
    single-change key; schema (names, order, types) must be preserved."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from iceberg_rest_server_spark.streaming.sink import latest_per_key

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: three changes, latest by ts is event 12
        (10, t0 + datetime.timedelta(hours=1), 1, "a", 1.0),
        (12, t0 + datetime.timedelta(hours=3), 1, "b", 2.0),
        (11, t0 + datetime.timedelta(hours=2), 1, "c", 3.0),
        # user 2: ts tie broken by event_id (21 wins)
        (20, t0, 2, "d", 4.0),
        (21, t0, 2, "e", 5.0),
        # user 3: single change
        (30, t0, 3, "f", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, kind string, value double"
    )
    keys, order_cols = ["user_id"], ["ts", "event_id"]

    got = latest_per_key(df, keys, order_cols)
    assert got.columns == df.columns
    assert got.schema == df.schema

    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    ref = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    got_rows = sorted(got.collect(), key=lambda r: r["user_id"])
    ref_rows = sorted(ref.collect(), key=lambda r: r["user_id"])
    assert got_rows == ref_rows
    assert [r["event_id"] for r in got_rows] == [12, 21, 30]

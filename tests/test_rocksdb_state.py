"""RocksDB state store: the large-state streaming tier. The default
HDFSBackedStateStoreProvider keeps every key in executor heap — fine
for small testdata, fatal for 100 TB-scale streaming state (billions of
dedup keys / session windows). RocksDBStateStoreProvider spills state
to local disk with bounded memory; these tests prove the engine's
stateful pipelines run unchanged (and produce identical results) on
that provider."""

from __future__ import annotations

from pyspark.sql import functions as F

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _session_counts(spark, sf_dir):
    from iceberg_rest_server_spark.streaming.queries import (
        read_events_stream,
        run_to_table,
    )

    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "15 minutes")
        .dropDuplicates(["event_id"])
    )
    agg = stream.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    result = run_to_table(agg, spark, "complete")
    return {
        (r["user_id"], r["session_window"]["start"]): r["cnt"]
        for r in result.collect()
    }


def test_session_window_dedup_on_rocksdb_matches_default(spark, sf_dir):
    default = _session_counts(spark, sf_dir)
    before = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        rocks = _session_counts(spark, sf_dir)
    finally:
        if before:
            spark.conf.set(_PROVIDER_CONF, before)
        else:
            spark.conf.unset(_PROVIDER_CONF)
    assert rocks == default and len(rocks) > 0

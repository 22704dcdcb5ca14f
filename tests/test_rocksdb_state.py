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


def test_protobuf_gate_probe_documents_impossibility():
    """The recorded answer to r7/r8's "try vendoring a pure-python
    google.protobuf" ask (streaming/queries.py q140 gate comment holds
    the prose). The probe asserts each environmental fact the
    impossibility claim rests on, so if ANY of them changes (a wheel
    appears, network returns, pyspark stops needing the runtime) this
    test fails and forces the gate to be revisited:

    1. google.protobuf has no runtime on sys.path;
    2. no protobuf wheel/sdist is cached anywhere pip/conda could
       install from offline;
    3. pyspark's generated StateMessage_pb2 genuinely requires the full
       descriptor-pool runtime (serialized FileDescriptorProto), i.e. a
       hand-rolled shim cannot satisfy it.

    When protobuf IS present (a future environment), the right outcome
    is the opposite: the real TWS entry must have registered.
    """
    import glob
    import importlib.util
    import os

    try:
        import google.protobuf  # noqa: F401

        from iceberg_rest_server_spark.queries import REGISTRY

        assert "q140_stream_transform_with_state" in REGISTRY
        return
    except ImportError:
        pass

    # 1. no runtime (typeshed stubs don't count: no module spec)
    assert importlib.util.find_spec("google") is None

    # 2. nothing cached to install offline
    wheels = []
    for root in (os.path.expanduser("~/.cache/pip"), "/root/miniconda/pkgs"):
        wheels += [
            p
            for p in glob.glob(f"{root}/**/*protobuf*", recursive=True)
            if p.endswith((".whl", ".tar.gz", ".conda", ".tar.bz2"))
        ]
    assert wheels == [], wheels

    # 3. the generated module needs the descriptor-pool runtime: its
    # source builds messages from a serialized FileDescriptorProto
    import pyspark.sql.streaming.proto as proto_pkg

    src_path = os.path.join(os.path.dirname(proto_pkg.__file__), "StateMessage_pb2.py")
    src = open(src_path).read()
    assert "descriptor_pool" in src and "AddSerializedFile" in src
    # and the gated entry is correctly absent
    from iceberg_rest_server_spark.queries import REGISTRY

    assert "q140_stream_transform_with_state" not in REGISTRY
    assert "q140_processor_logic_batch" in REGISTRY  # the covered fallback

"""iteration_conf: loop tuning must be scale-gated and leak-free.

The contract the iterative operators (graph.pagerank,
dedup.connected_components) rely on: inside the block a SMALL measured
loop plans with AQE off and a data-sized partition count; a BIG loop is
untouched; and the session conf is restored afterwards even on error —
a leaked pinned conf would silently de-parallelize every later query in
the session.
"""

from __future__ import annotations

import pytest

from iceberg_rest_server_spark.operators._iterconf import (
    SMALL_LOOP_ROWS,
    iteration_conf,
)


def _snapshot(spark):
    return (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )


def test_small_loop_pins_and_restores(spark):
    before = _snapshot(spark)
    with iteration_conf(spark, 500):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert 1 <= parts <= int(before[1])
    assert _snapshot(spark) == before


def test_big_loop_is_noop(spark):
    before = _snapshot(spark)
    with iteration_conf(spark, SMALL_LOOP_ROWS + 1):
        assert _snapshot(spark) == before
    assert _snapshot(spark) == before


def test_restores_on_error(spark):
    before = _snapshot(spark)
    with pytest.raises(RuntimeError):
        with iteration_conf(spark, 10):
            raise RuntimeError("boom")
    assert _snapshot(spark) == before


def test_partition_count_scales_with_rows(spark):
    # just under the gate: partition count grows with the measured size
    # but never exceeds the session default
    with iteration_conf(spark, SMALL_LOOP_ROWS):
        big = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with iteration_conf(spark, 100):
        small = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert small <= big

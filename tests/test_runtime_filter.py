"""Scale-proof: Spark's runtime bloom-filter join reduction fires on
selective dim→fact joins (the shuffle-join analog of DPP's partition
pruning — tests/test_dynamic_partition_pruning.py).

At 100 TB this is the difference between shuffling every fact row and
shuffling only rows that might match the filtered build side: Spark
builds a bloom filter from the (selective) creation side and injects a
`might_contain` predicate into the fact scan's filter. The feature is
ON by default but gated by size thresholds aimed at production scans
(applicationSideScanSizeThreshold = 10 GB); the test lowers them so the
sf0.01 fixture crosses the gate — the PLAN SHAPE, not the size
heuristic, is what's being proven.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # broadcast joins bypass runtime filters (the build side is already
    # everywhere); force the shuffle-join path the filter exists for
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def rf_spark(spark):
    old = {}
    for k, v in _CONFS.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    return li.join(orders, li.l_orderkey == orders.o_orderkey)


def test_bloom_filter_injected_on_fact_side(rf_spark):
    agg = _join(rf_spark).groupBy().count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, "runtime bloom filter not injected:\n" + plan[:2000]
    # the probe must sit on the FACT scan's key, pre-shuffle
    probe_line = next(line for line in plan.splitlines() if "might_contain" in line)
    assert "l_orderkey" in probe_line


def test_bloom_filter_preserves_results(rf_spark):
    with_rf = _join(rf_spark).count()
    rf_spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without_rf = _join(rf_spark).count()
    finally:
        rf_spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_rf == without_rf
    assert with_rf > 0

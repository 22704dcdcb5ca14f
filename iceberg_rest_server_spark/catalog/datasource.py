"""Spark 4 Python Data Source for the REST catalog: lets ANY Spark user
read catalog tables with plain ``spark.read.format("iceberg_rest")`` —
no Python client object in sight, the same UX as the reference's
`USING iceberg` tables (tests/python/tests/conftest.py:204-226), built
on pyspark.sql.datasource (the Spark 4 extension point).

    spark.dataSource.register(IcebergRestDataSource)
    df = (spark.read.format("iceberg_rest")
          .option("uri", server_url)
          .option("project", "p").option("warehouse", "wh")
          .option("namespace", "ns").option("table", "t")
          .option("ref", "main")            # or snapshot_id for time travel
          .load())

Scale shape:
- The DRIVER does only metadata work: one REST load_table round-trip,
  one manifest read — file paths and the field-id schema ship to
  executors inside pickled InputPartitions.
- ONE InputPartition PER DATA FILE: Spark schedules file reads across
  the cluster exactly like its native parquet source; a 100 TB table
  is as parallel as its file count.
- Executor ``read()`` is pyarrow parquet → Arrow RecordBatches (the
  zero-copy path into Spark; never row-by-row Python objects), with
  field-id → display-name mapping and schema-evolution null backfill
  (a file written before ADD COLUMN simply lacks the new f<id> and
  yields nulls — same semantics as SparkCatalogTable._read_files).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

_ICEBERG_TO_ARROW = {
    "long": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "timestamp": "us",  # handled specially
    "date": "date32",
}

_ICEBERG_TO_SPARK = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampNTZType(),
    "date": T.DateType(),
}


class _FilePartition(InputPartition):
    def __init__(self, path: str, fields: list[dict]):
        self.path = path
        self.fields = fields  # [{"id", "name", "type"}...]


def _load_table_state(options: dict) -> tuple[list[dict], list[str]]:
    """Driver-side metadata resolution: (schema fields, data file paths).
    Goes through the same RestCatalogClient every other consumer uses —
    config round-trip for the prefix, 0x1F namespace separator, error
    envelope handling."""
    from .client import RestCatalogClient

    client = RestCatalogClient(options["uri"])
    client.configure(options.get("project", "p"), options.get("warehouse", "wh"))
    meta = client.load_table(
        options["namespace"].split("."), options["table"]
    )["metadata"]
    ref = options.get("ref")
    snapshot_id = options.get("snapshot_id")
    snap = None
    if snapshot_id is not None:
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == int(snapshot_id)
        )
    elif ref is not None:
        r = meta["refs"].get(ref)
        if r is None:
            raise ValueError(f"unknown ref {ref!r}")
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == r["snapshot-id"]
        )
    elif meta.get("current-snapshot-id") is not None:
        snap = next(
            (
                s
                for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"]
            ),
            None,
        )
    schema_id = meta["current-schema-id"]
    if snap is not None and snapshot_id is not None and snap.get("schema-id") is not None:
        schema_id = snap["schema-id"]  # time travel binds the snapshot schema
    fields = next(s for s in meta["schemas"] if s["schema-id"] == schema_id)["fields"]
    files: list[str] = []
    if snap is not None:
        manifest = snap["manifest-list"]
        path = manifest[len("file://"):] if manifest.startswith("file://") else manifest
        with open(path) as fh:
            files = json.load(fh)["files"]
    return fields, files


class IcebergRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self._fields, self._files = _load_table_state(options)

    def partitions(self) -> list[InputPartition]:
        # one partition per data file — the unit the manifests track and
        # the unit Spark schedules; empty tables read as zero partitions
        return [_FilePartition(p, self._fields) for p in self._files] or [
            _FilePartition("", self._fields)
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        # executor-side: Arrow batches, field-id addressing, null backfill
        import pyarrow as pa
        import pyarrow.parquet as pq

        def target_type(ice: str) -> pa.DataType:
            if ice == "timestamp":
                return pa.timestamp("us")
            return pa.type_for_alias(_ICEBERG_TO_ARROW[ice])

        target = pa.schema(
            [pa.field(f["name"], target_type(f["type"])) for f in partition.fields]
        )
        if not partition.path or not os.path.exists(partition.path):
            return iter(())

        def gen():
            table = pq.read_table(partition.path)
            n = table.num_rows
            arrays = []
            for f in partition.fields:
                fid = f"f{f['id']}"
                if fid in table.column_names:
                    arrays.append(
                        table.column(fid).cast(target_type(f["type"])).combine_chunks()
                    )
                else:
                    # schema evolution: field added after this file was
                    # written — all-null backfill, never wrong values
                    arrays.append(pa.nulls(n, target_type(f["type"])))
            yield pa.RecordBatch.from_arrays(
                [a.chunk(0) if isinstance(a, pa.ChunkedArray) else a for a in arrays],
                schema=target,
            )

        return gen()


class IcebergRestDataSource(DataSource):
    """`format("iceberg_rest")` — see module docstring for options."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_rest"

    def schema(self) -> T.StructType:
        fields, _ = _load_table_state(self.options)
        return T.StructType(
            [
                T.StructField(
                    f["name"], _ICEBERG_TO_SPARK[f["type"]], not f.get("required", False)
                )
                for f in fields
            ]
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return IcebergRestReader(self.options)

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
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
    "binary": "binary",
}

# NOTE on timestamps: this Data Source deliberately surfaces Iceberg
# `timestamp` as TimestampNTZType, NOT spark_table.py's TimestampType.
# The read path hands Spark Arrow timestamp("us") batches with no zone,
# and Spark maps zoneless Arrow timestamps to NTZ; declaring TZ here
# would make Spark re-interpret wall-clock values through the session
# zone on the Arrow boundary. spark_table.py reads through the JVM
# parquet reader where the session-zone cast is applied uniformly, so
# it keeps TimestampType. Both choices are documented at both sites.
_ICEBERG_TO_SPARK = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampNTZType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


class _FilePartition(InputPartition):
    def __init__(self, path: str, fields: list[dict]):
        self.path = path
        self.fields = fields  # [{"id", "name", "type"}...]


def _load_table_state(
    options: dict,
) -> tuple[list[dict], list[str], list[dict], dict[int, dict]]:
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
    # field definitions across every schema version + partition specs,
    # for path-encoded partition pruning (see pushFilters)
    fields_by_id: dict[int, dict] = {}
    for s in sorted(meta["schemas"], key=lambda s: s["schema-id"]):
        for f in s["fields"]:
            fields_by_id[f["id"]] = f
    return fields, files, meta.get("partition-specs", []), fields_by_id


class IcebergRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self._fields, self._files, self._specs, self._fields_by_id = (
            _load_table_state(options)
        )
        self._eq: dict[str, object] = {}

    def pushFilters(self, filters):
        """File-level partition pruning — Iceberg's manifest pruning
        surfaced through the Spark 4 pushdown hook: equality predicates
        on columns that feed any partition-spec field drop non-matching
        files (path-encoded ``p<field-id>=<transformed>`` tuples, same
        rule as SparkCatalogTable.read_where, robust to spec evolution:
        files missing the segment are conservatively kept). Pruning is
        file-granular, not row-exact, so EVERY filter is returned for
        Spark to re-apply post-scan — results stay exact, the scan just
        touches fewer files."""
        from pyspark.sql.datasource import EqualTo

        partition_sources = {
            self._fields_by_id[pf["source-id"]]["name"]
            for spec in self._specs
            for pf in spec.get("fields", [])
            if pf["source-id"] in self._fields_by_id
        }
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in partition_sources
            ):
                self._eq[f.attribute[0]] = f.value
        return filters  # file pruning only — Spark still filters rows

    def _pruned_files(self) -> list[str]:
        if not self._eq:
            return self._files
        from .spark_table import SparkCatalogTable

        expect: dict[int, str] = {}
        for spec in self._specs:
            for pf in spec.get("fields", []):
                src = self._fields_by_id.get(pf["source-id"])
                if src is None or src["name"] not in self._eq:
                    continue
                expect[pf["field-id"]] = SparkCatalogTable._transform_literal(
                    pf["transform"], self._eq[src["name"]], src["type"]
                )
        return [
            f
            for f in self._files
            if all(
                got is None or got == want
                for fid, want in expect.items()
                for got in [SparkCatalogTable._file_partition_values(f).get(fid)]
            )
        ]

    def partitions(self) -> list[InputPartition]:
        # one partition per (pruned) data file — the unit the manifests
        # track and the unit Spark schedules; empty reads as one no-op
        files = self._pruned_files()
        return [_FilePartition(p, self._fields) for p in files] or [
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
        fields = _load_table_state(self.options)[0]
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

    def writer(self, schema: T.StructType, overwrite: bool):
        return IcebergRestWriter(self.options, overwrite)

    def streamReader(self, schema: T.StructType):
        return IcebergRestStreamReader(self.options)


# --------------------------------------------------------------- write path

class _FilesCommitMessage(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class IcebergRestWriter(DataSourceArrowWriter):
    """`df.write.format("iceberg_rest").mode("append"|"overwrite")` —
    the Iceberg two-phase commit protocol in its native shape:

    1. *Executors* each write their partition as one parquet data file
       (Arrow batches straight to disk, display names mapped to f<id>
       field-id columns exactly like SparkCatalogTable._write_files) and
       return only the file PATH as their commit message — data never
       moves to the driver.
    2. The *driver's* commit() makes ONE CAS-guarded REST commit:
       manifest of (head files + new files) for append, or new files
       only for overwrite, then add-snapshot + set-snapshot-ref. A
       concurrent committer's CAS failure surfaces as the standard 409
       and Spark retries/aborts the job — exactly the reference's
       optimistic-concurrency contract (rest/table.rs:153-189).
    3. abort() deletes the orphaned files (and remove_orphan_files
       would reap any leak after a crash, same as Iceberg).
    """

    def __init__(self, options: dict, overwrite: bool):
        from .client import RestCatalogClient

        self._options = dict(options)
        self._overwrite = overwrite
        client = RestCatalogClient(options["uri"])
        client.configure(options.get("project", "p"), options.get("warehouse", "wh"))
        meta = client.load_table(options["namespace"].split("."), options["table"])[
            "metadata"
        ]
        schema = next(
            s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
        )
        self._fields = schema["fields"]
        loc = meta["location"]
        loc = loc[len("file://"):] if loc.startswith("file://") else loc
        self._location = loc
        import uuid as _uuid

        self._data_dir = os.path.join(loc, "data", _uuid.uuid4().hex)

    # executor-side
    def write(self, iterator) -> WriterCommitMessage:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        def target_type(ice: str) -> "pa.DataType":
            if ice == "timestamp":
                return pa.timestamp("us")
            return pa.type_for_alias(_ICEBERG_TO_ARROW[ice])

        fid_schema = pa.schema(
            [pa.field(f"f{f['id']}", target_type(f["type"])) for f in self._fields]
        )
        batches = []
        for batch in iterator:
            arrays = []
            for f in self._fields:
                idx = batch.schema.get_field_index(f["name"])
                if idx < 0:
                    # get_field_index returns -1 for a missing name, and
                    # batch.column(-1) would silently alias the LAST column
                    raise ValueError(
                        f"column {f['name']!r} missing from input DataFrame; "
                        f"table requires {[x['name'] for x in self._fields]}"
                    )
                arrays.append(batch.column(idx).cast(target_type(f["type"])))
            batches.append(
                pa.RecordBatch.from_arrays(arrays, schema=fid_schema)
            )
        if not batches or sum(b.num_rows for b in batches) == 0:
            return _FilesCommitMessage([])  # empty partition → no file
        os.makedirs(self._data_dir, exist_ok=True)
        path = os.path.join(self._data_dir, f"part-{_uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_batches(batches, schema=fid_schema), path)
        return _FilesCommitMessage([path])

    # driver-side
    def commit(self, messages) -> None:
        import time as _time
        import uuid as _uuid

        from .client import RestCatalogClient

        new_files = [p for m in messages for p in m.files]
        client = RestCatalogClient(self._options["uri"])
        client.configure(
            self._options.get("project", "p"), self._options.get("warehouse", "wh")
        )
        ns = self._options["namespace"].split(".")
        tbl = self._options["table"]
        meta = client.load_table(ns, tbl)["metadata"]
        head_ref = meta["refs"].get("main")
        parent_id = None if head_ref is None else head_ref["snapshot-id"]
        existing: list[str] = []
        if not self._overwrite and parent_id is not None:
            head = next(s for s in meta["snapshots"] if s["snapshot-id"] == parent_id)
            manifest = head["manifest-list"]
            mp = manifest[len("file://"):] if manifest.startswith("file://") else manifest
            with open(mp) as fh:
                existing = json.load(fh)["files"]
        snapshot_id = _uuid.uuid4().int % (1 << 62)
        manifest_path = os.path.join(
            self._location, "metadata", f"manifest-{snapshot_id}.json"
        )
        os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
        files = existing + new_files
        with open(manifest_path, "w") as fh:
            json.dump({"files": files}, fh)
        operation = "overwrite" if self._overwrite else "append"
        snapshot = {
            "snapshot-id": snapshot_id,
            "parent-snapshot-id": parent_id,
            "timestamp-ms": int(_time.time() * 1000),
            "operation": operation,
            "manifest-list": manifest_path,
            "summary": {
                "operation": operation,
                "added-files": str(len(new_files)),
                "writer": "python-datasource",
            },
        }
        client.commit_table(
            ns,
            tbl,
            # CAS on the branch head: a concurrent commit ⇒ 409, Spark
            # surfaces the failure — optimistic concurrency, not lost data
            [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": parent_id}],
            [
                {"action": "add-snapshot", "snapshot": snapshot},
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "snapshot-id": snapshot_id,
                    "type": "branch",
                },
            ],
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for p in m.files:
                try:
                    os.remove(p)
                except OSError:
                    pass


# ------------------------------------------------------------- stream read

class IcebergRestStreamReader(DataSourceStreamReader):
    """`spark.readStream.format("iceberg_rest")` — incremental snapshot
    tailing (Iceberg's streaming read): each micro-batch is the set of
    data files APPENDED between two snapshots on the parent chain.

    - Offsets are snapshot ids ({"snapshot_id": N}; -1 = before any
      snapshot, so the first batch reads the whole current table then
      the query tails new commits — file-source semantics).
    - partitions(start, end) is metadata-only on the driver: walk the
      parent chain end→start and diff each append snapshot's file list
      against its parent (manifest reads). One InputPartition per added
      file, read executor-side exactly like the batch path.
    - An overwrite/replace snapshot inside the range raises — its
      row-level delta is not recoverable from an append-only file diff
      (same contract as SparkCatalogTable.read_incremental and
      Iceberg's own streaming source).
    - Offset persistence in the checkpoint gives exactly-once batches
      across restarts; commit() is a no-op because snapshots are
      immutable.
    """

    def __init__(self, options: dict):
        self._options = dict(options)
        self._fields, _, _, _ = _load_table_state(options)

    def _meta(self) -> dict:
        from .client import RestCatalogClient

        client = RestCatalogClient(self._options["uri"])
        client.configure(
            self._options.get("project", "p"), self._options.get("warehouse", "wh")
        )
        return client.load_table(
            self._options["namespace"].split("."), self._options["table"]
        )["metadata"]

    @staticmethod
    def _files_of(snap: dict) -> list[str]:
        manifest = snap["manifest-list"]
        path = manifest[len("file://"):] if manifest.startswith("file://") else manifest
        with open(path) as fh:
            return json.load(fh)["files"]

    def initialOffset(self) -> dict:
        return {"snapshot_id": -1}

    def latestOffset(self) -> dict:
        meta = self._meta()
        cur = meta.get("current-snapshot-id")
        return {"snapshot_id": -1 if cur is None else cur}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        start_id, end_id = start["snapshot_id"], end["snapshot_id"]
        if end_id == -1 or start_id == end_id:
            return []
        meta = self._meta()
        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        added: list[str] = []
        cur: int | None = end_id
        while cur is not None and cur != start_id:
            snap = by_id.get(cur)
            if snap is None:
                raise ValueError(
                    f"snapshot {cur} expired from history before the stream read it"
                )
            parent = snap.get("parent-snapshot-id")
            op = snap.get("operation", snap.get("summary", {}).get("operation"))
            if op not in (None, "append"):
                raise ValueError(
                    f"snapshot {cur} is {op!r}; streaming reads require an "
                    "append-only history (Iceberg streaming contract)"
                )
            if parent is not None and parent not in by_id:
                raise ValueError(
                    f"parent snapshot {parent} expired from history before "
                    "the stream read it"
                )
            parent_files = set() if parent is None else set(
                self._files_of(by_id[parent])
            )
            added.extend(
                f for f in self._files_of(snap) if f not in parent_files
            )
            cur = parent
        if start_id != -1 and cur is None:
            # The walk hit the root without ever meeting start_id: the
            # checkpointed offset is no longer an ancestor of end (e.g.
            # rollback_to followed by new commits rewrote history).
            # Falling through would silently re-emit the ENTIRE table as
            # "added" — duplicate delivery. Fail loudly instead.
            raise ValueError(
                f"start offset snapshot {start_id} is not an ancestor of "
                f"{end_id} — table history was rewritten (rollback?); "
                "restart the stream from a fresh checkpoint"
            )
        return [_FilePartition(p, self._fields) for p in added]

    def read(self, partition: _FilePartition):
        return IcebergRestReader.read(self, partition)  # same Arrow path

    def commit(self, end: dict) -> None:
        pass  # snapshots are immutable; the checkpoint holds the offset

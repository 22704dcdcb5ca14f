"""Property-based tests (hypothesis): the metadata builder's invariants
hold under arbitrary interleavings of valid updates — the class of bug
SURVEY.md §7 ranks hardest ('easy to silently corrupt')."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_rest_server_spark.catalog.metadata import (
    PARTITION_FIELD_ID_START,
    TableMetadataBuilder,
)

BASE_SCHEMA = {
    "type": "struct",
    "fields": [
        {"id": 1, "name": "c1", "required": False, "type": "long"},
        {"id": 2, "name": "c2", "required": False, "type": "string"},
    ],
}


def fresh_builder() -> TableMetadataBuilder:
    b = TableMetadataBuilder()
    b.apply({"action": "set-location", "location": "file:///tmp/x"})
    b.apply({"action": "add-schema", "schema": dict(BASE_SCHEMA)})
    b.apply({"action": "set-current-schema", "schema-id": -1})
    b.build()
    return b


update_op = st.sampled_from(["add_column", "snapshot", "tag", "props", "spec"])


@settings(max_examples=60, deadline=None)
@given(st.lists(update_op, min_size=1, max_size=25))
def test_invariants_hold_under_update_sequences(ops):
    b = fresh_builder()
    next_col = 3
    next_snap = 1
    for op in ops:
        if op == "add_column":
            schema = b.schema_by_id(b.m["current-schema-id"])
            new = {
                "type": "struct",
                "fields": schema["fields"]
                + [{"id": next_col, "name": f"c{next_col}", "required": False, "type": "int"}],
            }
            b.apply({"action": "add-schema", "schema": new, "last-column-id": next_col})
            b.apply({"action": "set-current-schema", "schema-id": -1})
            next_col += 1
        elif op == "snapshot":
            b.apply(
                {
                    "action": "add-snapshot",
                    "snapshot": {"snapshot-id": next_snap, "sequence-number": next_snap},
                }
            )
            b.apply(
                {"action": "set-snapshot-ref", "ref-name": "main", "snapshot-id": next_snap}
            )
            next_snap += 1
        elif op == "tag" and b.m["current-snapshot-id"] is not None:
            b.apply(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": f"tag{next_snap}",
                    "snapshot-id": b.m["current-snapshot-id"],
                    "type": "tag",
                }
            )
        elif op == "props":
            b.apply({"action": "set-properties", "updates": {f"k{next_snap}": "v"}})
        elif op == "spec":
            fields = [
                {
                    "source-id": 1,
                    "transform": f"bucket[{4 + next_snap % 3}]",
                    "name": f"p{next_snap}_{next_col}",
                }
            ]
            b.apply({"action": "add-spec", "spec": {"fields": fields}})
            b.apply({"action": "set-default-spec", "spec-id": -1})

    m = b.build()
    # invariants (table_metadata.rs contracts):
    schema_ids = [s["schema-id"] for s in m["schemas"]]
    assert len(schema_ids) == len(set(schema_ids))
    assert m["current-schema-id"] in schema_ids
    assert m["last-column-id"] >= max(
        f["id"] for s in m["schemas"] for f in s["fields"]
    )
    seqs = [s["sequence-number"] for s in m["snapshots"]]
    assert seqs == sorted(seqs) and len(seqs) == len(set(seqs))
    assert m["last-sequence-number"] == (max(seqs) if seqs else 0)
    for name, ref in m["refs"].items():
        assert b.snapshot_by_id(ref["snapshot-id"]) is not None
    if "main" in m["refs"]:
        assert m["current-snapshot-id"] == m["refs"]["main"]["snapshot-id"]
    part_ids = [f["field-id"] for s in m["partition-specs"] for f in s["fields"]]
    assert all(pid >= PARTITION_FIELD_ID_START for pid in part_ids)
    assert m["last-partition-id"] >= max(part_ids, default=PARTITION_FIELD_ID_START - 1)
    spec_ids = [s["spec-id"] for s in m["partition-specs"]]
    assert len(spec_ids) == len(set(spec_ids))
    assert m["default-spec-id"] in spec_ids

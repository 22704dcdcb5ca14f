"""Catalog-plane parity tests — direct ports of the *behavior contracts*
in the reference's unit/integration tests (not of the code):

- table_metadata.rs:908-1409 (metadata invariants)
- rest/table.rs:92-248 (requirements)
- postgres/table.rs:854-1493 (stage-create overwrite matrix, rename,
  staged invisibility, multi-table commit)
- catalog/namespace.rs (reserved namespaces, depth, property guards)
"""

from __future__ import annotations

import pytest

from iceberg_rest_server_spark.catalog import (
    CatalogStore,
    CommitError,
    ConflictError,
    NotFoundError,
    TableMetadataBuilder,
    ValidationError,
    WarehouseNotEmptyError,
    assert_requirement,
)
from iceberg_rest_server_spark.catalog.client import CatalogHTTPError, RestCatalogClient
from iceberg_rest_server_spark.catalog.server import ServerThread

SCHEMA = {
    "type": "struct",
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "name", "required": False, "type": "string"},
    ],
}


def _builder_with_schema() -> TableMetadataBuilder:
    b = TableMetadataBuilder()
    b.apply({"action": "set-location", "location": "file:///tmp/t"})
    b.apply({"action": "add-schema", "schema": dict(SCHEMA)})
    b.apply({"action": "set-current-schema", "schema-id": -1})
    return b


# ------------------------------------------------------- metadata builder

def test_uuid_reassignment_rejected():
    b = _builder_with_schema()
    with pytest.raises(CommitError):
        b.apply({"action": "assign-uuid", "uuid": "11111111-1111-1111-1111-111111111111"})


def test_format_version_downgrade_rejected():
    b = _builder_with_schema()
    with pytest.raises(CommitError):
        b.apply({"action": "upgrade-format-version", "format-version": 1})


def test_schema_structural_dedup_and_id_increment():
    b = _builder_with_schema()
    b.apply({"action": "add-schema", "schema": dict(SCHEMA)})  # identical → dedup
    assert len(b.m["schemas"]) == 1
    wider = {
        "type": "struct",
        "fields": SCHEMA["fields"] + [{"id": 3, "name": "x", "required": False, "type": "int"}],
    }
    b.apply({"action": "add-schema", "schema": wider, "last-column-id": 3})
    assert [s["schema-id"] for s in b.m["schemas"]] == [0, 1]
    assert b.m["last-column-id"] == 3


def test_last_column_id_regression_rejected():
    b = _builder_with_schema()
    b.m["last-column-id"] = 5
    with pytest.raises(CommitError):
        b.apply({"action": "add-schema", "schema": dict(SCHEMA), "last-column-id": 2})


def test_partition_field_ids_allocated_from_1000():
    b = _builder_with_schema()
    b.apply(
        {
            "action": "add-spec",
            "spec": {"fields": [{"source-id": 1, "name": "id_bucket", "transform": "bucket[16]"}]},
        }
    )
    b.apply({"action": "set-default-spec", "spec-id": -1})
    spec = b.spec_by_id(b.m["default-spec-id"])
    assert spec["fields"][0]["field-id"] == 1000  # table_metadata.rs:83
    b.apply(
        {
            "action": "add-spec",
            "spec": {"fields": [{"source-id": 2, "name": "name_ident", "transform": "identity"}]},
        }
    )
    assert b.m["partition-specs"][-1]["fields"][0]["field-id"] == 1001


def test_partition_duplicate_name_and_redundant_pair_rejected():
    b = _builder_with_schema()
    with pytest.raises(CommitError):
        b.apply(
            {
                "action": "add-spec",
                "spec": {
                    "fields": [
                        {"source-id": 1, "name": "p", "transform": "identity"},
                        {"source-id": 2, "name": "p", "transform": "identity"},
                    ]
                },
            }
        )
    with pytest.raises(CommitError):
        b.apply(
            {
                "action": "add-spec",
                "spec": {
                    "fields": [
                        {"source-id": 1, "name": "a", "transform": "identity"},
                        {"source-id": 1, "name": "b", "transform": "identity"},
                    ]
                },
            }
        )


def test_reserved_properties_rejected():
    b = _builder_with_schema()
    with pytest.raises(CommitError):
        b.apply({"action": "set-properties", "updates": {"format-version": "3"}})


def test_snapshot_sequence_strictly_increasing():
    b = _builder_with_schema()
    b.build()
    b.apply({"action": "add-snapshot", "snapshot": {"snapshot-id": 1, "sequence-number": 1}})
    with pytest.raises(CommitError):
        b.apply({"action": "add-snapshot", "snapshot": {"snapshot-id": 2, "sequence-number": 1}})


def test_snapshot_before_schema_rejected():
    b = TableMetadataBuilder()
    with pytest.raises(CommitError):
        b.apply({"action": "add-snapshot", "snapshot": {"snapshot-id": 1}})


def test_main_ref_drives_current_snapshot_and_log():
    b = _builder_with_schema()
    b.build()
    b.apply({"action": "add-snapshot", "snapshot": {"snapshot-id": 7, "sequence-number": 1}})
    b.apply({"action": "set-snapshot-ref", "ref-name": "main", "snapshot-id": 7})
    assert b.m["current-snapshot-id"] == 7
    assert [e["snapshot-id"] for e in b.m["snapshot-log"]] == [7]
    b.apply({"action": "remove-snapshot-ref", "ref-name": "main"})
    assert b.m["current-snapshot-id"] is None
    assert b.m["snapshot-log"] == []


def test_remove_snapshots_drops_dangling_refs():
    b = _builder_with_schema()
    b.build()
    b.apply({"action": "add-snapshot", "snapshot": {"snapshot-id": 1, "sequence-number": 1}})
    b.apply({"action": "set-snapshot-ref", "ref-name": "tag1", "snapshot-id": 1, "type": "tag"})
    b.apply({"action": "remove-snapshots", "snapshot-ids": [1]})
    assert b.m["refs"] == {}


def test_location_immutable_post_create():
    b = _builder_with_schema()
    with pytest.raises(CommitError):
        b.apply({"action": "set-location", "location": "file:///elsewhere"})


def test_build_injects_default_spec_and_order():
    b = _builder_with_schema()
    m = b.build()
    assert m["default-spec-id"] == 0 and m["partition-specs"][0]["fields"] == []
    assert m["default-sort-order-id"] == 0 and m["sort-orders"][0]["fields"] == []


# ---------------------------------------------------------- requirements

def test_requirements_matrix():
    b = _builder_with_schema()
    m = b.build()
    assert_requirement({"type": "assert-create"}, None)
    with pytest.raises(CommitError):
        assert_requirement({"type": "assert-create"}, m)
    assert_requirement({"type": "assert-table-uuid", "uuid": m["table-uuid"]}, m)
    with pytest.raises(CommitError):
        assert_requirement({"type": "assert-table-uuid", "uuid": "nope"}, m)
    assert_requirement({"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None}, m)
    b.apply({"action": "add-snapshot", "snapshot": {"snapshot-id": 5, "sequence-number": 1}})
    b.apply({"action": "set-snapshot-ref", "ref-name": "main", "snapshot-id": 5})
    assert_requirement({"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 5}, b.m)
    with pytest.raises(CommitError):
        assert_requirement(
            {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 4}, b.m
        )
    with pytest.raises(CommitError):  # ref must not exist
        assert_requirement(
            {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None}, b.m
        )


# ----------------------------------------------------------------- store

@pytest.fixture()
def store():
    s = CatalogStore()
    wid = s.create_warehouse("p1", "wh", "file:///tmp/wh")
    s.create_namespace(wid, ["ns1"])
    return s, wid


def test_reserved_namespace_rejected(store):
    s, wid = store
    with pytest.raises(ValidationError):
        s.create_namespace(wid, ["system"])
    with pytest.raises(ValidationError):
        s.drop_namespace(wid, ["examples"])


def test_namespace_depth_limit(store):
    s, wid = store
    with pytest.raises(ValidationError):
        s.create_namespace(wid, ["a", "b"])  # MAX_NAMESPACE_DEPTH = 1


def test_namespace_location_property_rejected(store):
    s, wid = store
    with pytest.raises(ValidationError):
        s.create_namespace(wid, ["ns2"], {"location": "file:///x"})
    with pytest.raises(ValidationError):
        s.update_namespace_properties(wid, ["ns1"], [], {"location": "file:///x"})


def test_namespace_case_insensitive_conflict(store):
    s, wid = store
    with pytest.raises(ConflictError):
        s.create_namespace(wid, ["NS1"])  # case-insensitive collation


def test_drop_nonempty_namespace_conflicts(store):
    s, wid = store
    s.create_table(wid, ["ns1"], "t", SCHEMA)
    with pytest.raises(ConflictError):
        s.drop_namespace(wid, ["ns1"])


def test_table_property_keys_must_be_lowercase(store):
    s, wid = store
    with pytest.raises(ValidationError):
        s.create_table(wid, ["ns1"], "t", SCHEMA, properties={"MyKey": "v"})


def test_client_location_rejected(store):
    s, wid = store
    with pytest.raises(ValidationError):
        s.create_table(wid, ["ns1"], "t", SCHEMA, location="file:///custom")


def test_staged_table_invisible_and_overwritable(store):
    """Stage-create contract (postgres/table.rs:855-860)."""
    s, wid = store
    s.create_table(wid, ["ns1"], "t", SCHEMA, stage_create=True)
    assert s.list_tables(wid, ["ns1"])[0] == []          # staged filtered from list
    with pytest.raises(NotFoundError):
        s.load_table(wid, ["ns1"], "t")               # staged 404 on load
    assert not s.table_exists(wid, ["ns1"], "t")
    # a second stage-create over a staged row is allowed…
    s.create_table(wid, ["ns1"], "t", SCHEMA, stage_create=True)
    # …and a real create over a staged row is allowed
    s.create_table(wid, ["ns1"], "t", SCHEMA)
    assert s.list_tables(wid, ["ns1"])[0] == ["t"]
    # but creating over a committed table conflicts
    with pytest.raises(ConflictError):
        s.create_table(wid, ["ns1"], "t", SCHEMA)


def test_rename_within_and_across_namespaces(store):
    s, wid = store
    s.create_namespace(wid, ["ns2"])
    s.create_table(wid, ["ns1"], "t", SCHEMA)
    s.rename_table(wid, ["ns1"], "t", ["ns1"], "t2")
    assert s.list_tables(wid, ["ns1"])[0] == ["t2"]
    s.rename_table(wid, ["ns1"], "t2", ["ns2"], "t3")
    assert s.list_tables(wid, ["ns2"])[0] == ["t3"]
    assert s.list_tables(wid, ["ns1"])[0] == []


def test_inactive_warehouse_blocks_create(store):
    s, wid = store
    s.set_warehouse_status(wid, "inactive")
    with pytest.raises(NotFoundError):
        s.get_warehouse_by_name("p1", "wh")  # active-only lookup
    with pytest.raises(ConflictError):
        s.create_table(wid, ["ns1"], "t", SCHEMA)


def test_multi_table_commit_atomic(store):
    """One failing requirement aborts every change (catalog/tables.rs:746-962)."""
    s, wid = store
    s.create_table(wid, ["ns1"], "a", SCHEMA)
    s.create_table(wid, ["ns1"], "b", SCHEMA)
    ok = {"action": "set-properties", "updates": {"k": "v"}}
    with pytest.raises(CommitError):
        s.commit_transaction(
            wid,
            [
                {"namespace": ["ns1"], "name": "a", "requirements": [], "updates": [ok]},
                {
                    "namespace": ["ns1"],
                    "name": "b",
                    "requirements": [{"type": "assert-table-uuid", "uuid": "wrong"}],
                    "updates": [ok],
                },
            ],
        )
    # table a must be untouched
    assert s.load_table(wid, ["ns1"], "a")["metadata"]["properties"] == {}
    # and a valid commit applies to both
    s.commit_transaction(
        wid,
        [
            {"namespace": ["ns1"], "name": "a", "requirements": [], "updates": [ok]},
            {"namespace": ["ns1"], "name": "b", "requirements": [], "updates": [ok]},
        ],
    )
    assert s.load_table(wid, ["ns1"], "b")["metadata"]["properties"] == {"k": "v"}


# ------------------------------------------------------------------ HTTP

def test_rest_roundtrip_and_error_codes():
    with ServerThread() as server:
        c = RestCatalogClient(server.base_url)
        c.create_warehouse("p1", "wh", "file:///tmp/wh-rest")
        c.configure("p1", "wh")
        c.create_namespace(["ns"], {"owner": "me"})
        assert c.list_namespaces() == [["ns"]]
        assert c.load_namespace(["ns"])["properties"] == {"owner": "me"}
        out = c.update_namespace_properties(["ns"], removals=["owner"], updates={"x": "1"})
        assert out["removed"] == ["owner"] and out["updated"] == ["x"]

        c.create_table(["ns"], "t", SCHEMA)
        assert c.list_tables(["ns"]) == ["t"]
        loaded = c.load_table(["ns"], "t")
        assert loaded["metadata"]["current-schema-id"] == 0

        # 404 on missing table, with error envelope
        with pytest.raises(CatalogHTTPError) as e:
            c.load_table(["ns"], "missing")
        assert e.value.code == 404

        # 409 on duplicate create
        with pytest.raises(CatalogHTTPError) as e:
            c.create_table(["ns"], "t", SCHEMA)
        assert e.value.code == 409

        # 400 on bad property key
        with pytest.raises(CatalogHTTPError) as e:
            c.create_table(["ns"], "t2", SCHEMA, properties={"BadKey": "v"})
        assert e.value.code == 400

        # commit with failing CAS → 409
        with pytest.raises(CatalogHTTPError) as e:
            c.commit_table(
                ["ns"], "t",
                [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 123}],
                [{"action": "set-properties", "updates": {"k": "v"}}],
            )
        assert e.value.code == 409

        # register_table → 501 parity; the route lives UNDER a namespace
        # (/v1/{prefix}/namespaces/{ns}/register — this test previously
        # probed a nonexistent prefix-level path and pinned the 501 to
        # the wrong route; the r9 OpenAPI route-coverage test caught it)
        with pytest.raises(CatalogHTTPError) as e:
            c._request(
                "POST",
                f"/catalog/v1/{c.prefix}/namespaces/ns_a/register",
                {"name": "x", "metadata-location": "file:///m.json"},
            )
        assert e.value.code == 501

        # ...but POST-only (ADVICE r9): the reference registers the
        # route with axum `post()` (catalog/tables.rs:211), so a GET on
        # the same path is an unrouted 404 there, never 501
        with pytest.raises(CatalogHTTPError) as e:
            c._request("GET", f"/catalog/v1/{c.prefix}/namespaces/ns_a/register", None)
        assert e.value.code == 404

        # oauth tokens → 501 parity (api/iceberg/v1/oauth.rs:22-33 routes
        # to a Service trait no crate implements)
        with pytest.raises(CatalogHTTPError) as e:
            c._request("POST", "/catalog/v1/oauth/tokens", {"grant_type": "client_credentials"})
        assert e.value.code == 501

        # metrics accepted and discarded
        c.report_metrics(["ns"], "t", {"report-type": "scan-report"})

        c.rename_table(["ns"], "t", ["ns"], "t2")
        assert c.list_tables(["ns"]) == ["t2"]

        # pagination: real tokens (the reference accepts but never pages)
        for i in range(5):
            c.create_table(["ns"], f"p{i}", SCHEMA)
        page1 = c._request("GET", f"/catalog/v1/{c.prefix}/namespaces/ns/tables?pageSize=3")
        assert len(page1["identifiers"]) == 3 and page1["next-page-token"] is not None
        page2 = c._request(
            "GET",
            f"/catalog/v1/{c.prefix}/namespaces/ns/tables?pageSize=3&pageToken={page1['next-page-token']}",
        )
        assert len(page2["identifiers"]) == 3 and page2["next-page-token"] is None
        names = [i["name"] for i in page1["identifiers"] + page2["identifiers"]]
        assert names == sorted(names) and len(names) == 6

        for i in range(5):
            c.drop_table(["ns"], f"p{i}")
        c.drop_table(["ns"], "t2")
        c.drop_namespace(["ns"])


def test_delete_warehouse_empty_then_404(store):
    """DELETE /warehouse/{id}: non-empty → 409 WarehouseNotEmpty, empty →
    gone, and the attached secret dies with it (management/mod.rs:259-295,
    postgres/warehouse.rs:269-299)."""
    s, wid = store
    with pytest.raises(WarehouseNotEmptyError):
        s.delete_warehouse(wid)  # ns1 exists from the fixture
    s.drop_namespace(wid, ["ns1"])
    s.set_storage_profile(
        wid,
        {"region": "r", "bucket": "b", "access-key-id": "k", "secret-access-key": "x"},
    )
    secret_id = s.get_warehouse(wid)["storage_profile"]["storage-secret-id"]
    s.delete_warehouse(wid)
    with pytest.raises(NotFoundError):
        s.get_warehouse(wid)
    assert s._conn.execute(
        "SELECT count(*) FROM secret WHERE secret_id = ?", (secret_id,)
    ).fetchone()[0] == 0
    with pytest.raises(NotFoundError):
        s.delete_warehouse(wid)  # idempotence is NOT promised: 404 like the reference


def test_update_storage_credential_rotates_only_secret(store):
    """POST /warehouse/{id}/storage-credential keeps the profile bytes,
    swaps the secret, deletes the old one; None detaches
    (management/v1/warehouse.rs:391-441)."""
    s, wid = store
    with pytest.raises(ValidationError):
        s.update_storage_credential(wid, {"access-key-id": "k"})  # no profile yet
    s.set_storage_profile(
        wid,
        {"region": "r", "bucket": "b", "access-key-id": "k1", "secret-access-key": "x1"},
    )
    before = s.get_warehouse(wid)["storage_profile"]
    old_secret = before["storage-secret-id"]
    s.update_storage_credential(
        wid, {"access-key-id": "k2", "secret-access-key": "x2"}
    )
    after = s.get_warehouse(wid)["storage_profile"]
    assert after["storage-secret-id"] != old_secret
    assert {k: v for k, v in after.items() if k != "storage-secret-id"} == {
        k: v for k, v in before.items() if k != "storage-secret-id"
    }  # profile untouched — no immutability trip
    assert s.get_storage_credentials(wid)["access-key-id"] == "k2"
    assert s._conn.execute(
        "SELECT count(*) FROM secret WHERE secret_id = ?", (old_secret,)
    ).fetchone()[0] == 0
    with pytest.raises(ValidationError):
        s.update_storage_credential(wid, {"not-a-key": "v"})
    # None detaches the credential entirely
    s.update_storage_credential(wid, None)
    assert "storage-secret-id" not in s.get_warehouse(wid)["storage_profile"]
    assert s.get_storage_credentials(wid) == {}


def test_warehouse_delete_and_credential_routes_http():
    """Route-level: DELETE 200/409/404 and storage-credential 200 over
    HTTP (management/mod.rs:268-292 router shape; Result<()> handlers
    answer 200 with an empty body — axum IntoResponse for unit)."""
    with ServerThread() as server:
        c = RestCatalogClient(server.base_url)
        wid = c.create_warehouse("p", "wh", "s3://bucket-a/prefix")
        c._request(
            "POST",
            f"/management/v1/warehouse/{wid}/storage-profile",
            {"region": "r", "bucket": "bucket-a", "access-key-id": "k", "secret-access-key": "x"},
        )
        c._request(
            "POST",
            f"/management/v1/warehouse/{wid}/storage-credential",
            {"new-storage-credential": {"access-key-id": "k2", "secret-access-key": "x2"}},
        )
        c.configure("p", "wh")
        c.create_namespace(["ns"])
        with pytest.raises(CatalogHTTPError) as ei:
            c._request("DELETE", f"/management/v1/warehouse/{wid}")
        assert ei.value.code == 409
        assert ei.value.error_type == "WarehouseNotEmpty"
        c.drop_namespace(["ns"])
        c._request("DELETE", f"/management/v1/warehouse/{wid}")
        with pytest.raises(CatalogHTTPError) as ei:
            c._request("GET", f"/management/v1/warehouse/{wid}")
        assert ei.value.code == 404


def test_health_route_and_cli():
    """GET /health answers outside the auth layer (api/router.rs:53);
    the CLI's healthcheck/version/migrate commands mirror
    iceberg-catalog-bin (main.rs:29-39)."""
    import json as _json
    import urllib.request

    from iceberg_rest_server_spark.catalog.__main__ import main as cli_main
    from iceberg_rest_server_spark.catalog.server import ServerThread

    with ServerThread() as server:
        with urllib.request.urlopen(f"{server.base_url}/health") as resp:
            assert resp.status == 200
            assert _json.loads(resp.read())["status"] == "ok"
        assert cli_main(["healthcheck", "--url", server.base_url]) == 0
    assert cli_main(["healthcheck", "--url", "http://127.0.0.1:1"]) == 1
    assert cli_main(["version"]) == 0
    assert cli_main(["migrate"]) == 0


def test_health_route_bypasses_token_auth():
    """With an OIDC verifier configured every route 401s without a
    bearer token — except /health, which the reference mounts outside
    the middleware."""
    import urllib.error
    import urllib.request

    from iceberg_rest_server_spark.catalog.auth import TokenVerifier
    from iceberg_rest_server_spark.catalog.server import ServerThread

    class _RejectAll(TokenVerifier):
        def __init__(self):
            pass

        def verify(self, token):
            from iceberg_rest_server_spark.catalog.store import UnauthorizedError

            raise UnauthorizedError("no")

    with ServerThread(verifier=_RejectAll()) as server:
        with urllib.request.urlopen(f"{server.base_url}/health") as resp:
            assert resp.status == 200
        try:
            urllib.request.urlopen(f"{server.base_url}/management/v1/project")
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401


def test_scrub_strips_exactly_the_pinned_keys():
    """Contract pin for _scrub_metadata_nulls (VERDICT r9 #4): the
    null-scrub may strip ONLY the keys in SCRUBBED_NULL_KEYS (+ the
    top-level metadata-location special case). Any new null-valued
    metadata key must survive to the wire — where the OpenAPI response
    validator fails loudly — rather than be silently eaten. If this
    test fails because a new key needs scrubbing, add it to
    SCRUBBED_NULL_KEYS *and* to the expected set here deliberately."""
    from iceberg_rest_server_spark.catalog.server import (
        SCRUBBED_NULL_KEYS,
        _scrub_metadata_nulls,
    )

    # the pinned set itself is part of the contract
    assert SCRUBBED_NULL_KEYS == {"current-snapshot-id", "parent-snapshot-id"}

    payload = {
        "metadata-location": None,
        "metadata": {
            "current-snapshot-id": None,          # stripped (pinned)
            "some-future-nullable-field": None,   # must SURVIVE
            "properties": {"owner": None},        # must SURVIVE (user data)
            "snapshots": [
                {"snapshot-id": 1, "parent-snapshot-id": None},  # stripped
                {"snapshot-id": 2, "parent-snapshot-id": 1},
            ],
            "refs": {},
        },
    }
    out = _scrub_metadata_nulls(payload)
    assert "metadata-location" not in out
    assert "current-snapshot-id" not in out["metadata"]
    assert "parent-snapshot-id" not in out["metadata"]["snapshots"][0]
    # non-null pinned keys are never touched
    assert out["metadata"]["snapshots"][1]["parent-snapshot-id"] == 1
    # unknown nulls survive so the OpenAPI validator can see them
    assert out["metadata"]["some-future-nullable-field"] is None
    assert out["metadata"]["properties"] == {"owner": None}

    # exhaustive: diff the stripped key-paths against the pinned set
    def paths(node, prefix=""):
        found = set()
        if isinstance(node, dict):
            for k, v in node.items():
                found |= {f"{prefix}{k}"} | paths(v, f"{prefix}{k}.")
        elif isinstance(node, list):
            for i, x in enumerate(node):
                found |= paths(x, f"{prefix}{i}.")
        return found

    stripped = {p.rsplit(".", 1)[-1] for p in paths(payload) - paths(out)}
    assert stripped == SCRUBBED_NULL_KEYS | {"metadata-location"}

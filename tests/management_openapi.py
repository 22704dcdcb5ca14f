"""Management-surface contract, hand-derived by inspection from the
reference's compile-time utoipa document (VERDICT r9 #5: no shipped
JSON exists for the management API — the document is generated at
build time from these Rust sources, so transcription is the strongest
materialization available without compiling the reference):

- routes + statuses: crates/iceberg-catalog/src/api/management/mod.rs
  (ManagementApiDoc paths 22-58; #[utoipa::path] blocks 73-249; axum
  router 258-301; CreateWarehouseResponse IntoResponse = 201 at
  v1/warehouse.rs:115-119; every Result<()> handler responds 200 with
  an empty body — axum's IntoResponse for unit)
- schemas: crates/iceberg-catalog/src/api/management/v1/warehouse.rs
  14-112 (all kebab-case EXCEPT ProjectResponse, which has no
  serde(rename_all) at 70-74 and therefore serializes snake_case
  project_id — a parity quirk this document pins on purpose),
  src/service/storage/mod.rs:18 + :161 (StorageProfile /
  StorageCredential internally tagged `type`, single variant `s3`),
  src/service/storage/s3.rs:66-86 (S3Profile fields) + :428-437
  (S3Credential: nested tag `credential-type`, variant `access-key`),
  src/service/mod.rs:186-191 (WarehouseStatus: active | inactive).

Response schemas are strict (additionalProperties: false): serde
serializes exactly the declared fields, so any extra key our server
emits — a leaked internal pointer like storage-secret-id, a legacy
snake_case row — is a contract violation. Request schemas are tolerant
of unknown keys (serde's default deserialization posture) but strict
about required fields and types.
"""

from __future__ import annotations

from typing import Any

import jsonschema

_UUID = {"type": "string", "minLength": 1}

S3_PROFILE = {
    # s3.rs:66-86 — serde(rename_all = kebab-case); Option fields are
    # optional-and-nullable on requests, omitted-or-present in our
    # responses (the scrub never touches management payloads)
    "type": "object",
    "properties": {
        "type": {"const": "s3"},
        "bucket": {"type": "string"},
        "key-prefix": {"type": ["string", "null"]},
        "assume-role-arn": {"type": ["string", "null"]},
        "endpoint": {"type": ["string", "null"]},
        "region": {"type": "string"},
        "path-style-access": {"type": ["boolean", "null"]},
    },
    "required": ["type", "bucket", "region"],
}

S3_PROFILE_STRICT = {**S3_PROFILE, "additionalProperties": False}

STORAGE_CREDENTIAL = {
    # storage/mod.rs:161 (tag type=s3) wrapping s3.rs:428-437
    # (tag credential-type=access-key): serde internally-tagged enums
    # flatten, so the wire object carries BOTH tags beside the fields
    "type": "object",
    "properties": {
        "type": {"const": "s3"},
        "credential-type": {"const": "access-key"},
        "aws-access-key-id": {"type": "string"},
        "aws-secret-access-key": {"type": "string"},
    },
    "required": ["type", "credential-type", "aws-access-key-id", "aws-secret-access-key"],
}

WAREHOUSE_STATUS = {"enum": ["active", "inactive"]}  # service/mod.rs:186-191

GET_WAREHOUSE_RESPONSE = {
    # warehouse.rs:84-97
    "type": "object",
    "properties": {
        "id": _UUID,
        "name": {"type": "string"},
        "project-id": _UUID,
        "storage-profile": S3_PROFILE_STRICT,
        "status": WAREHOUSE_STATUS,
    },
    "required": ["id", "name", "project-id", "storage-profile", "status"],
    "additionalProperties": False,
}

# (method, path template) -> {"request": schema|None,
#                             "responses": {status: schema|None}}
ROUTES: dict[tuple[str, str], dict[str, Any]] = {
    ("POST", "management/v1/warehouse"): {
        # warehouse.rs:14-26; 201 per IntoResponse (warehouse.rs:115-119)
        "request": {
            "type": "object",
            "properties": {
                "warehouse-name": {"type": "string"},
                "project-id": _UUID,
                "storage-profile": S3_PROFILE,
                "storage-credential": {
                    "anyOf": [STORAGE_CREDENTIAL, {"type": "null"}]
                },
            },
            "required": ["warehouse-name", "project-id", "storage-profile"],
        },
        "responses": {
            201: {
                "type": "object",
                "properties": {"warehouse-id": _UUID},
                "required": ["warehouse-id"],
                "additionalProperties": False,
            }
        },
    },
    ("GET", "management/v1/project"): {
        "request": None,
        "responses": {
            200: {
                "type": "object",
                "properties": {
                    "projects": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            # warehouse.rs:70-74: NO rename_all on
                            # ProjectResponse — snake_case on the wire
                            "properties": {"project_id": _UUID},
                            "required": ["project_id"],
                            "additionalProperties": False,
                        },
                    }
                },
                "required": ["projects"],
                "additionalProperties": False,
            }
        },
    },
    ("GET", "management/v1/warehouse"): {
        # query params (warehouse.rs:50-62): project-id,
        # warehouse-status (repeatable) — validated by the replay test,
        # not a JSON body
        "request": None,
        "responses": {
            200: {
                "type": "object",
                "properties": {
                    "warehouses": {"type": "array", "items": GET_WAREHOUSE_RESPONSE}
                },
                "required": ["warehouses"],
                "additionalProperties": False,
            }
        },
    },
    ("GET", "management/v1/warehouse/{warehouse_id}"): {
        "request": None,
        "responses": {200: GET_WAREHOUSE_RESPONSE},
    },
    ("DELETE", "management/v1/warehouse/{warehouse_id}"): {
        "request": None,
        "responses": {200: None},  # Result<()> -> 200 empty body
    },
    ("POST", "management/v1/warehouse/{warehouse_id}/rename"): {
        "request": {
            "type": "object",
            "properties": {"new-name": {"type": "string"}},
            "required": ["new-name"],
        },
        "responses": {200: None},
    },
    ("POST", "management/v1/warehouse/{warehouse_id}/deactivate"): {
        "request": None,
        "responses": {200: None},
    },
    ("POST", "management/v1/warehouse/{warehouse_id}/activate"): {
        "request": None,
        "responses": {200: None},
    },
    ("POST", "management/v1/warehouse/{warehouse_id}/storage"): {
        # warehouse.rs:35-47
        "request": {
            "type": "object",
            "properties": {
                "storage-profile": S3_PROFILE,
                "storage-credential": {
                    "anyOf": [STORAGE_CREDENTIAL, {"type": "null"}]
                },
            },
            "required": ["storage-profile"],
        },
        "responses": {200: None},
    },
    ("POST", "management/v1/warehouse/{warehouse_id}/storage-credential"): {
        # warehouse.rs:106-112
        "request": {
            "type": "object",
            "properties": {
                "new-storage-credential": {
                    "anyOf": [STORAGE_CREDENTIAL, {"type": "null"}]
                },
            },
        },
        "responses": {200: None},
    },
}

# error envelope: management handlers return the same IcebergErrorResponse
# ErrorModel as the catalog surface (warehouse.rs uses
# iceberg_ext::catalog::rest::ErrorModel)
ERROR_ENVELOPE = {
    "type": "object",
    "properties": {
        "error": {
            "type": "object",
            "properties": {
                "message": {"type": "string"},
                "type": {"type": "string"},
                "code": {"type": "integer", "minimum": 400, "maximum": 600},
            },
            "required": ["message", "type", "code"],
        }
    },
    "required": ["error"],
}


def lookup(method: str, path: str):
    parts = path.strip("/").split("/")
    for (m, template), op in ROUTES.items():
        if m != method:
            continue
        t = template.split("/")
        if len(t) == len(parts) and all(
            a == b or a.startswith("{") for a, b in zip(t, parts)
        ):
            return op
    return None


def validate_request(method: str, path: str, body: Any) -> bool:
    """Validate a replayed request body. Returns True if a schema check
    ran, False for routes with no JSON request body."""
    op = lookup(method, path)
    if op is None:
        raise AssertionError(f"{method} {path}: not a management route")
    schema = op.get("request")
    if schema is None:
        return False
    jsonschema.validate(body, schema)
    return True


def validate_response(method: str, path: str, status: int, payload: Any) -> bool:
    """Validate one management exchange's response. Mirrors the catalog
    validator's posture (tests/openapi_schema.py): documented statuses
    validate against their schema; off-document statuses are bounded to
    the 4xx error-envelope family (management has no 501 stubs), so an
    unexpected 2xx/5xx fails loudly."""
    op = lookup(method, path)
    if op is None:
        raise AssertionError(f"{method} {path}: not a management route")
    responses = op["responses"]
    if status in responses:
        schema = responses[status]
        if schema is None:
            assert payload is None, (
                f"{method} {path} {status}: body present where the contract "
                "defines none (Result<()> serializes to an empty body)"
            )
            return True
        assert payload is not None, f"{method} {path} {status}: missing JSON body"
        jsonschema.validate(payload, schema)
        return True
    assert 400 <= status < 500, (
        f"{method} {path}: status {status} not in the management contract"
    )
    jsonschema.validate(payload, ERROR_ENVELOPE)
    return True

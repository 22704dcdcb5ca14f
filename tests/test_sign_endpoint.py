"""REST /v1/aws/s3/sign endpoint: table resolution, URI validation
against the table location, region check, SigV4 headers (reference
flow: SURVEY.md §3.3 step 1)."""

from __future__ import annotations

import pytest

from iceberg_rest_server_spark.catalog.client import CatalogHTTPError, RestCatalogClient
from iceberg_rest_server_spark.catalog.server import ServerThread

SCHEMA = {
    "type": "struct",
    "fields": [{"id": 1, "name": "x", "required": False, "type": "long"}],
}

PROFILE = {
    "region": "us-east-1",
    "bucket": "bucket-a",
    "access-key-id": "AKIDEXAMPLE",
    "secret-access-key": "secret",
}


@pytest.fixture()
def env():
    with ServerThread() as server:
        c = RestCatalogClient(server.base_url)
        wid = c.create_warehouse("p", "wh", "s3://bucket-a/prefix")
        c._request("POST", f"/management/v1/warehouse/{wid}/storage-profile", PROFILE)
        c.configure("p", "wh")
        c.create_namespace(["ns"])
        out = c.create_table(["ns"], "t", SCHEMA)
        yield c, out["metadata"]["location"]


def _sign(c, body):
    return c._request(
        "POST", f"/catalog/v1/{c.prefix}/namespaces/ns/tables/t/v1/aws/s3/sign", body
    )


def test_sign_valid_request(env):
    c, loc = env
    key = loc[len("s3://bucket-a/"):]
    out = _sign(
        c,
        {
            "method": "PUT",
            "region": "us-east-1",
            "uri": f"https://bucket-a.s3.us-east-1.amazonaws.com/{key}/data/f.parquet",
            "headers": {},
            "amz-date": "20240101T000000Z",
        },
    )
    auth = out["headers"]["Authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20240101/us-east-1/s3/")
    assert out["headers"]["x-amz-content-sha256"] == "UNSIGNED-PAYLOAD"


def test_sign_rejects_uri_outside_table(env):
    c, loc = env
    with pytest.raises(CatalogHTTPError) as e:
        _sign(
            c,
            {
                "method": "GET",
                "region": "us-east-1",
                "uri": "https://bucket-a.s3.us-east-1.amazonaws.com/prefix/other/f.parquet",
                "headers": {},
            },
        )
    assert e.value.code == 403


def test_sign_rejects_wrong_region_and_bucket(env):
    c, loc = env
    key = loc[len("s3://bucket-a/"):]
    with pytest.raises(CatalogHTTPError) as e:
        _sign(
            c,
            {
                "method": "GET",
                "region": "eu-west-1",
                "uri": f"https://bucket-a.s3.us-east-1.amazonaws.com/{key}/f.parquet",
                "headers": {},
            },
        )
    assert e.value.code == 400
    with pytest.raises(CatalogHTTPError) as e:
        _sign(
            c,
            {
                "method": "GET",
                "region": "us-east-1",
                "uri": f"https://bucket-b.s3.us-east-1.amazonaws.com/{key}/f.parquet",
                "headers": {},
            },
        )
    assert e.value.code == 403

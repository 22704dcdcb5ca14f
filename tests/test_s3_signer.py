"""S3 remote-signing tests: AWS's published SigV4 test vector + the
reference's URI-validation matrix shapes (s3_signer.rs:530-757)."""

from __future__ import annotations

import pytest

from iceberg_rest_server_spark.catalog.s3_signer import (
    SigningError,
    parse_s3_uri,
    permission_for_method,
    sign_s3_request,
    sign_v4,
    validate_uri_for_table,
)


def test_sigv4_aws_documented_vector():
    """AWS General Reference 'Signature Version 4 signing process'
    worked example (iam ListUsers, 2015-08-30)."""
    out = sign_v4(
        method="GET",
        uri="https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        headers={"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
        region="us-east-1",
        service="iam",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        amz_date="20150830T123600Z",
        body_sha256="e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
    )
    assert out["Authorization"].endswith(
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )
    assert "SignedHeaders=content-type;host;x-amz-date" in out["Authorization"]


def test_method_permission_mapping():
    assert permission_for_method("GET") == "load"
    assert permission_for_method("HEAD") == "load"
    assert permission_for_method("PUT") == "commit"
    assert permission_for_method("POST") == "commit"
    assert permission_for_method("DELETE") == "commit"
    with pytest.raises(SigningError):
        permission_for_method("PATCH")


def test_parse_virtual_host_and_path_style():
    v = parse_s3_uri("https://my-bucket.s3.eu-central-1.amazonaws.com/ns/tbl/data/f.parquet")
    assert (v.bucket, v.key) == ("my-bucket", "ns/tbl/data/f.parquet")
    p = parse_s3_uri("http://minio:9000/my-bucket/ns/tbl/f.parquet", endpoint_host="minio")
    assert (p.bucket, p.key) == ("my-bucket", "ns/tbl/f.parquet")
    vh = parse_s3_uri("http://my-bucket.minio/ns/f.parquet", endpoint_host="minio")
    assert (vh.bucket, vh.key) == ("my-bucket", "ns/f.parquet")


TABLE_LOC = "s3://bucket-a/prefix/ns-id/tbl-id"


@pytest.mark.parametrize(
    "uri,ok",
    [
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/data/f.parquet", True),
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id", True),
        # different bucket
        ("https://bucket-b.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/f.parquet", False),
        # escapes table prefix
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/other-table/f.parquet", False),
        # shorter path fails (prefix-lookup contract, postgres/table.rs tests)
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id", False),
        # prefix-string trickery: tbl-id-suffix is NOT inside tbl-id/
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id-evil/f.parquet", False),
        # dot-segment traversal: resolves outside the table prefix on any
        # normalizing backend (s3_signer.rs gets this via url::Url WHATWG
        # normalization; we must reject)
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/../../../secret/key", False),
        # percent-encoded dot segments
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/%2e%2e/%2e%2e/secret", False),
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/%2E%2E/escape", False),
        # single-dot segment
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/./f.parquet", False),
        # empty interior segment (collapses under normalization)
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id//f.parquet", False),
        # a *literal* dot-containing filename is fine (only whole segments rejected)
        ("https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/f..parquet", True),
    ],
)
def test_uri_validation_matrix(uri, ok):
    if ok:
        validate_uri_for_table(uri, TABLE_LOC)
    else:
        with pytest.raises(SigningError):
            validate_uri_for_table(uri, TABLE_LOC)


def test_canonical_path_single_encoding():
    """The canonical URI must encode each segment exactly once: a
    pre-encoded path ('%3D') and its literal form ('=') are the same S3
    key, so they must produce the SAME signature — and '%' must never be
    double-encoded to '%25' (reference: partially_decode_uri)."""
    kwargs = dict(
        method="GET",
        headers={},
        region="us-east-1",
        service="s3",
        access_key="AKIDEXAMPLE",
        secret_key="secret",
        amz_date="20240101T000000Z",
    )
    literal = sign_v4(
        uri="https://b.s3.us-east-1.amazonaws.com/t/ts_day=2024-01-01/f.parquet", **kwargs
    )
    encoded = sign_v4(
        uri="https://b.s3.us-east-1.amazonaws.com/t/ts_day%3D2024-01-01/f.parquet", **kwargs
    )
    assert literal["Authorization"] == encoded["Authorization"]


def test_canonical_path_matches_hand_computed():
    """Hand-build the canonical request for a special-char key and check
    sign_v4 produces the identical signature (no hidden normalization)."""
    import hashlib as _hl
    import hmac as _hm

    path = "/t/ts_day%3D2024-01-01/f.parquet"  # encoded exactly once
    amz_date, region, secret = "20240101T000000Z", "us-east-1", "secret"
    canonical_request = "\n".join(
        [
            "GET",
            path,
            "",
            f"host:b.s3.us-east-1.amazonaws.com\nx-amz-content-sha256:UNSIGNED-PAYLOAD\nx-amz-date:{amz_date}\n",
            "host;x-amz-content-sha256;x-amz-date",
            "UNSIGNED-PAYLOAD",
        ]
    )
    scope = f"{amz_date[:8]}/{region}/s3/aws4_request"
    sts = "\n".join(
        ["AWS4-HMAC-SHA256", amz_date, scope, _hl.sha256(canonical_request.encode()).hexdigest()]
    )
    k = f"AWS4{secret}".encode()
    for part in (amz_date[:8], region, "s3", "aws4_request"):
        k = _hm.new(k, part.encode(), _hl.sha256).digest()
    expected = _hm.new(k, sts.encode(), _hl.sha256).hexdigest()
    out = sign_v4(
        method="GET",
        uri="https://b.s3.us-east-1.amazonaws.com/t/ts_day=2024-01-01/f.parquet",
        headers={},
        region=region,
        service="s3",
        access_key="AKIDEXAMPLE",
        secret_key=secret,
        amz_date=amz_date,
    )
    assert out["Authorization"].endswith(f"Signature={expected}")


def test_sign_s3_request_end_to_end():
    out = sign_s3_request(
        method="PUT",
        uri="https://bucket-a.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/data/f.parquet",
        headers={},
        table_location=TABLE_LOC,
        region="us-east-1",
        access_key="AKIDEXAMPLE",
        secret_key="secret",
        amz_date="20240101T000000Z",
    )
    assert out["Authorization"].startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20240101/")
    assert out["x-amz-content-sha256"] == "UNSIGNED-PAYLOAD"
    with pytest.raises(SigningError):
        sign_s3_request(
            method="PUT",
            uri="https://bucket-b.s3.us-east-1.amazonaws.com/prefix/ns-id/tbl-id/f.parquet",
            headers={},
            table_location=TABLE_LOC,
            region="us-east-1",
            access_key="k",
            secret_key="s",
            amz_date="20240101T000000Z",
        )

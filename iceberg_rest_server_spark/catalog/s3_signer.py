"""S3 remote request signing (SURVEY.md §2A#19; reference:
`catalog/s3_signer.rs:38-173` + validation matrix tests `:530-757`).

The reference signs engine S3 requests server-side so executors never
hold credentials: it maps the HTTP method to a required permission,
resolves the table from the request URI by location-prefix, validates
the URI against the table location (both virtual-host and path style),
and re-signs with AWS Signature V4. All of that logic is pure
computation — implemented here with stdlib hmac/hashlib and verified
against AWS's published SigV4 test vector.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse
from dataclasses import dataclass

# method → required table permission (s3_signer.rs:22-23,322-347)
READ_METHODS = {"GET", "HEAD"}
WRITE_METHODS = {"PUT", "POST", "DELETE"}


class SigningError(Exception):
    pass


def permission_for_method(method: str) -> str:
    m = method.upper()
    if m in READ_METHODS:
        return "load"
    if m in WRITE_METHODS:
        return "commit"
    raise SigningError(f"unsupported method {method!r}")


@dataclass(frozen=True)
class S3Location:
    bucket: str
    key: str


def parse_s3_uri(uri: str, endpoint_host: str | None = None) -> S3Location:
    """Parse both addressing styles (s3_signer.rs:352-493):

    - virtual-host: https://{bucket}.s3.{region}.amazonaws.com/{key}
      (or {bucket}.{custom-endpoint-host}/{key})
    - path-style:   https://{host}/{bucket}/{key}
    """
    parsed = urllib.parse.urlparse(uri)
    host = parsed.netloc.split(":")[0]
    path = parsed.path.lstrip("/")
    if endpoint_host and host == endpoint_host:
        # exact endpoint host ⇒ path style
        bucket, _, key = path.partition("/")
        if not bucket:
            raise SigningError(f"path-style uri missing bucket: {uri}")
        return S3Location(bucket, key)
    labels = host.split(".")
    if endpoint_host and host.endswith("." + endpoint_host):
        return S3Location(host[: -(len(endpoint_host) + 1)], path)
    if len(labels) >= 4 and labels[1].startswith("s3"):
        # bucket.s3[.region].amazonaws.com
        return S3Location(labels[0], path)
    # fallback: path style on an unknown host
    bucket, _, key = path.partition("/")
    if not bucket:
        raise SigningError(f"cannot parse s3 uri: {uri}")
    return S3Location(bucket, key)


def validate_uri_for_table(
    uri: str,
    table_location: str,
    endpoint_host: str | None = None,
) -> None:
    """The signed request must stay inside the table location
    (s3_signer.rs:352-493: bucket must match, key must be within the
    table's key prefix — 'shorter path fails', postgres/table.rs tests)."""
    loc = urllib.parse.urlparse(table_location)
    if loc.scheme not in ("s3", "s3a"):
        raise SigningError(f"table location is not s3: {table_location}")
    table_bucket = loc.netloc
    table_key = loc.path.lstrip("/")
    req = parse_s3_uri(uri, endpoint_host)
    if req.bucket != table_bucket:
        raise SigningError(
            f"bucket {req.bucket!r} does not match table bucket {table_bucket!r}"
        )
    req_key = urllib.parse.unquote(req.key)
    # Reject dot segments outright (s3_signer.rs relies on url::Url's
    # WHATWG normalization resolving them *before* the prefix check; we
    # must not sign a key that a normalizing backend would resolve to a
    # path outside the table prefix). '%2e%2e' arrives here already
    # unquoted, so this covers the encoded forms too. Empty interior
    # segments ('a//b') are rejected for the same reason — normalizers
    # collapse them.
    segments = req_key.split("/")
    if any(s in (".", "..") for s in segments) or "" in segments[:-1]:
        raise SigningError(f"key {req_key!r} contains dot or empty path segments")
    if not (req_key == table_key or req_key.startswith(table_key.rstrip("/") + "/")):
        raise SigningError(
            f"key {req_key!r} escapes table location {table_key!r}"
        )


# ---------------------------------------------------------------- SigV4

# Only these headers participate in signing (s3_signer.rs:25-32 signs a
# fixed small set; unsigned headers pass through untouched).
SIGNED_HEADER_ALLOWLIST = {
    "host",
    "content-length",
    "content-md5",
    "expect",
    "x-amz-content-sha256",
    "x-amz-date",
}


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _canonical_s3_path(path: str) -> str:
    """Canonical URI for service=s3: decode each path segment, then
    encode exactly once with the SigV4 unreserved set (A-Za-z0-9-._~).

    Mirrors the reference's partially_decode_uri (s3_signer.rs): a path
    that arrives already percent-encoded ('ts_day%3D2024-01-01') must
    not be double-encoded ('%'→'%25'), and a literal '=' must be encoded
    exactly once — both forms canonicalize to the same bytes S3 computes
    when it verifies the signature. S3 paths are never dot-normalized.
    """
    return "/".join(
        urllib.parse.quote(urllib.parse.unquote(seg), safe="")
        for seg in (path or "/").split("/")
    )


def sign_v4(
    method: str,
    uri: str,
    headers: dict[str, str],
    region: str,
    service: str,
    access_key: str,
    secret_key: str,
    amz_date: str,
    body_sha256: str = "UNSIGNED-PAYLOAD",
    session_token: str | None = None,
) -> dict[str, str]:
    """AWS Signature Version 4 (public spec). Returns the headers to add
    (Authorization, x-amz-date, x-amz-content-sha256[, token])."""
    parsed = urllib.parse.urlparse(uri)
    if service == "s3":
        canonical_uri = _canonical_s3_path(parsed.path)
    else:
        canonical_uri = urllib.parse.quote(parsed.path or "/", safe="/")
    query_pairs = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
    canonical_query = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(query_pairs)
    )
    all_headers = {k.lower().strip(): v.strip() for k, v in headers.items()}
    all_headers.setdefault("host", parsed.netloc)
    all_headers["x-amz-date"] = amz_date
    if service == "s3":
        all_headers["x-amz-content-sha256"] = body_sha256
    if session_token:
        all_headers["x-amz-security-token"] = session_token
    if service == "s3":
        # the s3 path signs only the fixed small header set the reference
        # signs (s3_signer.rs:25-32); everything else passes unsigned
        signed = sorted(
            k
            for k in all_headers
            if k in SIGNED_HEADER_ALLOWLIST or k == "x-amz-security-token"
        )
    else:
        signed = sorted(all_headers)
    canonical_headers = "".join(f"{k}:{all_headers[k]}\n" for k in signed)
    signed_headers = ";".join(signed)
    canonical_request = "\n".join(
        [
            method.upper(),
            canonical_uri,
            canonical_query,
            canonical_headers,
            signed_headers,
            body_sha256,
        ]
    )
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    k_date = _hmac(f"AWS4{secret_key}".encode(), date)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    k_signing = _hmac(k_service, "aws4_request")
    signature = hmac.new(k_signing, string_to_sign.encode(), hashlib.sha256).hexdigest()
    out = {
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        ),
        "x-amz-date": amz_date,
    }
    if service == "s3":
        out["x-amz-content-sha256"] = body_sha256
    if session_token:
        out["x-amz-security-token"] = session_token
    return out


def sign_s3_request(
    method: str,
    uri: str,
    headers: dict[str, str],
    table_location: str,
    region: str,
    access_key: str,
    secret_key: str,
    amz_date: str,
    endpoint_host: str | None = None,
    body_sha256: str = "UNSIGNED-PAYLOAD",
) -> dict[str, str]:
    """Full remote-signing flow: permission mapping + URI validation +
    SigV4 — the engine calls this with its intended S3 request and gets
    back the headers to attach."""
    permission_for_method(method)  # raises on unsupported methods
    validate_uri_for_table(uri, table_location, endpoint_host)
    return sign_v4(
        method, uri, headers, region, "s3", access_key, secret_key, amz_date, body_sha256
    )

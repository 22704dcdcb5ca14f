"""OIDC bearer-token middleware: RS256 JWT verification against a JWKS
(reference service/token_verification.rs:46-200). The test side carries
a minimal RSA keypair generator + signer (Miller-Rabin primes, PKCS#1
v1.5) so the server-side verify path is exercised against real
signatures without any crypto dependency."""

from __future__ import annotations

import base64
import hashlib
import json
import random
import time

import pytest

from iceberg_rest_server_spark.catalog.auth import TokenVerifier, UnauthorizedError
from iceberg_rest_server_spark.catalog.client import CatalogHTTPError, RestCatalogClient
from iceberg_rest_server_spark.catalog.server import ServerThread

# ------------------------------------------------------------ test-side RSA


def _is_probable_prime(n: int, rounds: int = 20) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rng = random.Random(1234)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng: random.Random) -> int:
    while True:
        cand = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(cand):
            return cand


def _gen_keypair(bits: int = 1024, seed: int = 7):
    rng = random.Random(seed)
    e = 65537
    while True:
        p = _gen_prime(bits // 2, rng)
        q = _gen_prime(bits // 2, rng)
        if p == q:
            continue
        phi = (p - 1) * (q - 1)
        if phi % e:
            d = pow(e, -1, phi)
            return p * q, e, d


_SHA256_DIGEST_INFO = bytes.fromhex("3031300d060960864801650304020105000420")


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _sign(n: int, d: int, message: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    t = _SHA256_DIGEST_INFO + hashlib.sha256(message).digest()
    em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    return pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")


N, E, D = _gen_keypair()
ISSUER = "https://issuer.test/realm"
JWKS = {
    "keys": [
        {
            "kty": "RSA",
            "kid": "key-1",
            "alg": "RS256",
            "n": _b64url(N.to_bytes((N.bit_length() + 7) // 8, "big")),
            "e": _b64url(E.to_bytes(3, "big")),
        }
    ]
}


def _jwt(claims: dict, kid: str | None = "key-1", key=(N, D), header_extra=None) -> str:
    header = {"alg": "RS256", "typ": "JWT"}
    if kid is not None:
        header["kid"] = kid
    header.update(header_extra or {})
    h = _b64url(json.dumps(header).encode())
    c = _b64url(json.dumps(claims).encode())
    sig = _sign(key[0], key[1], f"{h}.{c}".encode())
    return f"{h}.{c}.{_b64url(sig)}"


def _claims(**over) -> dict:
    base = {"iss": ISSUER, "sub": "svc-1", "aud": "other-app", "exp": time.time() + 600}
    base.update(over)
    return base


# ------------------------------------------------------------------ tests


def test_valid_token_roundtrip():
    v = TokenVerifier(JWKS, ISSUER)
    claims = v.verify(_jwt(_claims()))
    assert claims["sub"] == "svc-1"


def test_aud_not_validated_but_issuer_and_exp_are():
    """token_verification.rs:197-199: validate_aud = false; issuer and
    exp are enforced."""
    v = TokenVerifier(JWKS, ISSUER)
    v.verify(_jwt(_claims(aud=["completely", "unrelated"])))  # aud ignored
    with pytest.raises(UnauthorizedError):
        v.verify(_jwt(_claims(iss="https://evil.test")))
    with pytest.raises(UnauthorizedError):
        v.verify(_jwt(_claims(exp=time.time() - 10)))
    with pytest.raises(UnauthorizedError):
        v.verify(_jwt(_claims(nbf=time.time() + 600)))


def test_kid_requirements():
    """:129-157 — missing kid and unknown kid are distinct 401s."""
    v = TokenVerifier(JWKS, ISSUER)
    with pytest.raises(UnauthorizedError, match="key id"):
        v.verify(_jwt(_claims(), kid=None))
    with pytest.raises(UnauthorizedError, match="Unknown kid"):
        v.verify(_jwt(_claims(), kid="key-2"))


def test_tampered_signature_and_payload_rejected():
    v = TokenVerifier(JWKS, ISSUER)
    token = _jwt(_claims())
    h, c, s = token.split(".")
    with pytest.raises(UnauthorizedError):
        v.verify(f"{h}.{c}.{s[:-2]}AA")  # corrupt signature
    forged = _b64url(json.dumps(_claims(sub="admin")).encode())
    with pytest.raises(UnauthorizedError):
        v.verify(f"{h}.{forged}.{s}")  # resigned payload without key
    # signature from a DIFFERENT key under the same kid
    n2, e2, d2 = _gen_keypair(seed=99)
    with pytest.raises(UnauthorizedError):
        v.verify(_jwt(_claims(), key=(n2, d2)))


def test_server_middleware_enforces_auth():
    """auth_middleware_fn parity: no header → 401 'Missing authorization
    header'; bad token → 401; good token → normal routing. Servers
    without a verifier stay open (middleware is optional, like the
    reference's None provider)."""
    verifier = TokenVerifier(JWKS, ISSUER)
    with ServerThread(verifier=verifier) as server:
        c = RestCatalogClient(server.base_url)
        with pytest.raises(CatalogHTTPError) as ei:
            c.create_warehouse("p", "wh", "s3://bucket-a/prefix")
        assert ei.value.code == 401
        assert ei.value.error_type == "UnauthorizedError"

        import urllib.request
        import json as _json

        req = urllib.request.Request(
            f"{server.base_url}/management/v1/warehouse",
            data=_json.dumps(
                {"project-id": "p", "warehouse-name": "wh", "base-location": "s3://b/p"}
            ).encode(),
            method="POST",
        )
        # invalid token → 401
        req.add_header("Authorization", "Bearer not.a.jwt")
        req.add_header("Content-Type", "application/json")
        with pytest.raises(urllib.error.HTTPError) as he:
            urllib.request.urlopen(req)
        assert he.value.code == 401
        # valid token → 201
        req2 = urllib.request.Request(
            f"{server.base_url}/management/v1/warehouse",
            data=_json.dumps(
                {"project-id": "p", "warehouse-name": "wh", "base-location": "s3://b/p"}
            ).encode(),
            method="POST",
        )
        req2.add_header("Authorization", f"Bearer {_jwt(_claims())}")
        req2.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(req2) as resp:
            assert resp.status == 201

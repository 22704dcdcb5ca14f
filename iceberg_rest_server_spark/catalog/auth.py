"""Optional OIDC bearer-token verification for the REST catalog.

Mirrors the reference's auth middleware
(`crates/iceberg-catalog/src/service/token_verification.rs:46-200`):

  - requests without an ``Authorization: Bearer`` header → 401
    ``UnauthorizedError``;
  - the JWT header must carry a ``kid`` (":133-157 'Token header does
    not contain a key id.'"), resolved against a JWKS key set — unknown
    kid → 401;
  - RS256 signature verification against the JWK's (n, e) components
    (":159-176 from_rsa_components");
  - issuer must match; ``aud`` is deliberately NOT validated
    (":197-199 validate_aud = false — TODO multi-tenant"), ``exp`` is.

The reference discovers issuer + JWKS via the network
(`/.well-known/openid-configuration`); this container has no egress, so
the verifier takes the JWKS document and issuer directly — the same
deployment-config posture, one fetch earlier.

RS256 verification is pure stdlib: an RSA signature check is one modular
exponentiation plus an EMSA-PKCS1-v1_5 padding comparison — no private
key material ever touches this code path.
"""

from __future__ import annotations

import base64
import binascii
import json
import time


class UnauthorizedError(Exception):
    """401 with envelope type UnauthorizedError (token_verification.rs:64-71)."""

    error_type = "UnauthorizedError"


def _b64url_decode(data: str) -> bytes:
    pad = "=" * (-len(data) % 4)
    try:
        return base64.urlsafe_b64decode(data + pad)
    except (binascii.Error, ValueError) as e:
        raise UnauthorizedError("Failed to decode auth token header.") from e


def _b64url_to_int(data: str) -> int:
    return int.from_bytes(_b64url_decode(data), "big")


# DER DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1)
_SHA256_DIGEST_INFO = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)


def _rsassa_pkcs1_v15_verify(n: int, e: int, message: bytes, signature: bytes) -> bool:
    """RFC 8017 §8.2.2 with SHA-256: em = sig^e mod n must equal
    0x00 0x01 FF..FF 0x00 || DigestInfo || SHA-256(message)."""
    import hashlib

    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    s = int.from_bytes(signature, "big")
    if s >= n:
        return False
    em = pow(s, e, n).to_bytes(k, "big")
    t = _SHA256_DIGEST_INFO + hashlib.sha256(message).digest()
    if k < len(t) + 11:
        return False
    expected = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    # constant-time-ish compare (hmac.compare_digest over equal lengths)
    import hmac

    return hmac.compare_digest(em, expected)


class TokenVerifier:
    """Verify RS256 JWTs against a JWKS document.

    jwks: {"keys": [{"kty": "RSA", "kid": ..., "n": ..., "e": ...}, ...]}
    """

    def __init__(self, jwks: dict, issuer: str):
        self._keys = {
            k["kid"]: k
            for k in jwks.get("keys", [])
            if k.get("kty") == "RSA" and "kid" in k
        }
        self._issuer = issuer

    def verify(self, token: str) -> dict:
        parts = token.split(".")
        if len(parts) != 3:
            raise UnauthorizedError("Failed to decode auth token header.")
        header = self._json(parts[0], "Failed to decode auth token header.")
        kid = header.get("kid")
        if not kid:
            # token_verification.rs:152-157
            raise UnauthorizedError("Token header does not contain a key id.")
        key = self._keys.get(kid)
        if key is None:
            raise UnauthorizedError("Unknown kid")  # :129-134
        alg = key.get("alg") or header.get("alg")  # :183-195 key alg, header fallback
        if alg != "RS256":
            raise UnauthorizedError(f"Unsupported algorithm {alg!r}")
        signing_input = f"{parts[0]}.{parts[1]}".encode()
        ok = _rsassa_pkcs1_v15_verify(
            _b64url_to_int(key["n"]),
            _b64url_to_int(key["e"]),
            signing_input,
            _b64url_decode(parts[2]),
        )
        if not ok:
            raise UnauthorizedError("Failed to decode token.")
        claims = self._json(parts[1], "Failed to decode token.")
        now = time.time()
        exp = claims.get("exp")
        if exp is None or now >= float(exp):
            raise UnauthorizedError("Failed to decode token.")  # expired
        if claims.get("nbf") is not None and now < float(claims["nbf"]):
            raise UnauthorizedError("Failed to decode token.")
        if claims.get("iss") != self._issuer:
            raise UnauthorizedError("Failed to decode token.")
        # aud intentionally unvalidated (token_verification.rs:197-199)
        return claims

    @staticmethod
    def _json(segment: str, msg: str) -> dict:
        try:
            return json.loads(_b64url_decode(segment))
        except (json.JSONDecodeError, UnicodeDecodeError) as e:
            raise UnauthorizedError(msg) from e

"""Secret encryption at rest (reference: `postgres/secrets.rs:60-120`,
which pgp_sym_encrypts credential JSON with a server-side key; default
key parity with `config.rs` pg_encryption_key).

Stdlib-only authenticated encryption: SHA-256 counter-mode keystream
(encrypt) + HMAC-SHA256 tag (encrypt-then-MAC), with independent keys
derived from the master key. Not a substitute for AES-GCM in a real
deployment, but real encryption — ciphertext is key-dependent and
tamper-evident, and credentials are unreadable in the metastore file.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os

# parity with the reference's loudly-unsafe default (config.rs):
# deployments must override via CATALOG_ENCRYPTION_KEY
DEFAULT_KEY = "<This is unsafe, please set a proper key>"


class SecretDecryptError(Exception):
    pass


def _keystream(key: bytes, nonce: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(key + nonce + counter.to_bytes(8, "big")).digest()
        counter += 1
    return bytes(out[:n])


class SecretCipher:
    def __init__(self, key: str | None = None):
        key = key or os.environ.get("CATALOG_ENCRYPTION_KEY") or DEFAULT_KEY
        master = hashlib.sha256(key.encode()).digest()
        self._enc_key = hashlib.sha256(master + b"enc").digest()
        self._mac_key = hashlib.sha256(master + b"mac").digest()

    def encrypt(self, payload: dict) -> str:
        pt = json.dumps(payload, sort_keys=True).encode()
        nonce = os.urandom(16)
        ct = bytes(a ^ b for a, b in zip(pt, _keystream(self._enc_key, nonce, len(pt))))
        tag = hmac.new(self._mac_key, nonce + ct, hashlib.sha256).digest()
        return "enc:v1:" + ":".join(
            base64.b64encode(x).decode() for x in (nonce, ct, tag)
        )

    def decrypt(self, token: str) -> dict:
        try:
            scheme, version, *rest = token.split(":")
            if (scheme, version) != ("enc", "v1") or len(rest) != 3:
                raise ValueError("bad token shape")
            nonce, ct, tag = (base64.b64decode(x) for x in rest)
        except (ValueError, TypeError) as e:
            raise SecretDecryptError(f"malformed secret token: {e}") from e
        expect = hmac.new(self._mac_key, nonce + ct, hashlib.sha256).digest()
        if not hmac.compare_digest(tag, expect):
            raise SecretDecryptError("secret authentication failed (wrong key or tampered)")
        pt = bytes(a ^ b for a, b in zip(ct, _keystream(self._enc_key, nonce, len(ct))))
        return json.loads(pt)

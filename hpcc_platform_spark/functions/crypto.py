"""Std.Crypto / cryptolib analogue: hashing, HMAC, and (gated) symmetric
encryption over DataFrame columns.

Reference: plugins/cryptolib/cryptolib.hpp:49-61 — clSupportedHashAlgorithms
/ clHash (SHA1/SHA224/SHA256/SHA384/SHA512, cryptolib.cpp:292), clHmac-less
(HMAC arrives via Std.Crypto wrappers), clSymmetricEncrypt/Decrypt
(OpenSSL EVP AES). The hash path stays fully JVM-side (whole-stage
codegen, no Python in the hot loop); digests are returned as lowercase hex
strings — the natural join/compare representation on an engine whose
binary columns don't hash-partition as cheaply as strings.

HMAC has no Spark builtin, so it runs as an Arrow-batched pandas UDF over
stdlib ``hmac``/``hashlib`` — correct everywhere, vectorized transfer,
per-batch Python cost only. Symmetric ciphers need a real crypto
dependency (AES is deliberately not re-implemented); the entry point
raises with a clear message when the optional ``cryptography`` package is
absent rather than shipping a toy cipher.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SHA2_BITS = {"sha224": 224, "sha256": 256, "sha384": 384, "sha512": 512}

#: clSupportedHashAlgorithms (cryptolib.cpp:292) + MD5 (jhash parity).
SUPPORTED_HASH_ALGORITHMS = ("sha1", "sha224", "sha256", "sha384", "sha512", "md5")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cl_hash(col: Column | str, algorithm: str = "sha256") -> Column:
    """clHash (cryptolib.cpp:304): digest of a string/binary column under
    the named algorithm, as lowercase hex. Pure JVM expressions."""
    algo = algorithm.lower().replace("-", "")
    if algo == "sha1":
        return F.sha1(_c(col))
    if algo in _SHA2_BITS:
        return F.sha2(_c(col), _SHA2_BITS[algo])
    if algo == "md5":
        return F.md5(_c(col))
    raise ValueError(
        f"unsupported hash algorithm {algorithm!r}; "
        f"supported: {SUPPORTED_HASH_ALGORITHMS}"
    )


def cl_hmac(col: Column | str, key: str | bytes, algorithm: str = "sha256") -> Column:
    """HMAC(key, message) as lowercase hex (Std.Crypto MAC surface).

    No JVM builtin exists, so this is the designated Arrow-batched Python
    path: stdlib ``hmac`` over pandas batches. Key and algorithm are
    plan-time constants (closure), so the UDF is a pure map — scale cost
    is one Python roundtrip per batch, no shuffle.
    """
    algo = algorithm.lower().replace("-", "")
    if algo not in SUPPORTED_HASH_ALGORITHMS:
        raise ValueError(f"unsupported HMAC algorithm {algorithm!r}")
    kb = key.encode() if isinstance(key, str) else bytes(key)
    digestmod = getattr(hashlib, algo)

    @pandas_udf("string")
    def _mac(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else _hmac.new(
                kb, v if isinstance(v, bytes) else str(v).encode(), digestmod
            ).hexdigest()
        )

    return _mac(_c(col))


def symmetric_encrypt(
    col: Column | str, key: bytes, algorithm: str = "aes-256-gcm"
) -> Column:
    """clSymmetricEncrypt (cryptolib.hpp:57) — requires the optional
    ``cryptography`` package (AES is not re-implemented by hand; a wrong
    cipher is worse than a missing one)."""
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "symmetric_encrypt needs the 'cryptography' package "
            "(reference uses OpenSSL EVP); not installed in this environment"
        ) from e
    if algorithm.lower() != "aes-256-gcm":
        raise ValueError("only aes-256-gcm is wired")
    if len(key) != 32:
        raise ValueError("aes-256-gcm needs a 32-byte key")

    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        import os as _os

        # import inside the batch fn: the Rust-backed class must resolve
        # on the executor, not travel through cloudpickle
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM as _A

        aead = _A(key)

        def one(v):
            if v is None:
                return None
            nonce = _os.urandom(12)
            data = v if isinstance(v, bytes) else str(v).encode()
            return nonce + aead.encrypt(nonce, data, None)

        return s.map(one)

    return _enc(_c(col))


def symmetric_decrypt(
    col: Column | str, key: bytes, algorithm: str = "aes-256-gcm"
) -> Column:
    """clSymmetricDecrypt (cryptolib.hpp:58): inverse of
    ``symmetric_encrypt`` — expects nonce(12) || ciphertext+tag as
    produced there. Wrong-key / corrupted input yields NULL per row
    (decryption failure degrades the row, not the batch — same contract
    as the multimodal decoders)."""
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "symmetric_decrypt needs the 'cryptography' package "
            "(reference uses OpenSSL EVP); not installed in this environment"
        ) from e
    if algorithm.lower() != "aes-256-gcm":
        raise ValueError("only aes-256-gcm is wired")
    if len(key) != 32:
        raise ValueError("aes-256-gcm needs a 32-byte key")

    @pandas_udf("binary")
    def _dec(s: pd.Series) -> pd.Series:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM as _A

        aead = _A(key)

        def one(v):
            if v is None or len(v) < 13:
                return None
            try:
                return aead.decrypt(bytes(v[:12]), bytes(v[12:]), None)
            except Exception:
                return None

        return s.map(one)

    return _dec(_c(col))

"""Std.BLAS (plugins/eclblas) and Std.Crypto (plugins/cryptolib) analogues:
kernels checked against numpy / published test vectors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hpcc_platform_spark.operators.blas import (
    dasum,
    daxpy,
    dgemm,
    dscal,
    dsyrk,
    extract_tri,
)


def _to_df(spark, m: np.ndarray, drop_zeros: bool = False):
    rows = [
        (i, j, float(m[i, j]))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
        if not (drop_zeros and m[i, j] == 0.0)
    ]
    return spark.createDataFrame(rows, "i long, j long, v double")


def _to_np(df, shape):
    out = np.zeros(shape)
    for r in df.collect():
        out[r.i, r.j] = r.v
    return out


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_dgemm_matches_numpy_all_transpose_forms(spark, rng):
    a = rng.integers(-4, 5, (5, 3)).astype(float)
    b = rng.integers(-4, 5, (3, 4)).astype(float)
    got = _to_np(dgemm(_to_df(spark, a), _to_df(spark, b)), (5, 4))
    np.testing.assert_allclose(got, a @ b)
    # transposed operands (the README's BLAS.dgemm(FALSE, TRUE, ...) forms)
    got = _to_np(
        dgemm(_to_df(spark, a.T), _to_df(spark, b), trans_a=True), (5, 4)
    )
    np.testing.assert_allclose(got, a @ b)
    got = _to_np(
        dgemm(_to_df(spark, a), _to_df(spark, b.T), trans_b=True, alpha=2.5),
        (5, 4),
    )
    np.testing.assert_allclose(got, 2.5 * (a @ b))


def test_dgemm_beta_accumulate(spark, rng):
    a = rng.integers(-3, 4, (3, 3)).astype(float)
    b = rng.integers(-3, 4, (3, 3)).astype(float)
    c = rng.integers(-3, 4, (3, 3)).astype(float)
    got = _to_np(
        dgemm(_to_df(spark, a), _to_df(spark, b), alpha=1.0,
              c=_to_df(spark, c), beta=5.0),
        (3, 3),
    )
    np.testing.assert_allclose(got, a @ b + 5.0 * c)


def test_dsyrk_upper_triangle(spark, rng):
    a = rng.integers(-3, 4, (4, 6)).astype(float)
    g = a @ a.T
    got = dsyrk(_to_df(spark, a), upper=True)
    for r in got.collect():
        assert r.i <= r.j
        assert r.v == pytest.approx(g[r.i, r.j])
    # lower form mirrors
    low = dsyrk(_to_df(spark, a), upper=False)
    assert all(r.i >= r.j for r in low.collect())


def test_daxpy_implicit_zeros_and_dscal_dasum(spark, rng):
    x = rng.integers(-3, 4, (4, 4)).astype(float)
    y = rng.integers(-3, 4, (4, 4)).astype(float)
    # sparse COO: zero entries dropped on both sides, still correct
    got = _to_np(
        daxpy(3.0, _to_df(spark, x, drop_zeros=True),
              _to_df(spark, y, drop_zeros=True)),
        (4, 4),
    )
    np.testing.assert_allclose(got, 3.0 * x + y)
    got = _to_np(dscal(-2.0, _to_df(spark, x)), (4, 4))
    np.testing.assert_allclose(got, -2.0 * x)
    asum = dasum(_to_df(spark, x)).collect()[0].asum
    assert asum == pytest.approx(np.abs(x).sum())


def test_extract_tri_unit_diagonal(spark, rng):
    x = rng.integers(1, 5, (4, 4)).astype(float)
    up = _to_np(extract_tri(_to_df(spark, x), upper=True, unit_diagonal=True), (4, 4))
    expect = np.triu(x)
    np.fill_diagonal(expect, 1.0)
    np.testing.assert_allclose(up, expect)


def test_blas_rejects_bad_frame(spark):
    df = spark.createDataFrame([(1, 2.0)], "i long, v double")
    with pytest.raises(ValueError, match="missing columns"):
        dasum(df)


# --- crypto ---

# NIST FIPS 180-2 'abc' vectors (also cryptolib.cpp clHash algorithms)
_ABC_DIGESTS = {
    "sha1": "a9993e364706816aba3e25717850c26c9cd0d89d",
    "sha224": "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7",
    "sha256": "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
    "sha384": (
        "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed"
        "8086072ba1e7cc2358baeca134c825a7"
    ),
    "sha512": (
        "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a"
        "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"
    ),
    "md5": "900150983cd24fb0d6963f7d28e17f72",
}


def test_cl_hash_nist_vectors(spark):
    from hpcc_platform_spark.functions.crypto import cl_hash

    df = spark.createDataFrame([("abc",)], "s string")
    for algo, want in _ABC_DIGESTS.items():
        got = df.select(cl_hash("s", algo).alias("h")).collect()[0].h
        assert got == want, algo


def test_cl_hash_rejects_unknown(spark):
    from hpcc_platform_spark.functions.crypto import cl_hash

    with pytest.raises(ValueError, match="unsupported"):
        cl_hash("s", "sha3-999")


def test_cl_hmac_rfc4231_vector(spark):
    """RFC 4231 test case 2: key 'Jefe', data 'what do ya want for
    nothing?'."""
    from hpcc_platform_spark.functions.crypto import cl_hmac

    df = spark.createDataFrame([("what do ya want for nothing?",)], "s string")
    got = df.select(cl_hmac("s", "Jefe", "sha256").alias("m")).collect()[0].m
    assert got == (
        "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
    )
    # NULLs pass through
    df2 = spark.createDataFrame([(None,)], "s string")
    assert df2.select(cl_hmac("s", "k").alias("m")).collect()[0].m is None


def test_symmetric_encrypt_roundtrip_or_gated(spark):
    """clSymmetricEncrypt/Decrypt (cryptolib.hpp:57-58): AES-256-GCM
    roundtrip when the optional dependency is present; a loud refusal
    (AES is never hand-rolled) when it is not."""
    from hpcc_platform_spark.functions.crypto import (
        symmetric_decrypt,
        symmetric_encrypt,
    )

    key = bytes(range(32))
    try:
        import cryptography  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="cryptography"):
            symmetric_encrypt("s", key)
        return
    df = spark.createDataFrame(
        [(1, "attack at dawn"), (2, ""), (3, None)], "id int, s string"
    )
    out = df.select(
        "id", "s",
        symmetric_decrypt(
            symmetric_encrypt("s", key), key
        ).cast("string").alias("back"),
    ).orderBy("id").collect()
    assert out[0].back == "attack at dawn"
    assert out[1].back == ""
    assert out[2].back is None
    # wrong key degrades to NULL per row, no batch failure
    bad = df.select(
        symmetric_decrypt(symmetric_encrypt("s", key), b"x" * 32).alias("b")
    ).collect()
    assert all(r.b is None for r in bad)

"""Std.BLAS / eclblas analogue: distributed dense-matrix algebra over
coordinate-form DataFrames.

Reference: plugins/eclblas/ (dgemm.cpp:25 cblas_dgemm, daxpy.cpp, dasum.cpp,
dscal.cpp, dsyrk.cpp, extract_tri.cpp) — the ECL Std.BLAS module operates on
``matrix_t`` (a SET OF REAL8 holding one column-major block per node). That
whole-matrix-in-one-value shape caps matrices at single-node memory; the
Spark-native representation is COO (coordinate) form — one row per non-zero
``(i, j, v)`` with 0-based BIGINT indices — which shards arbitrarily, skips
zeros for free, and turns every BLAS kernel into joins/aggregations Catalyst
can plan:

- multiply joins on the contracted dimension and aggregates partial
  products (the shuffle keys are exactly the dimensions a SUMMA/2.5D
  distribution would block on at cluster scale);
- element-wise ops are key joins;
- reductions are plain aggregates.

Triangular solves / factorizations (dtrsm.cpp, dpotf2.cpp, dgetf2.cpp) are
inherently sequential over block pivots; they belong to a driver-side loop
over blocks (see operators/loop.py GRAPH discipline) and are out of scope
here — the data-parallel kernels below are the ones that matter at 100 TB.

Frames use columns ``(i, j, v)``; helpers validate eagerly so shape bugs
surface at build time, not mid-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COLS = ("i", "j", "v")


def _check(m: DataFrame, name: str) -> DataFrame:
    missing = [c for c in COLS if c not in m.columns]
    if missing:
        raise ValueError(f"matrix {name} missing columns {missing}; need {COLS}")
    return m.select(*COLS)


def _t(m: DataFrame) -> DataFrame:
    """Transpose — free in COO form (column swap, no shuffle)."""
    return m.select(F.col("j").alias("i"), F.col("i").alias("j"), "v")


def dgemm(
    a: DataFrame,
    b: DataFrame,
    trans_a: bool = False,
    trans_b: bool = False,
    alpha: float = 1.0,
    c: DataFrame | None = None,
    beta: float = 0.0,
) -> DataFrame:
    """C = alpha * op(A) @ op(B) [+ beta * C] (dgemm.cpp:25).

    One equi-join shuffle on the contracted dimension + one (i, j)
    aggregation shuffle — the minimal data movement for distributed
    matmul; AQE picks broadcast automatically when one operand is small
    (the vector/thin-matrix cases Std.BLAS examples use)."""
    a = _t(_check(a, "A")) if trans_a else _check(a, "A")
    b = _t(_check(b, "B")) if trans_b else _check(b, "B")
    lhs = a.select(F.col("i").alias("__ai__"), F.col("j").alias("__k__"),
                  F.col("v").alias("__av__"))
    rhs = b.select(F.col("i").alias("__k__"), F.col("j").alias("__bj__"),
                  F.col("v").alias("__bv__"))
    prod = (
        lhs.join(rhs, "__k__")
        .groupBy(F.col("__ai__").alias("i"), F.col("__bj__").alias("j"))
        .agg((F.lit(alpha) * F.sum(F.col("__av__") * F.col("__bv__"))).alias("v"))
    )
    if c is None or beta == 0.0:
        return prod
    scaled_c = _check(c, "C").withColumn("v", F.col("v") * F.lit(beta))
    return (
        prod.unionByName(scaled_c)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )


def dsyrk(
    a: DataFrame, alpha: float = 1.0, trans: bool = False, upper: bool = True
) -> DataFrame:
    """C = alpha * A @ A' (or A' @ A when ``trans``), keeping one triangle
    (dsyrk.cpp): the symmetric rank-k update — covariance/Gram-matrix
    kernel. Computes only i <= j (or >=), halving the output shuffle."""
    g = dgemm(a, a, trans_a=trans, trans_b=not trans, alpha=alpha)
    keep = F.col("i") <= F.col("j") if upper else F.col("i") >= F.col("j")
    return g.where(keep)


def daxpy(alpha: float, x: DataFrame, y: DataFrame) -> DataFrame:
    """Y := alpha * X + Y element-wise (daxpy.cpp) — full outer key join;
    entries absent on one side are implicit zeros (COO semantics)."""
    xs = _check(x, "X").select("i", "j", F.col("v").alias("__xv__"))
    ys = _check(y, "Y").select("i", "j", F.col("v").alias("__yv__"))
    return xs.join(ys, ["i", "j"], "full").select(
        "i",
        "j",
        (
            F.lit(alpha) * F.coalesce(F.col("__xv__"), F.lit(0.0))
            + F.coalesce(F.col("__yv__"), F.lit(0.0))
        ).alias("v"),
    )


def dscal(alpha: float, x: DataFrame) -> DataFrame:
    """X := alpha * X (dscal.cpp) — map-only."""
    return _check(x, "X").withColumn("v", F.col("v") * F.lit(alpha))


def dasum(x: DataFrame) -> DataFrame:
    """Sum of absolute values (dasum.cpp) — single aggregate, partial
    map-side combine."""
    return _check(x, "X").agg(F.sum(F.abs(F.col("v"))).alias("asum"))


def extract_tri(
    x: DataFrame, upper: bool = True, unit_diagonal: bool = False, n: int | None = None
) -> DataFrame:
    """Extract the upper/lower triangle (extract_tri.cpp); with
    ``unit_diagonal`` the diagonal is replaced by ones (the dtrsm 'dU'
    convention) — INCLUDING diagonal cells that are implicit zeros
    (absent from the COO input), which must materialize as 1.0. Pass
    ``n`` (the matrix dimension) to avoid the one-row bounds aggregate
    that otherwise derives it. Plain extraction is a pure filter — no
    shuffle; the unit-diagonal form adds a generated n-row diagonal."""
    m = _check(x, "X")
    keep = F.col("i") <= F.col("j") if upper else F.col("i") >= F.col("j")
    if not unit_diagonal:
        return m.where(keep)
    off = m.where(keep & (F.col("i") != F.col("j")))
    if n is None:
        mx = m.agg(F.max(F.greatest(F.col("i"), F.col("j"))).alias("mx")).collect()[0].mx
        n = 0 if mx is None else int(mx) + 1
    diag = (
        m.sparkSession.range(n)
        .select(
            F.col("id").alias("i"),
            F.col("id").alias("j"),
            F.lit(1.0).alias("v"),
        )
    )
    return off.unionByName(diag)

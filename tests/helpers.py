"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
    # Row alignment: sort by non-float columns first, and use ROUNDED floats
    # as trailing sort keys — a last-ulp float difference between engines
    # must not reorder rows and misalign the element-wise compare.
    non_float = [c for c in out.columns if not pd.api.types.is_float_dtype(out[c])]
    floats = [c for c in out.columns if pd.api.types.is_float_dtype(out[c])]
    key = out.copy()
    for c in floats:
        key[c] = key[c].round(6)
    order = key.sort_values(by=non_float + floats, kind="stable").index
    return out.loc[order].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        af, bf = float(a), float(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, name: str = "query"):
    """Compare a Spark DataFrame against DuckDB output of ``oracle_sql``."""
    got = spark_df.toPandas()
    want = duck_con.sql(oracle_sql).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch: spark={sorted(got.columns)} duck={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"

    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(gv, wv))
            if not _values_equal(_norm(a), _norm(b))
        ]
        assert not bad, f"{name}: column {c} mismatches (first 5): {bad[:5]}"


def _norm(v):
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v

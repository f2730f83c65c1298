"""CATCH (SURVEY.md §2.11): trap errors in a dataset pipeline and skip,
substitute, or re-raise.

Reference: TAKcatch/skipcatch/createrowcatch :1022-1024;
thorlcr/activities/catch/, Roxie ccdserver.cpp:20709,20783.

Two granularities, as in the reference:
- dataset-level (``catch_dataset``): the whole branch fails → empty /
  substitute row / re-raise. Spark evaluates lazily, so the trap wraps the
  *action*; the returned DataFrame is materialized via a localCheckpoint to
  force the failure inside the trap.
- row-level (``try_expr`` pattern): per-row failures become NULLs via
  Spark's ``try_*`` family (try_divide, try_to_number, try_element_at...)
  — then SKIP = filter out NULLs, ONFAIL = coalesce a substitute value.
  This stays JVM-side (no UDF) and is the 100 TB-safe form: a row error
  must never kill a 1000-executor stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def catch_dataset(
    df: DataFrame,
    on_fail: str = "skip",
    substitute: Row | None = None,
) -> DataFrame:
    """CATCH(ds, SKIP | ONFAIL(transform)): materialize ``df``; on error
    return empty (SKIP) or a single substitute row (ONFAIL)."""
    spark = df.sparkSession
    try:
        # Force evaluation inside the trap; the checkpointed plan is reused
        # by downstream consumers (no recompute of the risky branch).
        return df.localCheckpoint(eager=True)
    except Exception:
        if on_fail == "skip":
            return spark.createDataFrame([], schema=df.schema)
        if on_fail == "substitute" and substitute is not None:
            return spark.createDataFrame([substitute], schema=df.schema)
        raise


def rows_skip_on_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Row-level CATCH(..., SKIP) companion: after computing risky values
    with try_* expressions, drop the rows whose computation failed (NULL)."""
    cond = None
    for c in cols:
        cnd = F.col(c).isNotNull()
        cond = cnd if cond is None else (cond & cnd)
    return df.where(cond)


def rows_substitute_on_null(df: DataFrame, substitutions: dict[str, object]) -> DataFrame:
    """Row-level CATCH(..., ONFAIL(transform)): replace failed (NULL)
    computations with substitute values."""
    out = df
    for c, v in substitutions.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out

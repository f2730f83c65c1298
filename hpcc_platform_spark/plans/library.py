"""Query libraries (SURVEY.md §2.11): LIBRARY/MODULE — pre-compiled
reusable dataflow functions called by name with an interface contract.

Reference: TAKlibrarycall :992 (Roxie ccdserver.cpp:16862): a query
library exposes named dataflow graphs with declared interfaces; calling
queries bind inputs/parameters without recompiling the library body.

Spark-first form: a registry of named builder functions with a declared
result schema; ``call`` validates the produced DataFrame against the
interface (the analogue of the reference's interface-hash check between
library and caller) so callers fail fast on drift, not mid-job.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class QueryLibrary:
    """Named, interface-checked dataflow functions."""

    def __init__(self) -> None:
        self._fns: dict[str, tuple[Callable[..., DataFrame], str | None]] = {}

    def define(self, name: str, fn: Callable[..., DataFrame], schema: str | None = None) -> None:
        """Register ``fn`` under ``name`` with an optional declared result
        schema ('col type, ...')."""
        self._fns[name] = (fn, schema)

    def call(self, name: str, *args, **kwargs) -> DataFrame:
        """LIBRARY(name).fn(...): invoke and validate the interface."""
        fn, schema = self._fns[name]
        out = fn(*args, **kwargs)
        if schema is not None:
            declared = [
                tuple(s.strip().split()) for s in schema.split(",")
            ]
            actual = [
                (f.name, f.dataType.simpleString()) for f in out.schema.fields
            ]
            if [(n, t) for n, t in declared] != actual:
                raise TypeError(
                    f"library '{name}' interface mismatch: declared {declared}, "
                    f"produced {actual}"
                )
        return out

    def names(self) -> list[str]:
        return sorted(self._fns)

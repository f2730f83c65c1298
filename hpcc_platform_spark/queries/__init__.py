"""Query registry: every implemented operator from SURVEY.md §2 gets a named
query (Spark DataFrame program) and, where SQL-expressible, a DuckDB oracle.

Import order defines registry contents; each ``q_*`` module covers one §2
category. ``__spark_entry__.py`` at the repo root re-exports the registry in
the driver's contract shape.
"""

from hpcc_platform_spark.queries.registry import REGISTRY, QueryDef, query, tables

# Category modules — importing registers their queries.
from hpcc_platform_spark.queries import (  # noqa: E402,F401
    q_aggregate,
    q_analytic,
    q_control,
    q_dedup,
    q_functions,
    q_grouped,
    q_join,
    q_nested,
    q_parse,
    q_pipeline,
    q_setops,
    q_sort,
    q_sources,
    q_textsearch,
    q_transform,
    q_window,
    q_workload,
)

__all__ = ["REGISTRY", "QueryDef", "query", "tables"]

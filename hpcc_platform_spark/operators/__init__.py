"""Operator inventory (SURVEY.md §2) as DataFrame combinators.

Each function documents the reference activity it re-expresses
(ThorActivityKind, rtl/include/eclhelper.hpp in the reference tree) and is a
thin, Catalyst-friendly wrapper — declarative DataFrame ops wherever the
semantics allow, ``applyInPandas``/``mapInPandas`` only where they don't.
"""

from hpcc_platform_spark.operators.asof import asof_join
from hpcc_platform_spark.operators.blas import (
    dasum,
    daxpy,
    dgemm,
    dscal,
    dsyrk,
    extract_tri,
)
from hpcc_platform_spark.operators.aggregate import (
    distribution,
    global_agg,
    group_having,
    quantile_exact,
    table_agg,
)
from hpcc_platform_spark.operators.dedup import (
    dedup_all,
    dedup_best,
    dedup_keyed,
    hash_dedup,
)
from hpcc_platform_spark.operators.distribute import (
    distribute_hash,
    partition_meta,
    distribute_merge,
    distribute_range,
    salt_skew,
)
from hpcc_platform_spark.operators.join import (
    all_join,
    join,
    join_atmost,
    join_atmost_range,
    join_limit,
    keyed_join,
    lookup_join,
    lookup_join_keep,
    range_join,
    self_join,
    smart_join,
)
from hpcc_platform_spark.operators.limit import limit_fail, limit_skip
from hpcc_platform_spark.operators.loop import apply_action, graph_loop, loop_count, loop_until
from hpcc_platform_spark.operators.numbering import global_row_number
from hpcc_platform_spark.operators.setops import funnel, nonempty, regroup
from hpcc_platform_spark.operators.sort import (
    assert_sorted,
    global_sort,
    local_sort,
    merge_sorted,
    subsort,
    topn,
)
from hpcc_platform_spark.operators.transform import (
    choosen,
    choosesets,
    combine,
    enth,
    filter_group,
    iterate_pandas,
    iterate_running,
    normalize,
    normalize_counter,
    project,
    project_counter,
    rollup_adjacent,
    rollup_pandas,
    selectnth,
)

__all__ = [
    "all_join",
    "apply_action",
    "assert_sorted",
    "choosen",
    "choosesets",
    "combine",
    "dedup_all",
    "dedup_best",
    "dedup_keyed",
    "distribute_hash",
    "distribute_merge",
    "distribute_range",
    "distribution",
    "enth",
    "filter_group",
    "funnel",
    "global_agg",
    "global_row_number",
    "global_sort",
    "graph_loop",
    "group_having",
    "hash_dedup",
    "iterate_pandas",
    "iterate_running",
    "join",
    "join_atmost",
    "join_atmost_range",
    "join_limit",
    "keyed_join",
    "limit_fail",
    "limit_skip",
    "local_sort",
    "lookup_join",
    "lookup_join_keep",
    "loop_count",
    "loop_until",
    "asof_join",
    "dasum",
    "daxpy",
    "dgemm",
    "dscal",
    "dsyrk",
    "extract_tri",
    "merge_sorted",
    "nonempty",
    "partition_meta",
    "normalize",
    "normalize_counter",
    "project",
    "project_counter",
    "quantile_exact",
    "range_join",
    "regroup",
    "rollup_adjacent",
    "rollup_pandas",
    "salt_skew",
    "selectnth",
    "self_join",
    "smart_join",
    "subsort",
    "table_agg",
    "topn",
]

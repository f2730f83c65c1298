"""Query registry: every implemented operator from SURVEY.md §2 gets a named
query (Spark DataFrame program) and, where SQL-expressible, a DuckDB oracle.

Import order defines registry contents; each ``q_*`` module covers one §2
category. ``__spark_entry__.py`` at the repo root re-exports the registry in
the driver's contract shape.
"""

import os

from hpcc_platform_spark.queries.registry import REGISTRY, QueryDef, query, tables

# Category modules — importing registers their queries.
from hpcc_platform_spark.queries import (  # noqa: E402,F401
    q_aggregate,
    q_analytic,
    q_control,
    q_dedup,
    q_ecl,
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

# Driver-window ordering: the correctness driver verifies the FIRST 50
# entries of ``queries()``, so family coverage there matters more than
# registration order. Families earlier in this list get the spare slots
# when 50 isn't a multiple of the family count.
_FAMILY_PRIORITY = [
    "dedup_pipeline",
    "similarity",
    "join",
    "sort",
    "textsearch",
    "nested",
    "parse",
    "workload",
    "window",
    "transform",
    "sources",
    "setops",
    "grouped",
    "dedup",
    "analytic",
    "textstats",
    "cleaning",
    "multimodal",
    "scheduler",
    "aggregate",
    "control",
    "functions",
]

# Flagship queries pulled to the front of their family's rotation (after the
# oracle-backed-first rule) so the driver window verifies the headline
# operator, not just whichever registered first.
_WITHIN_FAMILY_PRIORITY: dict[str, list[str]] = {
    "dedup_pipeline": ["doc_exact_dedup", "minhash_lsh_portable", "simhash_portable"],
    "similarity": ["ann_bruteforce", "embedding_near_dup", "ann_ivf"],
    "sort": ["global_sort_rank", "topn", "terasort_verify"],
    "transform": ["project_transform", "iterate_running", "rollup_group"],
    "control": ["loop_count", "graph_pagerank", "catch_row_errors"],
    "join": ["join_inner"],
    "textsearch": ["textsearch_and"],
    "parse": ["parse_tokenize"],
    "workload": ["workload_shipping_priority"],
}


def _driver_verified_names() -> set[str]:
    """Query names already hash-verified by the external driver in ANY past
    round (the CORRECTNESS_r*.json records the driver leaves at repo root).

    Used to rotate the verification window: queries the driver has never
    checked sort ahead of already-green ones, so successive rounds walk the
    whole registry instead of re-verifying the same 50."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                results = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, r in results.items():
            if isinstance(r, dict) and r.get("hash_match"):
                green.add(name)
    return green


def ordered_registry() -> dict[str, QueryDef]:
    """Registry re-ordered round-robin across SURVEY §2 families.

    One query per family per round, so any prefix of length >= #families
    contains a representative of every family. Within a family: queries
    the driver has NOT yet hash-verified sort first (oracle-backed before
    rows-only, flagships leading each group), then already-verified ones —
    so the 50-slot driver window is spent on new ground each round and
    driver coverage is cumulative across rounds instead of resampling the
    same families. Contents are identical to ``REGISTRY``.
    """
    verified = _driver_verified_names()
    by_family: dict[str, list[QueryDef]] = {}
    for qd in REGISTRY.values():
        if not qd.driver_visible:
            continue  # pytest-only (engine-specific output; portable sibling checked)
        by_family.setdefault(qd.category, []).append(qd)
    known = [f for f in _FAMILY_PRIORITY if f in by_family]
    families = known + sorted(set(by_family) - set(known))
    for f in families:
        front = _WITHIN_FAMILY_PRIORITY.get(f, [])
        by_family[f].sort(
            key=lambda qd: (
                qd.name in verified,
                qd.oracle is None,
                front.index(qd.name) if qd.name in front else len(front),
            )
        )  # stable beyond the keyed prefix
    # Two-phase interleave: first round-robin across families over their
    # not-yet-verified queries (so the driver window is all new ground),
    # then over the already-verified remainder (family-interleaved spot
    # re-checks). A single-phase round-robin would let families whose
    # queries are all verified inject re-checks into the window early.
    ordered: dict[str, QueryDef] = {}
    for phase_verified in (False, True):
        pools = [
            [qd for qd in by_family[f] if (qd.name in verified) == phase_verified]
            for f in families
        ]
        round_no = 0
        while any(round_no < len(p) for p in pools):
            for p in pools:
                if round_no < len(p):
                    ordered[p[round_no].name] = p[round_no]
            round_no += 1
    return ordered


__all__ = ["REGISTRY", "QueryDef", "ordered_registry", "query", "tables"]

"""Dump .explain("formatted") for queries into plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  tag     e.g. r17
  suffix  e.g. before / after
  query   names; default = the bench HEADLINE set.

Each file also gets a one-line summary header (Exchange count, join nodes,
Python-eval nodes) so plan diffs are greppable.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpcc_platform_spark.operators.numbering import release_numbering_caches  # noqa: E402
from hpcc_platform_spark.queries import REGISTRY  # noqa: E402
from hpcc_platform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "SortMergeJoin": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "BroadcastHashJoin": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "ShuffledHashJoin": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "BroadcastNestedLoopJoin": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "BatchEvalPython": len(re.findall(r"BatchEvalPython", plan)),
        "ArrowEvalPython": len(re.findall(r"ArrowEvalPython", plan)),
        "MapInPandas/Arrow": len(re.findall(r"MapIn(Pandas|Arrow)", plan)),
        "Sort": len(re.findall(r"^\s*[+:*-]*\s*\(?\d*\)?\s*Sort\b", plan, re.M)),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("hpcc_platform_spark_plans")
    for name in names:
        release_numbering_caches()
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"ERROR building {name}: {e!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}) ==\n== summary: {summarize(plan)} ==\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

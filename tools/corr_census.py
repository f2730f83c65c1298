"""Dev census: which verbatim regress files take the correlated-filter
literal-map fallback (eclfront _corr_filter_array's cap-guarded driver
collect) instead of a re-based join plan. Usage:

    python tools/corr_census.py [name ...]   # default: whole VERBATIM list
"""
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import hpcc_platform_spark.eclfront as ef  # noqa: E402
from test_reference_regress import VERBATIM, _queryxml, read_ecl  # noqa: E402

_ECL = os.environ.get(
    "SPARK_GRAFT_REF_ECL", "/root/reference/testing/regress/ecl"
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "6g")
    .appName("corr-census")
    .getOrCreate()
)

names = sys.argv[1:] or list(VERBATIM)
total = 0
for name in names:
    path = os.path.join(_ECL, f"{name}.ecl")
    if not os.path.exists(path):
        path = os.path.join(_ECL, "setup", f"{name}.ecl")
        if not os.path.exists(path):
            continue
    ef._Parser._corr_fallback_hits = 0
    try:
        acts = ef.run_ecl_actions(
            read_ecl(path), {}, spark=spark, stored=_queryxml(name)
        )
        for df in acts:
            df.collect()
    except Exception as e:
        print(f"SKIP {name}: {type(e).__name__}", flush=True)
        continue
    hits = ef._Parser._corr_fallback_hits
    if hits:
        print(f"HIT {name}: {hits}", flush=True)
        total += hits
print(f"TOTAL fallback hits: {total}")

"""Scratch: run one reference regress file through the front door and
show the first failure (or the rendered results vs key)."""
import os, sys, traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import xml.etree.ElementTree as ET

from pyspark.sql import SparkSession

sys.path.insert(0, _REPO)
from hpcc_platform_spark.eclfront import run_ecl_actions

_ECL = os.environ.get(
    "SPARK_GRAFT_REF_ECL", "/root/reference/testing/regress/ecl"
)

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "4g")
    .appName("scratch")
    .getOrCreate()
)

sys.path.insert(0, os.path.join(_REPO, "tests"))
from test_reference_regress import _expected, _render

for name in sys.argv[1:]:
    from test_reference_regress import read_ecl
    text = read_ecl(os.path.join(_ECL, f"{name}.ecl"))
    print(f"==== {name} ====")
    try:
        from test_reference_regress import _queryxml
        actions = run_ecl_actions(text, {}, spark=spark, stored=_queryxml(name))
        expected = _expected(name)
        print(f"actions={len(actions)} expected={len(expected)}")
        for i, df in enumerate(actions):
            got = [[_render(v) for v in row if v is not None] for row in df.collect()]
            exp = expected[i] if i < len(expected) else None
            status = "OK" if got == exp else "MISMATCH"
            print(f"Result {i+1}: {status}")
            if got != exp:
                print("  got:", got[:6])
                print("  exp:", (exp or [])[:6])
    except Exception as e:
        traceback.print_exc()
        print("FAIL:", type(e).__name__, str(e)[:300])

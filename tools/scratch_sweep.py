"""Scratch: run many regress files; print PASS/FAIL one line each.

Usage: python scratch_sweep.py verbatim      -> current VERBATIM list
       python scratch_sweep.py all           -> every key-having .ecl not in VERBATIM
       python scratch_sweep.py name1 name2   -> specific files
"""
import os, re, sys, traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
from hpcc_platform_spark.eclfront import run_ecl_actions

_ECL = os.environ.get(
    "SPARK_GRAFT_REF_ECL", "/root/reference/testing/regress/ecl"
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "6g")
    .appName("sweep")
    .getOrCreate()
)

from test_reference_regress import VERBATIM, _expected, _render

args = sys.argv[1:]
if args == ["verbatim"]:
    names = list(VERBATIM)
elif args == ["all"]:
    names = sorted(
        f[:-4]
        for f in os.listdir(_ECL)
        if f.endswith(".ecl")
        and os.path.exists(os.path.join(_ECL, "key", f[:-4] + ".xml"))
        and f[:-4] not in VERBATIM
    )
else:
    names = args

npass = 0
for name in names:
    try:
        from test_reference_regress import read_ecl
        text = read_ecl(os.path.join(_ECL, f"{name}.ecl"))
        expected = _expected(name)
        if isinstance(expected, tuple) and expected[0] == "__exception__":
            try:
                run_ecl_actions(text, {}, spark=spark)
            except Exception as e:
                assert expected[1] in str(e), f"exception {e} != {expected[1]}"
                print(f"PASS {name}", flush=True)
                npass += 1
                continue
            raise AssertionError(f"expected abort: {expected[1]}")
        from test_reference_regress import _queryxml
        actions = run_ecl_actions(text, {}, spark=spark, stored=_queryxml(name))
        assert len(actions) == len(expected), (
            f"{len(actions)} actions vs {len(expected)} expected"
        )
        for i, (df, exp) in enumerate(zip(actions, expected)):
            got = [
                [_render(v) for v in row if v is not None]
                for row in df.collect()
            ]
            assert got == exp, f"Result {i+1}: {str(got)[:120]} != {str(exp)[:120]}"
        print(f"PASS {name}", flush=True)
        npass += 1
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
print(f"== {npass}/{len(names)} pass", flush=True)

"""Shared test fixtures: one SparkSession per run, DuckDB oracle per test."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpcc_platform_spark.session import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hpcc_platform_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast verification tier — unit + plan tests plus a fixed "
        "sample of verbatim reference-regress files (<5 min); run with "
        "`pytest tests/ -m quick`",
    )


# Fixed 30-file sample of the verbatim suite for the quick tier — one or
# two per major family so a quick run still exercises the front door
# end-to-end. The full 450-file suite remains the real gate.
QUICK_VERBATIM = {
    "sort", "rollup1", "choosesets", "normalize2",
    "denormalize", "dict1", "keyed_join3", "indexread5",
    "indexfilepos", "prefixjoin", "sets",
    "loopall", "aggsqx1", "aggsqx1b", "aggsqx2", "childds7", "sqsimple",
    "sqaggds3", "mergenway", "csvoptions",
    "when6", "issue10022",
}


def pytest_collection_modifyitems(config, items):
    fast_files = {
        "test_advice_fixes.py", "test_registry_order.py",
        "test_coverage_totals.py",
        "test_schema.py", "test_operators.py",
        "test_numbering_plans.py", "test_sources_plans.py",
        "test_functions.py", "test_collation.py",
        "test_decimal_bcd.py", "test_parse.py",
    }
    slow_names = {
        "test_parser_never_crashes_on_garbage",
        # whole-registry plan sweep (~3 min) — real gate, not quick tier
        "test_registry_single_partition_exchanges_carry_only_partials",
    }
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if item.name in slow_names:
            continue
        if fname in fast_files:
            item.add_marker(pytest.mark.quick)
            continue
        if fname != "test_reference_regress.py":
            continue
        if item.name.startswith("test_reference_regress_file_verbatim["):
            nm = item.name.split("[", 1)[1].rstrip("]")
            if nm in QUICK_VERBATIM:
                item.add_marker(pytest.mark.quick)
        else:
            item.add_marker(pytest.mark.quick)

"""Validate registry queries the way the DRIVER does: vanilla SparkSession
(no tuned configs, system TZ) at sf0.01, compared with DuckDB via the same
canonicalization as tests/helpers. Usage:

    python tests/validate_driver_sf.py q1 q2 ...    # or no args = all

Prints one PASS/FAIL line per query and a final summary line; exits 1 on
any failure. (Output also lands in /tmp/validate_driver_sf.last so Spark
progress bars can't eat the result lines.)
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from hpcc_platform_spark.queries import REGISTRY  # noqa: E402
from tests.helpers import assert_matches_oracle  # noqa: E402

SF_DIR = os.environ.get("VALIDATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(names: list[str]) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("validate_driver_sf")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    lines: list[str] = []
    failed = 0
    for name in names or sorted(REGISTRY):
        qd = REGISTRY[name]
        try:
            df = qd.fn(spark, SF_DIR)
            if qd.oracle is None:
                n = df.count()
                lines.append(f"ROWS-ONLY {name}: {n} rows")
                continue
            n = df.count()
            if n == 0:
                lines.append(f"FAIL {name}: VACUOUS (0 rows)")
                failed += 1
                continue
            assert_matches_oracle(df, con, qd.oracle, name=name)
            lines.append(f"PASS {name} ({n} rows)")
        except Exception as e:  # noqa: BLE001
            failed += 1
            lines.append(f"FAIL {name}: {e}")
            traceback.print_exc()
    summary = f"SUMMARY: {len(lines) - failed} ok, {failed} failed"
    lines.append(summary)
    out = "\n".join(lines)
    print(out)
    with open("/tmp/validate_driver_sf.last", "w") as f:
        f.write(out + "\n")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

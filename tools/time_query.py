"""Time one or more registry queries with the bench methodology (warm pass
+ N timed noop runs, min/median reported). Usage:

    python tools/time_query.py [-n RUNS] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpcc_platform_spark.operators.numbering import release_numbering_caches  # noqa: E402
from hpcc_platform_spark.queries import REGISTRY  # noqa: E402
from hpcc_platform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    spark = get_spark("hpcc_platform_spark_time")
    REGISTRY["global_agg"].fn(spark, SF_DIR).collect()  # JVM/footer warm
    for name in args:
        fn = REGISTRY[name].fn
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        spark._jvm.System.gc()
        time.sleep(0.3)
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        release_numbering_caches()
        spark.catalog.clearCache()
        srt = sorted(runs)
        print(
            f"TIMER {name}: min={srt[0]:.3f} med={srt[len(srt) // 2]:.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

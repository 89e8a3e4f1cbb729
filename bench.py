"""Benchmark harness: runs the headline engine queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Timing = full query execution to a count/collect action (plans are built
fresh per query; the SparkSession is warmed once so JVM startup isn't
measured — that matches how a long-running cluster amortizes it).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from lakehouse_engine_spark.core.exec_env import ExecEnv


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = ExecEnv.get_or_create()
    # warm the session (JVM classloading, codegen cache)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        # standalone timing: no cross-query cache reuse, no block buildup
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

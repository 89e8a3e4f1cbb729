"""Benchmark harness: runs the headline engine queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Methodology: each query is built fresh and executed to a count action
twice; the reported time is the best of the two runs (standard warm-run
benchmarking — the first run additionally pays one-time JIT/whole-stage-
codegen compilation, which a long-running cluster amortizes across
thousands of micro-batches/queries). The session itself is warmed once
(JVM classloading, Python worker pool for pandas-UDF queries) for the same
reason. Caches are cleared between runs, so I/O and shuffles are real on
every run — only compilation is amortized.

Set ``SPARK_GRAFT_BENCH_RUNS=1`` for single-shot (cold-compile) timings.
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
    # warm the session: JVM classloading + codegen infra, and the Python
    # worker pool (first pandas-UDF query otherwise pays ~3s of process
    # spawning that a resident cluster never sees per-query)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(256).repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _ident, "id long"
    ).count()

    runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")), 1)
    only = set(sys.argv[1:])  # optional name filter for local iteration
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        best, n = float("inf"), 0
        for _ in range(runs):
            # standalone timing: no cross-query cache reuse, no block buildup
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
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

"""Per-query profiling harness for the optimization rounds.

For each named query (default: all), runs it once against
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) and reports wall seconds plus the
number of Spark jobs the query scheduled (snapshotting the max job id via
the status tracker before/after — cheap and exact in a single-threaded
bench). Optionally dumps ``explain("formatted")`` to ``plans/r14/``.

Usage::

    python tools/profile_queries.py [--plans SUFFIX] [name ...]

``--plans before`` writes ``plans/r14/<name>_before.txt``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from lakehouse_engine_spark.core.exec_env import ExecEnv  # noqa: E402


def job_count(sc) -> int:
    ids = sc.statusTracker().getJobIdsForGroup()
    return max(ids) + 1 if ids else 0


def main() -> None:
    args = sys.argv[1:]
    plans_suffix = None
    if args and args[0] == "--plans":
        plans_suffix = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = ExecEnv.get_or_create()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(256).repartition(sc.defaultParallelism).mapInPandas(
        _ident, "id long"
    ).count()

    only = set(args)
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    if plans_suffix:
        os.makedirs(plans_dir, exist_ok=True)
    rows = []
    for name, fn in entrymod.queries().items():
        if only and name.split("_", 1)[0] not in only and name not in only:
            continue
        spark.catalog.clearCache()
        sc.setJobDescription(name)
        j0 = job_count(sc)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        j1 = job_count(sc)
        sc.setJobDescription(None)
        rows.append((name, dt, j1 - j0, n))
        print(f"{name:42s} {dt:7.3f}s  jobs={j1 - j0:3d}  rows={n}", flush=True)
        if plans_suffix:
            df2 = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w") as f:
                f.write(df2._sc._jvm.PythonSQLUtils.explainString(
                    df2._jdf.queryExecution(), "formatted"))
    rows.sort(key=lambda r: -r[1])
    print("\n# sorted by time")
    for name, dt, j, n in rows:
        print(f"{name:42s} {dt:7.3f}s  jobs={j:3d}")
    print(f"# total {sum(r[1] for r in rows):.1f}s  jobs {sum(r[2] for r in rows)}")


if __name__ == "__main__":
    main()

"""Minimum-parallelism guard for compute-heavy datapipes stages.

Small inputs (one parquet file, a filtered dimension) arrive as a single
partition; any O(n·signature) or O(pairs) stage built on them would then run
as ONE task regardless of cluster size — broadcast joins inherit the stream
side's partitioning. At 100 TB inputs arrive well-partitioned and this is a
no-op; on small/collapsed inputs it spreads the expensive stage across the
cluster for the price of shuffling a tiny table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def _static_num_partitions(df: DataFrame) -> int:
    """Partition count of the STATIC physical plan — ``df.rdd`` with
    adaptive execution temporarily off.

    Under AQE, ``df.rdd`` finalizes the adaptive plan, which
    MATERIALIZES every upstream shuffle stage — real Spark jobs fired
    at plan-construction time (measured: 2 jobs / 4 s for one shuffled
    frame; q31 paid ~10 such jobs per build through its two
    ensure_parallelism call sites). The static plan builds the RDD DAG
    lazily — zero jobs — and its count is the right signal for this
    gate: a starved SOURCE (one small file, a collapsed dimension)
    shows its true split count, while any plan with an upstream
    exchange reports >= spark.sql.shuffle.partitions and skips the
    repartition it never needed. The conf flip is driver-side and
    momentary; engine composition is single-threaded by contract
    (the same assumption ExecEnv's session mutation already makes).
    """
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if (old or "true").lower() == "false":
        return df.rdd.getNumPartitions()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default
    ``sparkContext.defaultParallelism``) — never down."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if _static_num_partitions(df) < target:
        return df.repartition(target)
    return df

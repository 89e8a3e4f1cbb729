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


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default
    ``sparkContext.defaultParallelism``) — never down."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

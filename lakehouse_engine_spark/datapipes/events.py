"""Event/behavior analytics: ordered-stage funnels and cohort retention.

The product-analytics pair every event lakehouse ends up hand-rolling in
SQL. Both are expressed as compositions of built-in DataFrame ops so
Catalyst keeps them in whole-stage codegen, and both are ANSI-SQL
replayable for the correctness oracle.

Scale design:

* ``funnel`` — per-key ordered stage-reach times as k chained
  whole-partition window minima over ONE hash partitioning: stage i's
  time is ``min(ts where stage_i AND ts >= stage_{i-1} time)``. Catalyst
  stacks the Window operators on a single exchange of the key; no
  self-joins, no per-stage shuffles. (A k-way join formulation shuffles
  k times; a collect-sort-fold UDF buffers whole users in Python —
  both strictly worse.)
* ``cohort_retention`` — first-seen bucket per key (one map-side-combined
  agg), equi-join back on the key (co-partitioned with the distinct that
  follows — AQE coalesces the exchanges), then one count-distinct agg.
  All shuffles are on the entity key; skew handling is the generic
  groupBy story.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]


@register("funnel")
def funnel(
    on: List[str],
    stage_col: str,
    stages: List[str],
    ts_col: str = "ts",
) -> TransformerFn:
    """Ordered conversion funnel: for each key, the earliest time each
    stage was reached AFTER the previous stage (``>=``, so a same-instant
    next stage counts). Output: one row per key with
    ``stage1_ts..stageK_ts`` (NULL once the chain breaks) — feed it to an
    aggregation for conversion rates, or keep per-key for path debugging.
    """
    if not stages:
        raise ValueError("funnel: stages must be non-empty")

    def _funnel(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*on)
        out = df
        prev: Optional[str] = None
        names = []
        for i, s in enumerate(stages):
            cond = F.col(stage_col) == s
            if prev is not None:
                # NULL prev => condition NULL => when() skips: chain breaks
                cond = cond & (F.col(ts_col) >= F.col(prev))
            name = f"stage{i + 1}_ts"
            out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
            prev = name
            names.append(name)
        return out.select(*on, *names).distinct()

    return _funnel


@register("cohort_retention")
def cohort_retention(
    on: List[str],
    ts_col: str = "ts",
    bucket: str = "week",
) -> TransformerFn:
    """Cohort retention: keys bucketed by first-seen period, counted in
    every period they return. Output: ``(cohort, period_offset,
    n_active)`` with offset in whole buckets (0 = the cohort's first
    period). ``bucket`` is any ``date_trunc`` unit (week/month/day).
    """
    days = {"day": 1, "week": 7}.get(bucket)

    def _cohort(df: DataFrame) -> DataFrame:
        key_bucket = F.date_trunc(bucket, F.col(ts_col)).cast("date")
        first = df.groupBy(*on).agg(F.min(key_bucket).alias("cohort"))
        active = df.select(*on, key_bucket.alias("period")).distinct()
        joined = active.join(first, on=on)
        if days is not None:
            offset = (F.datediff("period", "cohort") / days).cast("long")
        else:  # month cohorts: calendar months, not fixed-width days
            offset = F.months_between("period", "cohort").cast("long")
        return (
            joined.withColumn("period_offset", offset)
            .groupBy("cohort", "period_offset")
            .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        )

    return _cohort

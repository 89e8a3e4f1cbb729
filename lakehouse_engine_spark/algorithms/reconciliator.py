"""Reconciliator — truth vs current dataset comparison.

Reference parity: ``algorithms/reconciliator.py:129-312``: full outer join on
all non-metric columns, per-metric absolute or percentage diffs (null-safe),
one aggregation of every metric, threshold walk on the driver. The whole
comparison is one Spark job; both sides are cached by default because the
join + agg reuses them.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_engine_spark.core.definitions import (
    InputSpec,
    ReconciliationFailedException,
)
from lakehouse_engine_spark.core.exec_env import ExecEnv
from lakehouse_engine_spark.io.reader_factory import ReaderFactory
from lakehouse_engine_spark.utils.acon_utils import parse_input_spec


class ReconciliationType:
    ABS = "abs"
    PERCENTAGE = "percentage"


class Reconciliator:
    """Executes a reconciliation ACON."""

    def __init__(self, acon: dict):
        self.spark = ExecEnv.get_or_create(config=acon.get("exec_env"))
        self.metrics: List[dict] = acon["metrics"]
        self.truth_spec: InputSpec = parse_input_spec(acon["truth_input_spec"])
        self.current_spec: InputSpec = parse_input_spec(acon["current_input_spec"])
        self.truth_preprocess_query = acon.get("truth_preprocess_query")
        self.current_preprocess_query = acon.get("current_preprocess_query")
        self.ignore_empty_df = acon.get("ignore_empty_df", False)
        self.cache = acon.get("cache", True)

    def get_source_of_truth(self) -> DataFrame:
        df = ReaderFactory.get_data(self.spark, self.truth_spec)
        if self.truth_preprocess_query:
            df.createOrReplaceTempView("truth")
            df = self.spark.sql(self.truth_preprocess_query)
        return df

    def get_current_results(self) -> DataFrame:
        df = ReaderFactory.get_data(self.spark, self.current_spec)
        if self.current_preprocess_query:
            df.createOrReplaceTempView("current")
            df = self.spark.sql(self.current_preprocess_query)
        return df

    def execute(self) -> dict:
        truth = self.get_source_of_truth()
        current = self.get_current_results()
        if self.cache:
            truth, current = truth.cache(), current.cache()

        if self.ignore_empty_df and (truth.isEmpty() or current.isEmpty()):
            return {}

        metric_cols = [m["metric"] for m in self.metrics]
        join_cols = [c for c in truth.columns if c not in metric_cols]
        truth_r = truth.select(
            *join_cols, *[F.col(m).alias(f"truth_{m}") for m in metric_cols]
        )
        current_r = current.select(
            *join_cols, *[F.col(m).alias(f"current_{m}") for m in metric_cols]
        )
        joined = truth_r.join(current_r, on=join_cols, how="full")

        diff_aggs = []
        for m in self.metrics:
            c, t = F.col(f"current_{m['metric']}"), F.col(f"truth_{m['metric']}")
            if m.get("type", ReconciliationType.PERCENTAGE) == ReconciliationType.ABS:
                diff = F.abs(F.coalesce(c, F.lit(0)) - F.coalesce(t, F.lit(0)))
            else:
                # null-safe percentage diff: both null → 0, one null → 1 (100%)
                diff = (
                    F.when(c.eqNullSafe(t), F.lit(0.0))
                    .when(c.isNull() | t.isNull(), F.lit(1.0))
                    .otherwise(F.abs(F.try_divide(c - t, F.abs(t))))
                )
            agg = m.get("aggregation", "avg")
            diff_aggs.append(getattr(F, agg)(diff).alias(f"{m['metric']}_diff"))

        row = joined.agg(*diff_aggs).first().asDict()

        status = {"overall": "green", "metrics": row}
        failures = []
        for m in self.metrics:
            val = row[f"{m['metric']}_diff"] or 0
            if "red" in m and val >= m["red"]:
                failures.append((m["metric"], "red", val))
            elif "yellow" in m and val >= m["yellow"]:
                failures.append((m["metric"], "yellow", val))
        if failures:
            status["overall"] = max(f[1] for f in failures)
            raise ReconciliationFailedException(
                f"Reconciliation failed thresholds: {failures}"
            )
        return status

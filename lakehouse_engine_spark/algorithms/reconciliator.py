"""Reconciliator — truth vs current dataset comparison.

Reference parity: ``algorithms/reconciliator.py:27-312``: full outer join on
all non-metric columns, per-metric absolute or percentage diffs (null-safe;
division-by-zero counts as a 100% difference, and a null on exactly one side
counts as 1.0, never 0), one aggregation of every metric named
``{metric}_{type}_diff_{aggregation}``, threshold walk on the driver
(``yellow <= diff < red`` -> yellow, ``diff >= red`` -> red, red wins).
The whole comparison is one Spark job; both sides are cached by default
(``*_preprocess_query_args`` override with cache/persist, ``[]`` disables).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType

from lakehouse_engine_spark.core.definitions import (
    InputSpec,
    ReconciliationFailedException,
)
from lakehouse_engine_spark.core.exec_env import ExecEnv
from lakehouse_engine_spark.io.reader_factory import ReaderFactory
from lakehouse_engine_spark.utils.acon_utils import parse_input_spec

EMPTY_DF_MSG = (
    "The reconciliation has failed because either the truth dataset or the "
    "current results dataset was empty."
)


class ReconciliationType:
    """Reference values (reconciliator.py:27-31 there); 'abs' kept as an
    accepted alias for ACONs written against earlier rounds of this repo."""

    PCT = "percentage"
    ABS = "absolute"
    ABS_ALIAS = "abs"


class Reconciliator:
    """Executes a reconciliation ACON."""

    def __init__(self, acon: dict):
        self.spark = ExecEnv.get_or_create(config=acon.get("exec_env"))
        self.metrics: List[dict] = acon["metrics"]
        self.truth_spec: InputSpec = parse_input_spec(acon["truth_input_spec"])
        self.current_spec: InputSpec = parse_input_spec(acon["current_input_spec"])
        self.truth_preprocess_query = acon.get("truth_preprocess_query")
        self.current_preprocess_query = acon.get("current_preprocess_query")
        self.truth_preprocess_query_args = acon.get("truth_preprocess_query_args")
        self.current_preprocess_query_args = acon.get("current_preprocess_query_args")
        self.ignore_empty_df = acon.get("ignore_empty_df", False)

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

    @staticmethod
    def _apply_preprocess_query_args(
        df: DataFrame, args: Optional[List[dict]]
    ) -> DataFrame:
        """cache/persist knobs (reference ReconciliationTransformers):
        None -> default cache; [] -> no-op; else apply each function."""
        from lakehouse_engine_spark.transformers.optimizers import cache, persist

        allowed = {"cache": cache, "persist": persist}
        if args is None:
            return df.transform(cache())
        out = df
        for t in args:
            out = out.transform(allowed[t["function"]](**t.get("args", {})))
        return out

    def _diff_col(self, m: dict) -> F.Column:
        c = F.col(f"current_{m['metric']}")
        t = F.col(f"truth_{m['metric']}")
        if m["type"] in (ReconciliationType.ABS, ReconciliationType.ABS_ALIAS):
            diff = F.abs(F.coalesce(c, F.lit(0)) - F.coalesce(t, F.lit(0)))
        elif m["type"] == ReconciliationType.PCT:
            # try_divide nulls on /0 and null operands; the fallback decides
            # 0 (values identical, incl. both-null) vs 1 (one-sided null or
            # a 0-denominator mismatch) — reference reconciliator.py:260-283
            diff = F.coalesce(
                F.abs(F.try_divide(c - t, F.abs(t))),
                F.when(c.eqNullSafe(t), F.lit(0)).otherwise(F.lit(1)),
            )
        else:
            raise NotImplementedError(
                "The requested reconciliation type is not yet implemented."
            )
        return diff.cast(FloatType())

    def execute(self) -> dict:
        truth = self._apply_preprocess_query_args(
            self.get_source_of_truth(), self.truth_preprocess_query_args
        )
        current = self._apply_preprocess_query_args(
            self.get_current_results(), self.current_preprocess_query_args
        )

        # reference: ignore only when BOTH sides are empty (green exit)
        if self.ignore_empty_df and truth.isEmpty() and current.isEmpty():
            return {"overall": "green", "metrics": {}, "ignored_empty": True}

        if len(truth.head(1)) == 0 or len(current.head(1)) == 0:
            raise ReconciliationFailedException(EMPTY_DF_MSG)

        metric_cols = {m["metric"] for m in self.metrics}
        join_cols = [c for c in current.columns if c not in metric_cols]
        truth_r = truth.select(
            *join_cols, *[F.col(c).alias(f"truth_{c}") for c in metric_cols]
        )
        current_r = current.select(
            *join_cols, *[F.col(c).alias(f"current_{c}") for c in metric_cols]
        )
        joined = truth_r.join(current_r, on=join_cols, how="full")

        diff_aggs = [
            getattr(F, m["aggregation"])(self._diff_col(m)).alias(
                f"{m['metric']}_{m['type']}_diff_{m['aggregation']}"
            )
            for m in self.metrics
        ]
        recon_results = joined.agg(*diff_aggs).first().asDict()

        status = "green"
        for m in self.metrics:
            val = recon_results[f"{m['metric']}_{m['type']}_diff_{m['aggregation']}"]
            if m["yellow"] <= val < m["red"]:
                if status == "green":
                    status = "yellow"
            elif val >= m["red"]:
                status = "red"
        if status != "green":
            raise ReconciliationFailedException(
                f"The Reconciliation process has failed with status: {status}."
            )
        return {"overall": "green", "metrics": recon_results}

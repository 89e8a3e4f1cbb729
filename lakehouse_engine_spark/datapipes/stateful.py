"""Custom stateful streaming operators via ``applyInPandasWithState``.

Native Structured Streaming aggregations either window (emit per time
bucket) or run in complete/update mode (re-emit whole groups); what they
cannot express is "per key, carry an accumulator across micro-batches and
emit the RUNNING value on every batch" — the shape a streaming ingestion
controller needs (e.g. a per-domain token budget that must cut off
sampling the moment the cumulative count crosses a threshold, while the
stream is still running).

``streaming_running_totals`` implements exactly that with Spark's
Arrow-batched stateful API (``applyInPandasWithState``): state is one
tiny (count, sum) tuple per key, persisted in the state store and
restored from the checkpoint on restart — so a killed and resumed
ingestion continues its budget accounting where it left off
(pytest-pinned in tests/test_stateful.py).

At 100 TB: state size is O(distinct keys) — two numbers per key, nothing
per row — and the grouping shuffle is the same one any per-key aggregate
pays. The Python worker sees one Arrow batch stream per key per
micro-batch; per-batch work is two pandas reductions.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]


@register("streaming_running_totals")
def streaming_running_totals(
    on: List[str],
    value_col: str,
    budget: Optional[float] = None,
) -> TransformerFn:
    """Per-key running (row count, value sum) across micro-batches.

    Emits one row per key per micro-batch in which the key appears:
    ``on…, batch_rows, batch_value, total_rows, total_value,
    budget_exceeded`` — totals cumulative since the checkpoint's birth,
    ``budget_exceeded`` true once ``total_value`` passes ``budget``
    (always false when no budget is set). Downstream specs gate on the
    flag (e.g. stop writing a domain once its token budget is spent).

    On a BATCH DataFrame the operator degrades to a plain aggregate (one
    "micro-batch" containing everything): same schema, totals == batch
    values — so ACONs can be smoke-tested in batch mode before being
    pointed at a stream.
    """

    def _fn(df: DataFrame) -> DataFrame:
        if not df.isStreaming:
            agg = df.groupBy(*on).agg(
                F.count(F.lit(1)).cast("long").alias("batch_rows"),
                F.sum(F.col(value_col).cast("double")).alias("batch_value"),
            )
            return agg.select(
                *on,
                "batch_rows",
                "batch_value",
                F.col("batch_rows").alias("total_rows"),
                F.col("batch_value").alias("total_value"),
                (
                    F.col("batch_value") > F.lit(budget)
                    if budget is not None
                    else F.lit(False)
                ).alias("budget_exceeded"),
            )

        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        key_fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.select(*on).schema.fields
        )
        out_schema = (
            f"{key_fields}, batch_rows LONG, batch_value DOUBLE, "
            "total_rows LONG, total_value DOUBLE, budget_exceeded BOOLEAN"
        )
        state_schema = "total_rows LONG, total_value DOUBLE"

        def _update(
            key: Tuple,
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            rows, val = 0, 0.0
            for pdf in pdfs:
                rows += len(pdf)
                if len(pdf):
                    val += float(pd.to_numeric(pdf[value_col]).sum())
            prev_rows, prev_val = state.get if state.exists else (0, 0.0)
            total_rows, total_val = prev_rows + rows, prev_val + val
            state.update((total_rows, total_val))
            yield pd.DataFrame(
                [
                    dict(
                        zip(on, key),
                        batch_rows=rows,
                        batch_value=val,
                        total_rows=total_rows,
                        total_value=total_val,
                        budget_exceeded=(
                            budget is not None and total_val > budget
                        ),
                    )
                ]
            )

        return df.groupBy(*on).applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    return _fn

"""Filters: expression/column filters, incremental cursor, dedup.

Reference parity: ``transformers/filters.py:18-161``. Filters are expressed
as Catalyst predicates so they push down into the parquet/delta scan
(visible as PushedFilters in ``.explain``).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]


def expression_filter(exp: str) -> TransformerFn:
    """Filter by SQL boolean expression (reference ``filters.py:89-104``)."""

    def _filter(df: DataFrame) -> DataFrame:
        return df.filter(exp)

    return _filter


def column_filter_exp(exp: List[str]) -> TransformerFn:
    """Projection via SQL expressions (reference ``filters.py:107-122``)."""

    def _select(df: DataFrame) -> DataFrame:
        return df.selectExpr(*exp)

    return _select


def incremental_filter(
    input_col: str,
    increment_value: Optional[Any] = None,
    increment_df: Optional[DataFrame] = None,
    increment_col: str = "latest",
    greater_or_equal: bool = False,
) -> TransformerFn:
    """Keep rows newer than a cursor (reference ``filters.py:18-86``).

    The cursor comes either as a literal or as a 1-row DataFrame (typically
    ``get_max_value`` over the target table). The scalar is fetched driver-side
    (one tiny job) and becomes a pushed-down literal predicate — this is what
    makes incremental loads scan only new partitions at 100 TB.
    """

    def _filter(df: DataFrame) -> DataFrame:
        value = increment_value
        if value is None:
            if increment_df is None:
                raise ValueError("incremental_filter: increment_value or increment_df required")
            row = increment_df.select(increment_col).first()
            value = row[increment_col] if row is not None else None
        if value is None:
            return df  # empty target → full load
        cond = F.col(input_col) >= F.lit(value) if greater_or_equal else F.col(input_col) > F.lit(value)
        return df.filter(cond)

    return _filter


def drop_duplicate_rows(
    cols: Optional[List[str]] = None,
    watermarker: Optional[dict] = None,
) -> TransformerFn:
    """Exact dedup (reference ``filters.py:125-161``).

    Batch: hash-aggregate on the key columns (one shuffle, map-side partial
    combine). Streaming: pair with a watermark so state is bounded.
    """

    def _dedup(df: DataFrame) -> DataFrame:
        out = df
        if watermarker:
            out = out.withWatermark(
                watermarker["col"], watermarker["watermarking_time"]
            )
        return out.dropDuplicates(cols) if cols else out.dropDuplicates()

    return _dedup

"""Column creators: row ids, literals (reference ``transformers/column_creators.py``)."""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]


def with_row_id(output_col: str = "lhe_row_id") -> TransformerFn:
    """Non-contiguous unique row id (reference ``column_creators.py:21-44``).

    ``monotonically_increasing_id`` is fully partition-parallel (no shuffle),
    ids are unique but not dense. Batch-only.
    """

    def _with(df: DataFrame) -> DataFrame:
        return df.withColumn(output_col, F.monotonically_increasing_id())

    return _with


def with_auto_increment_id(output_col: str = "lhe_row_id", rdd: bool = False) -> TransformerFn:
    """Dense 0-based row id (reference ``column_creators.py:47-83``).

    Implemented with a window over ``monotonically_increasing_id`` — unlike the
    reference's default ``rdd.zipWithIndex`` path this stays in Tungsten, but
    the empty orderBy window is a single-partition sort: O(n) shuffle to one
    task. Dense global ids are inherently sequential — prefer ``with_row_id``
    at scale. Batch-only.
    """

    def _with(df: DataFrame) -> DataFrame:
        w = Window.orderBy(F.monotonically_increasing_id())
        return df.withColumn(output_col, F.row_number().over(w) - 1)

    return _with


def with_literals(literals: Dict[str, object]) -> TransformerFn:
    """Add constant columns (reference ``column_creators.py:86-107``)."""

    def _with(df: DataFrame) -> DataFrame:
        return df.withColumns({c: F.lit(v) for c, v in literals.items()})

    return _with

"""Aggregators (reference ``transformers/aggregators.py:17-33``)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]


def get_max_value(input_col: str, output_col: str = "latest") -> TransformerFn:
    """Global max as a 1-row DataFrame — the incremental-load cursor.

    Parquet/Delta column statistics let this resolve from footer metadata in
    many cases; otherwise it is a map-side-combined agg with a 1-row shuffle.
    """

    def _max(df: DataFrame) -> DataFrame:
        return df.select(input_col).agg(F.max(input_col).alias(output_col))

    return _max

"""Regex transformers (reference ``transformers/regex_transformers.py:17-47``)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]


def with_regex_value(
    input_col: str,
    output_col: str,
    regex: str,
    idx: int = 1,
    drop_input_col: bool = False,
) -> TransformerFn:
    """Extract a regex group into a new column."""

    def _extract(df: DataFrame) -> DataFrame:
        out = df.withColumn(output_col, F.regexp_extract(F.col(input_col), regex, idx))
        return out.drop(input_col) if drop_input_col else out

    return _extract

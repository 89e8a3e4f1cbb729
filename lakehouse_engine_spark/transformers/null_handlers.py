"""Null handlers (reference ``transformers/null_handlers.py:16-49``)."""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame

TransformerFn = Callable[[DataFrame], DataFrame]


def replace_nulls(
    replace_on_nums: bool = True,
    default_num_value: int = -999,
    replace_on_strings: bool = True,
    default_string_value: str = "UNKNOWN",
    subset_cols: Optional[List[str]] = None,
) -> TransformerFn:
    """Fill nulls with defaults per type family."""

    def _replace(df: DataFrame) -> DataFrame:
        out = df
        if replace_on_nums:
            out = out.na.fill(default_num_value, subset=subset_cols)
        if replace_on_strings:
            out = out.na.fill(default_string_value, subset=subset_cols)
        return out

    return _replace

"""Watermarker (reference ``transformers/watermarker.py:16-33``)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

TransformerFn = Callable[[DataFrame], DataFrame]


def with_watermark(watermarker_column: str, watermarker_time: str) -> TransformerFn:
    """Declare event-time lateness bound for streaming state eviction."""

    def _wm(df: DataFrame) -> DataFrame:
        return df.withWatermark(watermarker_column, watermarker_time)

    return _wm

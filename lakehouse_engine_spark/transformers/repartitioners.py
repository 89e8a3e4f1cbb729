"""Repartitioners (reference ``transformers/repartitioners.py:17-63``)."""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame

TransformerFn = Callable[[DataFrame], DataFrame]


def repartition(
    num_partitions: Optional[int] = None, cols: Optional[List[str]] = None
) -> TransformerFn:
    """Hash-repartition by count and/or columns — a full shuffle; use to
    co-locate keys before repeated joins or to size output files."""

    def _repart(df: DataFrame) -> DataFrame:
        if num_partitions and cols:
            return df.repartition(num_partitions, *cols)
        if cols:
            return df.repartition(*cols)
        if num_partitions:
            return df.repartition(num_partitions)
        return df

    return _repart


def coalesce(num_partitions: int) -> TransformerFn:
    """Reduce partitions without shuffle (narrow) — for small outputs."""

    def _coalesce(df: DataFrame) -> DataFrame:
        return df.coalesce(num_partitions)

    return _coalesce

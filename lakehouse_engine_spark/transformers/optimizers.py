"""Plan-level optimizers: cache/persist/unpersist (reference ``transformers/optimizers.py:17-74``)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

TransformerFn = Callable[[DataFrame], DataFrame]


def cache() -> TransformerFn:
    """MEMORY_AND_DISK cache — for DataFrames reused by several downstream specs."""

    def _cache(df: DataFrame) -> DataFrame:
        return df.cache()

    return _cache


def persist(storage_level: str = "MEMORY_AND_DISK") -> TransformerFn:
    """Persist with an explicit storage level name."""

    def _persist(df: DataFrame) -> DataFrame:
        return df.persist(getattr(StorageLevel, storage_level))

    return _persist


def unpersist(blocking: bool = False) -> TransformerFn:
    """Release a cached DataFrame."""

    def _unpersist(df: DataFrame) -> DataFrame:
        return df.unpersist(blocking)

    return _unpersist

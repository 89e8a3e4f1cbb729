"""Union transformers (reference ``transformers/unions.py:17-39,42-72``)."""

from __future__ import annotations

from functools import reduce
from typing import Callable, Dict, List

from pyspark.sql import DataFrame

TransformerFn = Callable[[DataFrame], DataFrame]


def union(
    data: Dict[str, DataFrame], union_with: List[str], deduplication: bool = True
) -> TransformerFn:
    """Positional UNION (ALL) with other specs' DataFrames.

    ``deduplication=True`` adds a ``.distinct()`` — one hash-aggregate shuffle
    over all columns; prefer False (UNION ALL, shuffle-free) when inputs are
    known disjoint.
    """

    def _union(df: DataFrame) -> DataFrame:
        out = reduce(DataFrame.union, [data[s] for s in union_with], df)
        return out.distinct() if deduplication else out

    return _union


def union_by_name(
    data: Dict[str, DataFrame],
    union_with: List[str],
    deduplication: bool = True,
    allow_missing_columns: bool = True,
) -> TransformerFn:
    """Name-based UNION (reference ``unions.py:42-72``)."""

    def _union(df: DataFrame) -> DataFrame:
        out = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns),
            [data[s] for s in union_with],
            df,
        )
        return out.distinct() if deduplication else out

    return _union

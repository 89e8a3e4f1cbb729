"""Data maskers (reference ``transformers/data_maskers.py:18-74``)."""

from __future__ import annotations

from typing import Callable, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]


def hash_masker(
    cols: List[str],
    approach: str = "SHA",
    num_bits: int = 256,
    suffix: str = "_hash",
) -> TransformerFn:
    """Mask columns with SHA-2 or murmur3 (reference ``data_maskers.py:18-52``).

    Both are codegen'd JVM expressions — no UDF, no measurable cost at scale.
    """

    def _mask(df: DataFrame) -> DataFrame:
        if approach == "SHA":
            return df.withColumns({f"{c}{suffix}": F.sha2(F.col(c).cast("string"), num_bits) for c in cols})
        if approach == "MURMUR3":
            return df.withColumns({f"{c}{suffix}": F.hash(F.col(c)) for c in cols})
        raise ValueError(f"hash_masker: unknown approach {approach}")

    return _mask


def column_dropper(cols: List[str]) -> TransformerFn:
    """Drop columns (reference ``data_maskers.py:55-74``)."""

    def _drop(df: DataFrame) -> DataFrame:
        return df.drop(*cols)

    return _drop

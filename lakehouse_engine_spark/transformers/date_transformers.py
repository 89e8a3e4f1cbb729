"""Date/time scalar transformers (reference ``transformers/date_transformers.py:18-167``)."""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]


def add_current_date(output_col: str = "lhe_extraction_date") -> TransformerFn:
    """Stamp the load timestamp (reference ``date_transformers.py:18-35``).

    Uses ``current_timestamp()`` (plan-constant per query) rather than a
    driver-side ``datetime.now()`` literal — same value on every executor.
    """

    def _add(df: DataFrame) -> DataFrame:
        return df.withColumn(output_col, F.current_timestamp())

    return _add


def convert_to_date(cols: List[str], source_format: Optional[str] = None) -> TransformerFn:
    """String → date (reference ``date_transformers.py:38-63``)."""

    def _conv(df: DataFrame) -> DataFrame:
        return df.withColumns(
            {c: F.to_date(F.col(c), source_format) if source_format else F.to_date(F.col(c)) for c in cols}
        )

    return _conv


def convert_to_timestamp(cols: List[str], source_format: Optional[str] = None) -> TransformerFn:
    """String → timestamp (reference ``date_transformers.py:66-92``)."""

    def _conv(df: DataFrame) -> DataFrame:
        return df.withColumns(
            {
                c: F.to_timestamp(F.col(c), source_format)
                if source_format
                else F.to_timestamp(F.col(c))
                for c in cols
            }
        )

    return _conv


def format_date(cols: List[str], target_format: str) -> TransformerFn:
    """Date/timestamp → formatted string (reference ``date_transformers.py:95-118``)."""

    def _fmt(df: DataFrame) -> DataFrame:
        return df.withColumns({c: F.date_format(F.col(c), target_format) for c in cols})

    return _fmt


def get_date_hierarchy(cols: List[str], formats: Optional[List[str]] = None) -> TransformerFn:
    """Expand date columns into day/week/month/quarter/year parts
    (reference ``date_transformers.py:121-167``)."""
    parts = formats or ["day", "week", "month", "quarter", "year"]
    extractors = {
        "day": F.dayofmonth,
        "week": F.weekofyear,
        "month": F.month,
        "quarter": F.quarter,
        "year": F.year,
    }

    def _hier(df: DataFrame) -> DataFrame:
        new = {}
        for c in cols:
            for p in parts:
                new[f"{c}_{p}"] = extractors[p](F.col(c))
        return df.withColumns(new)

    return _hier

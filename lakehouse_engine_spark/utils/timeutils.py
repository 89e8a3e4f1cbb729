"""Timestamp-type-agnostic epoch conversion.

Parquet timestamps arrive as TIMESTAMP (ltz) or TIMESTAMP_NTZ depending on
the writer's ``isAdjustedToUTC`` flag — the synthetic ``events.ts`` is
``timestamp[us]`` without a zone, which Spark reads as TIMESTAMP_NTZ.
``unix_micros`` only accepts TIMESTAMP, so any operator that buckets or
compares times numerically needs a conversion that works for BOTH types
without depending on the session time zone (an NTZ wall-clock is treated
as-if-UTC, which is exactly what a naive-timestamp oracle like DuckDB's
``epoch_us`` computes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

def _epoch_ntz() -> Column:
    # NTZ epoch literal: comparisons against it are pure wall-clock
    # arithmetic, independent of spark.sql.session.timeZone. Built lazily —
    # Column construction needs an active SparkSession.
    return F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))


def epoch_us_ntz(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column (wall-clock as UTC)."""
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), col)


def epoch_us(df: DataFrame, col: str) -> Column:
    """Epoch microseconds of ``df[col]`` for any temporal or numeric type.

    TIMESTAMP → ``unix_micros`` (true epoch); TIMESTAMP_NTZ → wall-clock
    micros since the naive epoch (session-tz independent); DATE → midnight
    UTC; numerics pass through as long.
    """
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, TimestampNTZType):
        return epoch_us_ntz(c)
    if isinstance(dt, TimestampType):
        return F.unix_micros(c)
    if isinstance(dt, DateType):
        # unix_date is tz-independent (days since epoch), unlike a cast
        return F.unix_date(c).cast("long") * F.lit(86_400_000_000).cast("long")
    return c.cast("long")

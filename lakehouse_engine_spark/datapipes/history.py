"""Slowly-changing-dimension history building from change streams.

The lakehouse step after CDC condensation: turn a stream of full-row
states per key into SCD2 validity intervals (``valid_from``/``valid_to``/
``is_current``) with no-op updates suppressed — the dimension shape every
warehouse consumer joins against. The reference engine stops at record-
mode condensation (transformers/condensers.py parity op); this completes
the path to a queryable history table.

Scale design: everything runs over ONE hash partitioning of the key —
a lag() to suppress unchanged states, a filter, and a lead() for the
interval end all stack on the same Exchange (Catalyst reuses it; no
second shuffle, no self-join). Skewed keys follow the generic window
story (AQE / upstream salting); state never leaves the JVM.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]


@register("scd2_build")
def scd2_build(
    key_cols: List[str],
    ts_col: str,
    attr_cols: Optional[List[str]] = None,
    change_only: bool = True,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> TransformerFn:
    """Build an SCD2 dimension from per-key state events: one output row
    per retained version with ``valid_from = ts``, ``valid_to`` = the next
    retained version's ts (NULL while current), and ``is_current``.

    ``change_only=True`` (default) suppresses no-op updates first: a row
    is retained only when its ``attr_cols`` tuple differs from the
    previous retained state (lag over the key window — and because a
    no-op row equals its predecessor, comparing against the raw
    predecessor is equivalent to comparing against the last retained one).
    ``attr_cols`` defaults to every column except keys + ts. Rows must be
    unique per (key, ts) — pre-aggregate if the source can emit ties
    (the ts order would otherwise be nondeterministic).
    """
    if not key_cols:
        raise ValueError("scd2_build: key_cols must be non-empty")

    def _build(df: DataFrame) -> DataFrame:
        attrs = attr_cols or [
            c for c in df.columns if c not in set(key_cols) | {ts_col}
        ]
        w = Window.partitionBy(*key_cols).orderBy(ts_col)
        cur = df
        if change_only:
            state = F.struct(*[F.col(c) for c in attrs])
            prev = F.lag(state).over(w)
            # NULL-safe: first row (prev NULL) and genuine changes survive
            cur = (
                df.withColumn("__chg", ~prev.eqNullSafe(state))
                .filter(F.coalesce("__chg", F.lit(True)))
                .drop("__chg")
            )
        return (
            cur.withColumn(start_col, F.col(ts_col))
            .withColumn(end_col, F.lead(ts_col).over(w))
            .withColumn(current_col, F.col(end_col).isNull())
        )

    return _build

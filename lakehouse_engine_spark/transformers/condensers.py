"""Condensers: dedup-to-latest window operators.

Reference parity: ``transformers/condensers.py:21-130``. Both operators are a
single ``row_number`` window — one shuffle on the business key, no sort of the
full table (window sort is per-key). Skewed keys are handled by AQE skew-join
splitting; for pathological skew pre-salt the ranking.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]

_RANK_COL = "lhe_row_rank"


def group_and_rank(
    group_key: List[str], ranking_key: List[str], descending: bool = True
) -> TransformerFn:
    """Keep the best row per group (reference ``condensers.py:91-130``). Batch-only."""

    def _rank(df: DataFrame) -> DataFrame:
        order = [F.col(c).desc() if descending else F.col(c).asc() for c in ranking_key]
        w = Window.partitionBy(*group_key).orderBy(*order)
        return (
            df.withColumn(_RANK_COL, F.row_number().over(w))
            .filter(F.col(_RANK_COL) == 1)
            .drop(_RANK_COL)
        )

    return _rank


def condense_record_mode_cdc(
    business_key: List[str],
    ranking_key_desc: List[str],
    record_mode_col: str = "recordmode",
    valid_record_modes: Optional[List[str]] = None,
    ranking_key_asc: Optional[List[str]] = None,
) -> TransformerFn:
    """SAP-style CDC condensation (reference ``condensers.py:21-88``).

    Ranks ALL changelog rows per business key first, then keeps the rank-1
    row only if its record mode is valid (null counts as a valid upsert).
    The order matters: when the NEWEST image of a key carries an excluded
    record mode, the key must produce no row for this batch (the excluded
    image suppresses the key) — filtering invalid modes before ranking
    would wrongly resurrect an older image. Downstream MERGE then applies
    the single surviving row per key. Batch-only (runs in foreachBatch when
    the source streams).
    """

    def _condense(df: DataFrame) -> DataFrame:
        order = [F.col(c).desc() for c in ranking_key_desc]
        if ranking_key_asc:
            order += [F.col(c).asc() for c in ranking_key_asc]
        w = Window.partitionBy(*business_key).orderBy(*order)
        out = df.withColumn(_RANK_COL, F.row_number().over(w))
        if valid_record_modes is not None:
            out = out.filter(
                F.col(record_mode_col).isNull()
                | F.col(record_mode_col).isin(valid_record_modes)
            )
        return out.filter(F.col(_RANK_COL) == 1).drop(_RANK_COL)

    return _condense

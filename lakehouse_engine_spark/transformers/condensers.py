"""Condensers: dedup-to-latest window operators.

Reference parity: ``transformers/condensers.py:21-130``. Both operators are a
single ``row_number`` window — one shuffle on the business key, no sort of the
full table (window sort is per-key).

Skew: AQE does NOT split window partitions (OptimizeSkewedJoin applies to
joins only), so a 90%-one-key distribution lands one task with 90% of the
rows. Both operators therefore take ``salt_partitions``: keep-best-row is an
argmax, and argmax is associative, so a two-stage tournament — rank-1 per
``(key, salt)`` with the SAME ordering, then rank-1 per key over the ≤salt
survivors — returns exactly the unsalted winner (up to the same tie
arbitrariness ``row_number`` always has) while bounding any task's sort at
``rows_of_hottest_key / salt_partitions``. Worked example: 1M rows, 90% on
one key, ``salt_partitions=32`` → hottest stage-1 sort ≈ 28k rows, stage 2
sorts 32. Pytest-pinned at that exact distribution
(tests/test_condenser_skew.py).
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TransformerFn = Callable[[DataFrame], DataFrame]

_RANK_COL = "lhe_row_rank"
_SALT_COL = "lhe_salt"


def _keep_rank1(
    df: DataFrame,
    partition_cols: List[str],
    order: List[Column],
    salt_partitions: Optional[int],
) -> DataFrame:
    """rank-1 per partition key; optionally via the salted two-stage
    tournament (see module docstring)."""
    if salt_partitions and salt_partitions > 1:
        # monotonically_increasing_id is (partition << 33 | row-index): the
        # modulo spreads a hot key's rows evenly across salts with no extra
        # column reads; assignment is nondeterministic across runs but the
        # tournament winner is not (argmax associativity, same ordering)
        salted = df.withColumn(
            _SALT_COL, (F.monotonically_increasing_id() % salt_partitions)
        )
        w1 = Window.partitionBy(*partition_cols, _SALT_COL).orderBy(*order)
        df = (
            salted.withColumn(_RANK_COL, F.row_number().over(w1))
            .filter(F.col(_RANK_COL) == 1)
            .drop(_RANK_COL, _SALT_COL)
        )
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(_RANK_COL, F.row_number().over(w))
        .filter(F.col(_RANK_COL) == 1)
        .drop(_RANK_COL)
    )


def group_and_rank(
    group_key: List[str],
    ranking_key: List[str],
    descending: bool = True,
    salt_partitions: Optional[int] = None,
) -> TransformerFn:
    """Keep the best row per group (reference ``condensers.py:91-130``).
    Batch-only. ``salt_partitions`` enables the skew-safe two-stage
    tournament (module docstring)."""

    def _rank(df: DataFrame) -> DataFrame:
        order = [F.col(c).desc() if descending else F.col(c).asc() for c in ranking_key]
        return _keep_rank1(df, group_key, order, salt_partitions)

    return _rank


def condense_record_mode_cdc(
    business_key: List[str],
    ranking_key_desc: List[str],
    record_mode_col: str = "recordmode",
    valid_record_modes: Optional[List[str]] = None,
    ranking_key_asc: Optional[List[str]] = None,
    salt_partitions: Optional[int] = None,
) -> TransformerFn:
    """SAP-style CDC condensation (reference ``condensers.py:21-88``).

    Ranks ALL changelog rows per business key first, then keeps the rank-1
    row only if its record mode is valid (null counts as a valid upsert).
    The order matters: when the NEWEST image of a key carries an excluded
    record mode, the key must produce no row for this batch (the excluded
    image suppresses the key) — filtering invalid modes before ranking
    would wrongly resurrect an older image. Downstream MERGE then applies
    the single surviving row per key. Batch-only (runs in foreachBatch when
    the source streams). ``salt_partitions`` enables the skew-safe
    two-stage tournament; the validity filter still runs AFTER the final
    rank, so the suppression semantics are unchanged (the global best row
    wins its salt bracket, then the final, exactly as unsalted).
    """

    def _condense(df: DataFrame) -> DataFrame:
        order = [F.col(c).desc() for c in ranking_key_desc]
        if ranking_key_asc:
            order += [F.col(c).asc() for c in ranking_key_asc]
        out = _keep_rank1(df, business_key, order, salt_partitions)
        if valid_record_modes is not None:
            out = out.filter(
                F.col(record_mode_col).isNull()
                | F.col(record_mode_col).isin(valid_record_modes)
            )
        return out

    return _condense

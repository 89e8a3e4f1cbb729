"""Join transformer (reference ``transformers/joiners.py:20-95``).

Equi- or theta-joins between the current DataFrame and another spec's
DataFrame, via SQL over temp views so arbitrary join conditions work. The
broadcast hint (default on, matching the reference) makes dimension joins
map-side at any scale; without it Catalyst/AQE still auto-broadcasts sides
under the threshold.
"""

from __future__ import annotations

import uuid
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame

TransformerFn = Callable[[DataFrame], DataFrame]

_JOIN_TYPES = {
    "inner",
    "cross",
    "outer",
    "full",
    "fullouter",
    "full_outer",
    "left",
    "leftouter",
    "left_outer",
    "right",
    "rightouter",
    "right_outer",
    "semi",
    "leftsemi",
    "left_semi",
    "anti",
    "leftanti",
    "left_anti",
}


def join(
    left_df: DataFrame,
    join_with: DataFrame,
    join_condition: str,
    left_df_alias: str = "a",
    right_df_alias: str = "b",
    join_type: str = "inner",
    broadcast_join: bool = True,
    select_cols: Optional[List[str]] = None,
    watermarker: Optional[Dict[str, dict]] = None,
) -> DataFrame:
    """SQL join of two named DataFrames.

    ``join_condition`` references ``a``/``b`` aliases (or custom aliases);
    ``select_cols`` defaults to ``a.*, b.*``-safe explicit list.
    """
    jt = join_type.lower().replace(" ", "_")
    if jt not in _JOIN_TYPES:
        raise ValueError(f"join: unsupported join_type {join_type}")
    left, right = left_df, join_with
    if watermarker:
        lw = watermarker.get("left") or watermarker.get(left_df_alias)
        rw = watermarker.get("right") or watermarker.get(right_df_alias)
        if lw:
            left = left.withWatermark(lw["col"], lw["watermarking_time"])
        if rw:
            right = right.withWatermark(rw["col"], rw["watermarking_time"])

    spark = left.sparkSession
    tag = uuid.uuid4().hex[:8]
    lview, rview = f"lhe_join_l_{tag}", f"lhe_join_r_{tag}"
    # GLOBAL temp views (the reference's SparkUtils.create_temp_view
    # choice): each side registers in ITS own session but global_temp is
    # context-wide, so a batch dimension planned in the main session
    # resolves inside a foreachBatch micro-batch session too
    left.createOrReplaceGlobalTempView(lview)
    right.createOrReplaceGlobalTempView(rview)
    hint = f"/*+ BROADCAST({right_df_alias}) */ " if broadcast_join else ""
    cols = ", ".join(select_cols) if select_cols else f"{left_df_alias}.*"
    sql_join_type = {"semi": "LEFT SEMI", "leftsemi": "LEFT SEMI", "left_semi": "LEFT SEMI",
                     "anti": "LEFT ANTI", "leftanti": "LEFT ANTI", "left_anti": "LEFT ANTI",
                     "fullouter": "FULL OUTER", "full_outer": "FULL OUTER", "full": "FULL OUTER",
                     "outer": "FULL OUTER", "leftouter": "LEFT OUTER", "left_outer": "LEFT OUTER",
                     "left": "LEFT OUTER", "rightouter": "RIGHT OUTER",
                     "right_outer": "RIGHT OUTER", "right": "RIGHT OUTER",
                     "cross": "CROSS", "inner": "INNER"}[jt]
    on_clause = "" if jt == "cross" else f" ON {join_condition}"
    out = spark.sql(
        f"SELECT {hint}{cols} FROM global_temp.{lview} AS {left_df_alias} "
        f"{sql_join_type} JOIN global_temp.{rview} AS {right_df_alias}{on_clause}"
    )
    # the returned plan is analyzed — drop the per-call views so repeated
    # micro-batch invocations don't litter the global catalog
    spark.catalog.dropGlobalTempView(lview)
    spark.catalog.dropGlobalTempView(rview)
    return out


def join_transformer(
    data: Dict[str, DataFrame],
    join_with: str,
    join_condition: str,
    left_df_alias: str = "a",
    right_df_alias: str = "b",
    join_type: str = "inner",
    broadcast_join: bool = True,
    select_cols: Optional[List[str]] = None,
    watermarker: Optional[Dict[str, dict]] = None,
) -> TransformerFn:
    """Registry wrapper: resolve ``join_with`` spec_id from the dataflow dict."""

    def _join(df: DataFrame) -> DataFrame:
        if join_with not in data:
            raise ValueError(f"join: unknown spec_id {join_with}")
        return join(
            df,
            data[join_with],
            join_condition,
            left_df_alias,
            right_df_alias,
            join_type,
            broadcast_join,
            select_cols,
            watermarker,
        )

    return _join

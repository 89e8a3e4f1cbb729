"""Terminator dispatch (reference ``terminators/terminator_factory.py:19-52``)."""

from __future__ import annotations

import logging
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from lakehouse_engine_spark.core.definitions import TerminatorSpec
from lakehouse_engine_spark.core.exec_env import ExecEnv

_LOGGER = logging.getLogger(__name__)


class TerminatorFactory:
    """Executes one TerminatorSpec after writes complete."""

    @staticmethod
    def execute(
        spark: SparkSession, spec: TerminatorSpec, data: Optional[Dict[str, DataFrame]] = None
    ) -> None:
        fn = spec.function
        args = dict(spec.args or {})
        if fn == "optimize_dataset":
            optimize_dataset(spark, **args)
        elif fn == "notify":
            from lakehouse_engine_spark.terminators.notifiers import NotifierFactory

            notifier = NotifierFactory.get_notifier(spec)
            notifier.create_notification()
            notifier.send_notification()
        elif fn == "terminate_spark":
            spark.stop()
        elif fn == "expose_cdf":
            expose_cdf(spark, **args)
        else:
            raise ValueError(f"Unknown terminator: {fn}")


def optimize_dataset(
    spark: SparkSession,
    db_table: Optional[str] = None,
    location: Optional[str] = None,
    compute_table_stats: bool = True,
    vacuum: bool = True,
    vacuum_hours: int = 720,
    optimize_where: Optional[str] = None,
    optimize_zorder_col_list: Optional[list] = None,
    debug: bool = False,
) -> None:
    """OPTIMIZE (+ZORDER/WHERE) → VACUUM → ANALYZE combo
    (reference ``terminators/dataset_optimizer.py:18-138``).

    OPTIMIZE/VACUUM are Delta operations; on non-Delta runtimes only the
    ANALYZE statistics step applies (feeds Catalyst's CBO join reordering).
    """
    tgt = db_table or (f"delta.`{location}`" if location else None)
    if tgt is None:
        raise ValueError("optimize_dataset needs db_table or location")
    if ExecEnv.delta_available():
        zorder = f" ZORDER BY ({', '.join(optimize_zorder_col_list)})" if optimize_zorder_col_list else ""
        where = f" WHERE {optimize_where}" if optimize_where else ""
        spark.sql(f"OPTIMIZE {tgt}{where}{zorder}")
        if vacuum:
            spark.sql(f"VACUUM {tgt} RETAIN {vacuum_hours} HOURS")
    if compute_table_stats and db_table:
        spark.sql(f"ANALYZE TABLE {db_table} COMPUTE STATISTICS")


def expose_cdf(spark: SparkSession, **args: object) -> None:
    """Delta Change-Data-Feed materialization (reference ``terminators/cdf_processor.py:30-144``)."""
    if not ExecEnv.delta_available():
        raise NotImplementedError("expose_cdf requires delta-spark (readChangeFeed)")
    raise NotImplementedError("expose_cdf: CDF terminator pending delta-enabled environment")

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


def expose_cdf(
    spark: SparkSession,
    db_table: Optional[str] = None,
    location: Optional[str] = None,
    materialized_cdf_location: Optional[str] = None,
    materialized_cdf_options: Optional[dict] = None,
    materialized_cdf_num_partitions: Optional[int] = None,
    db_table_options: Optional[dict] = None,
    data_format: Optional[str] = None,
    clean_cdf: bool = True,
    vacuum_cdf: bool = False,
    days_to_keep: int = 30,
    vacuum_hours: int = 168,
    read_cdf=None,
    write_cdf=None,
    now=None,
) -> None:
    """Materialize a Delta table's Change Data Feed to an external location
    (reference ``terminators/cdf_processor.py:30-144``).

    Reads the CDF (``readChangeFeed``) as a stream, stamps
    ``_commit_timestamp`` to ``yyyyMMddHHmmss`` (string — partition-friendly
    and lexicographically ordered), partitions the materialization by it,
    appends to ``materialized_cdf_location``, then applies retention:
    ``clean_cdf`` deletes partitions older than ``days_to_keep`` and
    ``vacuum_cdf`` reclaims the files (delta) — on parquet runtimes the
    clean step is a filtered rewrite and vacuum is a no-op (the rewrite
    already dropped the data files).

    ``read_cdf``/``write_cdf``/``now`` are injectable seams: the CDF source
    requires a delta runtime, but everything downstream (stamping,
    partitioning, retention math) is plain Spark — tests drive it with a
    static frame. Scale note: the materialization appends
    per-commit-timestamp partitions and retention prunes on the partition
    column, so both sides stay partition-local — no full-table rewrite on
    a delta runtime.
    """
    import datetime as _dt

    from pyspark.sql import functions as F

    if materialized_cdf_location is None:
        raise ValueError("expose_cdf needs materialized_cdf_location")
    fmt = data_format or ("delta" if ExecEnv.delta_available() else "parquet")

    if read_cdf is None:
        if not ExecEnv.delta_available():
            raise NotImplementedError(
                "expose_cdf needs delta-spark for readChangeFeed (or inject read_cdf)"
            )
        reader = spark.readStream.format("delta").option("readChangeFeed", "true")
        for k, v in (db_table_options or {}).items():
            reader = reader.option(k, str(v))
        df = reader.table(db_table) if db_table else reader.load(location)
    else:
        df = read_cdf()

    df = df.withColumn(
        "_commit_timestamp", F.date_format(F.col("_commit_timestamp"), "yyyyMMddHHmmss")
    )
    df = (
        df.repartition(materialized_cdf_num_partitions)
        if materialized_cdf_num_partitions
        else df.repartition(F.col("_commit_timestamp"))
    )

    if write_cdf is not None:
        write_cdf(df)
    elif df.isStreaming:
        q = (
            df.writeStream.format(fmt)
            .outputMode("append")
            .partitionBy("_commit_timestamp")
            .options(**(materialized_cdf_options or {}))
            .trigger(availableNow=True)
            .start(materialized_cdf_location)
        )
        q.awaitTermination()
    else:
        (
            df.write.format(fmt)
            .mode("append")
            .partitionBy("_commit_timestamp")
            .options(**(materialized_cdf_options or {}))
            .save(materialized_cdf_location)
        )

    if clean_cdf:
        limit = ((now or _dt.datetime.today()) - _dt.timedelta(days=days_to_keep)).strftime(
            "%Y%m%d%H%M%S"
        )
        # retention must follow the MATERIALIZATION format — a parquet
        # materialization on a delta-enabled runtime is not a Delta table
        if fmt == "delta" and ExecEnv.delta_available():
            from delta.tables import DeltaTable

            DeltaTable.forPath(spark, materialized_cdf_location).delete(
                F.col("_commit_timestamp") < limit
            )
        else:
            # parquet fallback: read survivors, then rewrite. localCheckpoint
            # (eager) cuts lineage BEFORE the overwrite truncates the source —
            # a persist could still recompute evicted partitions from the
            # truncated files.
            kept = (
                spark.read.format(fmt)
                .load(materialized_cdf_location)
                # cast: partition-value inference may have read the stamp as
                # a long; the comparison must stay lexicographic-on-string
                .filter(F.col("_commit_timestamp").cast("string") >= limit)
                .localCheckpoint(eager=True)
            )
            (
                kept.write.format(fmt)
                .mode("overwrite")
                .partitionBy("_commit_timestamp")
                .save(materialized_cdf_location)
            )

    if vacuum_cdf and fmt == "delta" and ExecEnv.delta_available():
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, materialized_cdf_location).vacuum(vacuum_hours)

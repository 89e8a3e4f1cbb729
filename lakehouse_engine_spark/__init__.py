"""lakehouse_engine_spark — a PySpark-native, configuration-driven analytics engine.

A brand-new implementation of the capability surface of
``adidas/lakehouse-engine`` (reference at ``/root/reference``), built directly
on the public PySpark DataFrame / SQL / Structured Streaming APIs. Users
submit an **ACON** (algorithm configuration dict) and the engine executes one
of the algorithms — DataLoader, DQValidator, Reconciliator, Sensor, GAB,
TableManager, FileManager — each composing readers → transformers →
data-quality validations → writers → terminators over Spark DataFrames.

Public API parity target: the module-level functions of the reference's
``lakehouse_engine/engine.py`` (reference ``engine.py:29-477``).

Beyond parity, the :mod:`lakehouse_engine_spark.datapipes` package adds the
operators a large-scale training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force and LSH/IVF ANN), text analysis (language-ID, quality scoring,
token counting, fingerprinting) and multimodal binary-column plumbing — all
designed shuffle-light for 100 TB scale.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame

from lakehouse_engine_spark.core.exec_env import ExecEnv


def load_data(
    acon: dict,
    collect_engine_usage: Optional[str] = None,
    spark_confs: Optional[dict] = None,
) -> Optional[dict]:
    """Load data according to an ACON (reference ``engine.py:29-53``).

    Runs the DataLoader algorithm: read → transform → data quality → write →
    terminate. Returns ``{spec_id: DataFrame}`` when an output spec uses the
    ``dataframe`` format, else ``None``.
    """
    from lakehouse_engine_spark.algorithms.data_loader import DataLoader
    from lakehouse_engine_spark.utils.engine_usage import store_engine_usage

    store_engine_usage(acon, "load_data", collect_engine_usage, spark_confs)
    return DataLoader(acon).execute()


def execute_reconciliation(acon: dict) -> dict:
    """Reconcile a current dataset against a truth dataset.

    Reference ``engine.py:56-82`` / ``algorithms/reconciliator.py``.
    Raises ``ReconciliationFailedException`` on yellow/red threshold breach;
    returns the per-metric diff status on success.
    """
    from lakehouse_engine_spark.algorithms.reconciliator import Reconciliator

    return Reconciliator(acon).execute()


def execute_dq_validation(
    acon: dict,
    collect_engine_usage: Optional[str] = None,
    spark_confs: Optional[dict] = None,
) -> Any:
    """Run data-quality validation at rest (reference ``engine.py:85-113``)."""
    from lakehouse_engine_spark.algorithms.dq_validator import DQValidator
    from lakehouse_engine_spark.utils.engine_usage import store_engine_usage

    store_engine_usage(acon, "execute_dq_validation", collect_engine_usage, spark_confs)
    return DQValidator(acon).execute()


def execute_sensor(acon: dict) -> bool:
    """Check if an upstream has new data (reference ``engine.py:194-217``)."""
    from lakehouse_engine_spark.algorithms.sensor import Sensor

    return Sensor(acon).execute()


def execute_gab(acon: dict) -> None:
    """Run the Gold Asset Builder cadence aggregator (reference ``engine.py:452-476``)."""
    from lakehouse_engine_spark.algorithms.gab import GAB

    GAB(acon).execute()


def update_sensor_status(
    sensor_id: str,
    control_db_table_name: str,
    status: str = "PROCESSED_NEW_DATA",
    assets: Optional[list] = None,
) -> None:
    """Mark a sensor's acquired data as processed (reference ``engine.py:220-243``)."""
    from lakehouse_engine_spark.algorithms.sensor import update_sensor_status as _upd

    _upd(sensor_id, control_db_table_name, status, assets)


def execute_sensor_heartbeat(acon: dict, job_runner: Any = None) -> list:
    """Run the heartbeat sensor fleet for one source (reference ``engine.py:220-269``).

    Returns the sensor ids that acquired new data.
    """
    from lakehouse_engine_spark.algorithms.heartbeat import Heartbeat

    return Heartbeat(acon, job_runner=job_runner).execute()


def trigger_heartbeat_sensor_jobs(acon: dict, job_runner: Any = None) -> list:
    """Trigger downstream jobs whose heartbeat dependencies are satisfied
    (reference ``engine.py:272-281``). Returns the triggered job ids.
    """
    from lakehouse_engine_spark.algorithms.heartbeat import Heartbeat

    return Heartbeat(acon, job_runner=job_runner).trigger_jobs()


def manage_table(
    acon: dict,
    collect_engine_usage: Optional[str] = None,
    spark_confs: Optional[dict] = None,
) -> Any:
    """Execute a table-management operation (reference ``engine.py:116-140``)."""
    from lakehouse_engine_spark.core.table_manager import TableManager
    from lakehouse_engine_spark.utils.engine_usage import store_engine_usage

    store_engine_usage(acon, "manage_table", collect_engine_usage, spark_confs)
    return TableManager(acon).execute()


def manage_files(acon: dict, client: Any = None) -> Any:
    """Execute a file-management operation (reference ``engine.py:143-160``).

    ``client`` injects an object-store client (tests, non-AWS S3
    endpoints); ACONs naming a ``bucket`` route to the object-store
    backend, others to POSIX paths."""
    from lakehouse_engine_spark.core.file_manager import FileManager

    return FileManager(acon, client=client).execute()


def execute_manager(acon: Any) -> None:
    """Execute a list of manager ACONs in one call (reference
    ``engine.py:140-167``). Each entry must carry ``manager: table|file``."""
    from lakehouse_engine_spark.core.file_manager import FileManager
    from lakehouse_engine_spark.core.table_manager import TableManager

    acon_list = acon if isinstance(acon, list) else [acon]
    for entry in acon_list:
        manager = entry.get("manager")
        if manager == "file":
            FileManager(entry).execute()
        elif manager == "table":
            TableManager(entry).execute()
        else:
            raise ValueError(f"Manager {manager} not recognized.")


def execute_heartbeat_sensor_data_feed(
    heartbeat_sensor_data_feed_path: str,
    heartbeat_sensor_control_table: str,
) -> None:
    """Upsert heartbeat control-table rows from a CSV feed
    (reference ``engine.py:284-300``)."""
    from lakehouse_engine_spark.algorithms.heartbeat import Heartbeat

    Heartbeat.heartbeat_sensor_control_table_data_feed(
        heartbeat_sensor_data_feed_path, heartbeat_sensor_control_table
    )


def update_heartbeat_sensor_status(
    heartbeat_sensor_control_table: str,
    sensor_table: str,
    job_id: str,
) -> None:
    """Mark a triggered heartbeat job COMPLETED and its engine sensors
    PROCESSED_NEW_DATA (reference ``engine.py:303-323``)."""
    from lakehouse_engine_spark.algorithms.heartbeat import Heartbeat

    Heartbeat.update_heartbeat_sensor_completion_status(
        heartbeat_sensor_control_table, sensor_table, job_id
    )


def generate_sensor_query(
    sensor_id: str,
    filter_exp: Optional[str] = None,
    control_db_table_name: Optional[str] = None,
    upstream_key: Optional[str] = None,
    upstream_value: Optional[str] = None,
    upstream_table_name: Optional[str] = None,
) -> str:
    """Generate a sensor preprocess query (reference ``engine.py:360-406``).

    With ``filter_exp``: watermark-style new-data query with
    ``?upstream_key``/``?upstream_value`` placeholder resolution against the
    control table. Without: the sensor-on-sensor CDF query.
    """
    from lakehouse_engine_spark.algorithms.sensor import (
        generate_filter_exp_query,
        generate_sensor_table_preprocess_query,
    )

    if filter_exp:
        return generate_filter_exp_query(
            sensor_id=sensor_id,
            filter_exp=filter_exp,
            control_db_table_name=control_db_table_name,
            upstream_key=upstream_key,
            upstream_value=upstream_value,
            upstream_table_name=upstream_table_name,
        )
    return generate_sensor_table_preprocess_query(sensor_id=sensor_id)


def generate_sensor_sap_logchain_query(
    chain_id: str,
    dbtable: str = "SAPPHA.RSPCLOGCHAIN",
    status: str = "G",
    engine_table_name: str = "sensor_new_data",
) -> str:
    """Generate the SAP process-chain status sensor query
    (reference ``engine.py:409-435``)."""
    from lakehouse_engine_spark.algorithms.sensor import (
        generate_sensor_sap_logchain_query as _gen,
    )

    return _gen(
        chain_id=chain_id,
        dbtable=dbtable,
        status=status,
        engine_table_name=engine_table_name,
    )


def send_notification(args: dict, transport: Any = None) -> None:
    """Render and send a notification (reference ``engine.py:438-449``).

    ``transport`` optionally injects the delivery callable (tests/custom
    channels); default resolves to SMTP when ``server`` is set, else logs.
    """
    from lakehouse_engine_spark.core.definitions import TerminatorSpec
    from lakehouse_engine_spark.terminators.notifiers import NotifierFactory

    notifier = NotifierFactory.get_notifier(
        spec=TerminatorSpec(function="notify", args=args), transport=transport
    )
    notifier.create_notification()
    notifier.send_notification()


__all__ = [
    "ExecEnv",
    "load_data",
    "execute_reconciliation",
    "execute_dq_validation",
    "execute_sensor",
    "update_sensor_status",
    "execute_sensor_heartbeat",
    "trigger_heartbeat_sensor_jobs",
    "execute_gab",
    "manage_table",
    "manage_files",
    "execute_manager",
    "execute_heartbeat_sensor_data_feed",
    "update_heartbeat_sensor_status",
    "generate_sensor_query",
    "generate_sensor_sap_logchain_query",
    "send_notification",
]

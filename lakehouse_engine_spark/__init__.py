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


def load_data(acon: dict, collect_engine_usage: Optional[str] = None) -> Optional[dict]:
    """Load data according to an ACON (reference ``engine.py:29-53``).

    Runs the DataLoader algorithm: read → transform → data quality → write →
    terminate. Returns ``{spec_id: DataFrame}`` when an output spec uses the
    ``dataframe`` format, else ``None``.
    """
    from lakehouse_engine_spark.algorithms.data_loader import DataLoader

    return DataLoader(acon).execute()


def execute_reconciliation(acon: dict) -> dict:
    """Reconcile a current dataset against a truth dataset.

    Reference ``engine.py:56-82`` / ``algorithms/reconciliator.py``.
    Raises ``ReconciliationFailedException`` on yellow/red threshold breach;
    returns the per-metric diff status on success.
    """
    from lakehouse_engine_spark.algorithms.reconciliator import Reconciliator

    return Reconciliator(acon).execute()


def execute_dq_validation(acon: dict) -> Any:
    """Run data-quality validation at rest (reference ``engine.py:85-113``)."""
    from lakehouse_engine_spark.algorithms.dq_validator import DQValidator

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


def manage_table(acon: dict) -> Any:
    """Execute a table-management operation (reference ``engine.py:116-140``)."""
    from lakehouse_engine_spark.core.table_manager import TableManager

    return TableManager(acon).execute()


def manage_files(acon: dict) -> Any:
    """Execute a file-management operation (reference ``engine.py:143-160``)."""
    from lakehouse_engine_spark.core.file_manager import FileManager

    return FileManager(acon).execute()


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
]

"""Heartbeat fleet tests: sensing → dependency-gated triggering → completion.

Models the reference's heartbeat feature tests
(``tests/feature/heartbeat_sensor/`` there) on a parquet control table and
file upstreams.
"""

from __future__ import annotations

import os

import pytest

from lakehouse_engine_spark import execute_sensor_heartbeat, trigger_heartbeat_sensor_jobs
from lakehouse_engine_spark.algorithms.heartbeat import Heartbeat
from lakehouse_engine_spark.core.definitions import HeartbeatStatus

CONTROL_COLS = (
    "sensor_source string, sensor_id string, asset_description string, "
    "upstream_key string, preprocess_query string, "
    "latest_event_fetched_timestamp timestamp, trigger_job_id string, "
    "trigger_job_name string, status string, status_change_timestamp timestamp, "
    "job_start_timestamp timestamp, job_end_timestamp timestamp, "
    "job_state string, dependency_flag string, sensor_read_type string"
)


def _row(sensor_id, job_id, dep="FALSE", status=None, state="UNPAUSED"):
    return (
        "file_upstream", sensor_id, f"asset_{sensor_id}", None, None, None,
        job_id, f"job_{job_id}", status, None, None, None, state, dep, "batch",
    )


@pytest.fixture()
def hb_env(spark, sf_dir, tmp_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS hb_db")
    up_a = os.path.join(tmp_dir, "up_a")
    up_b = os.path.join(tmp_dir, "up_b")
    src = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    src.write.mode("overwrite").parquet(up_a)
    src.write.mode("overwrite").parquet(up_b)
    control = spark.createDataFrame(
        [
            _row(up_a, "100"),
            _row(up_b, "200", dep="TRUE"),
            _row(up_a, "200", dep="TRUE"),
        ],
        CONTROL_COLS,
    )
    control.write.mode("overwrite").saveAsTable("hb_db.heartbeat_control")
    acon = {
        "sensor_source": "file_upstream",
        "data_format": "parquet",
        "heartbeat_sensor_db_table": "hb_db.heartbeat_control",
        "lakehouse_engine_sensor_db_table": os.path.join(tmp_dir, "sensor_control"),
        "base_checkpoint_location": os.path.join(tmp_dir, "ckpt"),
    }
    yield acon
    spark.sql("DROP TABLE IF EXISTS hb_db.heartbeat_control")


def test_heartbeat_senses_and_triggers(spark, hb_env):
    acquired = execute_sensor_heartbeat(hb_env)
    assert len(acquired) == 3

    statuses = {
        (r["sensor_id"], r["trigger_job_id"]): r["status"]
        for r in spark.table("hb_db.heartbeat_control").collect()
    }
    assert all(s == HeartbeatStatus.NEW_EVENT_AVAILABLE.value for s in statuses.values())

    fired = []
    triggered = trigger_heartbeat_sensor_jobs(
        hb_env, job_runner=lambda j: (fired.append(j) or f"run-{j}", None)
    )
    # job 100 independent; job 200's two dependency rows share one status
    assert sorted(triggered) == ["100", "200"] == sorted(fired)
    after = {
        r["trigger_job_id"]: r["status"]
        for r in spark.table("hb_db.heartbeat_control").collect()
    }
    assert set(after.values()) == {HeartbeatStatus.IN_PROGRESS.value}


def test_heartbeat_dependency_blocks_partial_job(spark, hb_env):
    execute_sensor_heartbeat(hb_env)
    # regress one dependency row of job 200 → statuses diverge → blocked
    spark.sql(
        "SELECT * FROM hb_db.heartbeat_control"
    ).createOrReplaceTempView("hb_snap")
    hb = Heartbeat(hb_env)
    control = spark.table("hb_db.heartbeat_control")
    from pyspark.sql import functions as F

    divergent = control.withColumn(
        "status",
        F.when(
            (F.col("trigger_job_id") == "200") & F.col("sensor_id").endswith("up_b"),
            F.lit(HeartbeatStatus.COMPLETED.value),
        ).otherwise(F.col("status")),
    )
    hb._merge_control(divergent)
    assert hb.jobs_to_trigger() == ["100"]


def test_heartbeat_completion_roundtrip(spark, hb_env):
    execute_sensor_heartbeat(hb_env)
    trigger_heartbeat_sensor_jobs(hb_env)
    hb = Heartbeat(hb_env)
    hb.update_completion_status("100")
    rows = spark.table("hb_db.heartbeat_control").filter("trigger_job_id = '100'").collect()
    assert all(r["status"] == HeartbeatStatus.COMPLETED.value for r in rows)
    assert all(r["job_end_timestamp"] is not None for r in rows)
    # COMPLETED rows become active again → sensed again only if new data;
    # checkpoint already consumed the files, so no new event surfaces
    acquired = execute_sensor_heartbeat(hb_env)
    assert all(not s.startswith("up_a_100") for s in acquired)


def test_heartbeat_paused_rows_ignored(spark, hb_env, tmp_dir):
    from pyspark.sql import functions as F

    hb = Heartbeat(hb_env)
    control = spark.table("hb_db.heartbeat_control")
    hb._merge_control(control.withColumn("job_state", F.lit("PAUSED")))
    assert execute_sensor_heartbeat(hb_env) == []

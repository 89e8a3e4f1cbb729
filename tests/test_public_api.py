"""Public engine API parity — the reference's 16 ``engine.py`` functions.

Covers the thin entry points added for parity: ``execute_manager``,
``generate_sensor_query``, ``generate_sensor_sap_logchain_query``,
``send_notification`` (+ failure-notification hook), and the heartbeat
table-name entry points (reference ``engine.py:140-449``).
"""

from __future__ import annotations

import os

import pytest

import lakehouse_engine_spark as eng
from lakehouse_engine_spark.core.definitions import TerminatorSpec
from lakehouse_engine_spark.terminators.notifiers import (
    NotifierConfigException,
    NotifierFactory,
    NotifierNotFoundException,
)


def test_public_surface_matches_reference():
    """Every reference engine.py function has a same-named callable."""
    for fn in [
        "load_data",
        "execute_reconciliation",
        "execute_dq_validation",
        "manage_table",
        "execute_manager",
        "manage_files",
        "execute_sensor",
        "execute_sensor_heartbeat",
        "trigger_heartbeat_sensor_jobs",
        "execute_heartbeat_sensor_data_feed",
        "update_heartbeat_sensor_status",
        "update_sensor_status",
        "generate_sensor_query",
        "generate_sensor_sap_logchain_query",
        "send_notification",
        "execute_gab",
    ]:
        assert callable(getattr(eng, fn)), fn


def test_generate_sensor_query_filter_exp_no_control():
    q = eng.generate_sensor_query(sensor_id="s1", filter_exp="col_a > 1")
    assert q == (
        "SELECT COUNT(1) as count FROM sensor_new_data "
        "WHERE col_a > 1 HAVING COUNT(1) > 0"
    )


def test_generate_sensor_query_with_control_table(spark, tmp_dir):
    control = os.path.join(tmp_dir, "control")
    # no control row yet → default watermark value
    q = eng.generate_sensor_query(
        sensor_id="s1",
        filter_exp="?upstream_key > '?upstream_value'",
        control_db_table_name=control,
        upstream_key="load_date",
    )
    assert "max(load_date) as UPSTREAM_VALUE" in q
    assert "load_date > '-2147483647'" in q
    # upstream_key required alongside a control table
    with pytest.raises(ValueError):
        eng.generate_sensor_query(
            sensor_id="s1", filter_exp="x > 1", control_db_table_name=control
        )


def test_generate_sensor_query_sensor_on_sensor():
    q = eng.generate_sensor_query(sensor_id="s9")
    assert "_change_type in ('insert', 'update_postimage')" in q
    assert "sensor_id = 's9'" in q
    assert "status = 'PROCESSED_NEW_DATA'" in q


def test_generate_sensor_sap_logchain_query():
    q = eng.generate_sensor_sap_logchain_query(chain_id="CHAIN1")
    assert q.startswith("WITH sensor_new_data AS (")
    assert "UPPER(CHAIN_ID) = UPPER('CHAIN1')" in q
    assert "UPPER(ANALYZED_STATUS) = UPPER('G')" in q
    assert "SAPPHA.RSPCLOGCHAIN" in q
    with pytest.raises(ValueError):
        eng.generate_sensor_sap_logchain_query(chain_id="")


def test_send_notification_renders_template_via_transport():
    sent = []
    eng.send_notification(
        args={
            "type": "email",
            "template": "failure_notification_email",
            "from": "a@b.c",
            "to": ["d@e.f"],
            "exception": "boom",
            "args": {"job_name": "nightly", "workspace_id": "ws1", "exception": "boom"},
        },
        transport=sent.append,
    )
    assert len(sent) == 1
    assert sent[0]["subject"] == "Service Failure"
    assert "nightly" in sent[0]["message"] and "boom" in sent[0]["message"]


def test_send_notification_explicit_message_rendering():
    sent = []
    eng.send_notification(
        args={
            "type": "email",
            "subject": "s {{ x }}",
            "message": "m {{ x }}",
            "args": {"x": "42"},
        },
        transport=sent.append,
    )
    assert sent[0]["subject"] == "s 42" and sent[0]["message"] == "m 42"


def test_notifier_error_paths():
    with pytest.raises(NotifierNotFoundException):
        NotifierFactory.get_notifier(TerminatorSpec(function="notify", args={"type": "sms"}))
    n = NotifierFactory.get_notifier(TerminatorSpec(function="notify", args={"type": "email"}))
    with pytest.raises(NotifierConfigException):
        n.create_notification()


def test_failure_notification_hook_on_data_loader(spark, tmp_dir, monkeypatch):
    """A failing load with an on_failure notify terminator emits the rendered
    failure notification (reference data_loader.py:241-243)."""
    sent = []
    monkeypatch.setattr(
        "lakehouse_engine_spark.terminators.notifiers.EmailNotifier.send_notification",
        lambda self: sent.append(self.notification),
    )
    acon = {
        "input_specs": [
            {"spec_id": "src", "read_type": "batch", "data_format": "csv",
             "location": os.path.join(tmp_dir, "does-not-exist")}
        ],
        "output_specs": [
            {"spec_id": "sink", "input_id": "src", "write_type": "overwrite",
             "data_format": "parquet", "location": os.path.join(tmp_dir, "out")}
        ],
        "terminate_specs": [
            {"function": "notify",
             "args": {"type": "email", "template": "failure_notification_email"}}
        ],
    }
    with pytest.raises(Exception):
        eng.load_data(acon)
    assert len(sent) == 1
    assert "failed with the exception" in sent[0]["message"]


def test_execute_manager_dispatch(spark, tmp_dir):
    out = os.path.join(tmp_dir, "f.txt")
    with open(out, "w") as f:
        f.write("x")
    dst = os.path.join(tmp_dir, "copy.txt")
    eng.execute_manager(
        [
            {"manager": "table", "function": "execute_sql", "sql": "SELECT 1"},
            {
                "manager": "file",
                "function": "copy_objects",
                "source": out,
                "destination": dst,
            },
        ]
    )
    assert os.path.exists(dst)
    with pytest.raises(ValueError):
        eng.execute_manager([{"manager": "nope"}])


def test_heartbeat_table_entrypoints_exist():
    from lakehouse_engine_spark.algorithms.heartbeat import Heartbeat

    assert callable(Heartbeat.heartbeat_sensor_control_table_data_feed)
    assert callable(Heartbeat.update_heartbeat_sensor_completion_status)


def test_readme_curation_pipeline_end_to_end(spark):
    """The README's flagship corpus-curation ACON, run whole: quality gate →
    corpus LM score → quantile prune → exact dedup → MinHash near-dedup →
    cross-corpus dedup against a previous round → deterministic global
    shuffle. Guards that the operators compose through one ACON and that
    each pruning stage only ever shrinks the corpus."""
    docs = "/root/testdata/sf0.001/documents.parquet"
    n_docs = spark.read.parquet(docs).count()
    res = eng.load_data({
        "input_specs": [
            {"spec_id": "docs", "data_format": "parquet", "location": docs},
            {"spec_id": "prev_round", "data_format": "parquet", "location": docs},
        ],
        "transform_specs": [
            # previous round = a disjoint slice of the corpus, so the
            # cross-dedup has both hits and misses
            {"spec_id": "prev", "input_id": "prev_round", "transformers": [
                {"function": "expression_filter", "args": {"exp": "doc_id % 7 = 0"}},
            ]},
            {"spec_id": "curated", "input_id": "docs", "transformers": [
                {"function": "text_quality_prune",
                 "args": {"min_words": 3, "mode": "drop"}},
                {"function": "text_lm_score", "args": {"top_v": 1000}},
                {"function": "quantile_prune",
                 "args": {"score_col": "avg_logprob", "keep_frac": 0.8}},
                {"function": "dedup_exact",
                 "args": {"key_cols": ["text"], "id_col": "doc_id", "normalize": True}},
                {"function": "dedup_minhash_lsh",
                 "args": {"num_hashes": 12, "bands": 4, "shingle_size": 3}},
                {"function": "dedup_cross_minhash_with", "args": {"other": "prev"}},
                {"function": "global_shuffle", "args": {"shards": 16}},
            ]},
        ],
        "output_specs": [
            {"spec_id": "o", "input_id": "curated", "data_format": "dataframe"},
        ],
    })
    out = res["o"]
    rows = out.collect()
    assert 0 < len(rows) < n_docs
    # the cross-dedup removed the docs shared with the previous round
    assert all(r["doc_id"] % 7 != 0 for r in rows)
    # global shuffle contract: shard assignment + dense within-shard position
    assert {"shard", "position"} <= set(out.columns)
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(len(pos))), f"shard {shard} not dense"

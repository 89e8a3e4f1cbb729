"""SAP BW/B4 extraction-query planning tests (pure SQL generation)."""

import re

import pytest

from lakehouse_engine_spark.utils import sap_extraction as sap


def _norm(q: str) -> str:
    return re.sub(r"\s+", " ", q).strip()


def test_bw_init_query_with_tech_cols():
    cfg = sap.SAPBWConfig(
        dbtable="SAPPHA.DSO1",
        extraction_type="init",
        extraction_timestamp="20240601120000",
        partition_column="RECORD",
    )
    q, pred = sap.bw_init_query(cfg)
    n = _norm(q)
    assert "'0' AS request" in n
    assert "CAST(20240601120000 AS DECIMAL(15,0)) AS actrequest_timestamp" in n
    assert "'0' AS datapakid, 0 AS partno, 0 AS record" in n
    assert "extraction_start_timestamp FROM SAPPHA.DSO1 t" in n
    assert _norm(pred) == "(SELECT DISTINCT(RECORD) FROM SAPPHA.DSO1 t)"


def test_bw_init_query_without_tech_cols():
    cfg = sap.SAPBWConfig(
        dbtable="SAPPHA.DSO1",
        extraction_timestamp="20240601120000",
        include_changelog_tech_cols=False,
        partition_column="RECORD",
    )
    q, _ = sap.bw_init_query(cfg)
    assert "datapakid" not in q
    assert "AS actrequest_timestamp" in q


def test_bw_init_write_optimised_requires_changelog_match():
    cfg = sap.SAPBWConfig(
        dbtable="SAPPHA.WODSO",
        get_timestamp_from_act_request=True,
        partition_column="RECORD",
    )
    with pytest.raises(ValueError):
        sap.bw_init_query(cfg)
    cfg.changelog_table = "SAPPHA.WODSO"
    q, _ = sap.bw_init_query(cfg)
    n = _norm(q)
    assert "JOIN SAPPHA.RSODSACTREQ AS act_req" in n
    assert "act_req.odsobject = 'WODSO'" in n
    assert "operation = 'A' AND status = '0'" in n


def test_bw_delta_query_bounds_and_join():
    cfg = sap.SAPBWConfig(
        dbtable="SAPPHA.DSO1",
        extraction_timestamp="20240601120000",
        partition_column="RECORD",
        extra_cols_act_request="act_req.col1 AS c1",
    )
    q, pred = sap.bw_delta_query(cfg, "111", "222")
    n = _norm(q)
    assert "FROM SAPPHA.DSO1_cl AS changelog_tbl" in n  # derived changelog
    assert "changelog_tbl.request = act_req.actrequest" in n
    assert "act_req.timestamp > 111" in n and "act_req.timestamp <= 222" in n
    assert "act_req.odsobject = 'DSO1'" in n
    assert ", act_req.col1 AS c1" in n
    assert _norm(pred).startswith("(SELECT DISTINCT(RECORD) FROM SAPPHA.DSO1_cl")


def test_bw_changelog_lookup_query():
    cfg = sap.SAPBWConfig(dbtable="SAPPHA.DSO1", logsys="BWP")
    q = _norm(sap.bw_changelog_lookup_query(cfg))
    assert "FROM SAPPHA.RSTSODS o" in q
    assert "p.slogsys = 'BWP' AND p.rlogsys = 'BWP'" in q
    assert "o.ODSNAME = '8DSO1_' || p.tsprefix" in q
    assert "USERAPP = 'CHANGELOG' AND VERSION = '000'" in q
    cfg.logsys = None
    assert "p.slogsys = p.rlogsys" in sap.bw_changelog_lookup_query(cfg)


def test_bw_max_timestamp_query():
    cfg = sap.SAPBWConfig(dbtable="SAPPHA.DSO1")
    q = _norm(sap.bw_max_timestamp_query(cfg))
    assert q.startswith("(SELECT COALESCE(MAX(TIMESTAMP), 197000000000000)")
    assert "WHERE odsobject = 'DSO1'" in q


def test_b4_request_status_filter_by_adso_type():
    aq = sap.SAPB4Config(dbtable="SAPHANADB.ADSO1", adso_type="AQ", data_target="T1")
    f = _norm(sap.b4_request_status_filter(aq))
    assert "STORAGE = 'AQ'" in f and "REQUEST_STATUS IN ('GG', 'GR')" in f
    assert "UPPER(DATATARGET) = UPPER('T1')" in f

    cl = sap.SAPB4Config(dbtable="SAPHANADB.ADSO1", adso_type="CL", data_target="T1")
    f = _norm(sap.b4_request_status_filter(cl))
    assert "STORAGE = 'AT'" in f and "REQUEST_STATUS IN ('GG')" in f

    bad = sap.SAPB4Config(dbtable="x", adso_type="XX")
    with pytest.raises(ValueError):
        sap.b4_request_status_filter(bad)

    custom = sap.SAPB4Config(
        dbtable="x", adso_type="AQ", request_status_tbl_filter="1 = 1"
    )
    assert sap.b4_request_status_filter(custom) == "1 = 1"


def test_b4_delta_query_sources_by_adso_type():
    aq = sap.SAPB4Config(
        dbtable="SAPHANADB.ADSO1",
        adso_type="AQ",
        data_target="T1",
        extraction_timestamp="20240601120000",
        partition_column="RECORD",
    )
    q, _ = sap.b4_delta_query(aq, "1", "2")
    n = _norm(q)
    # AQ deltas read the active table itself
    assert "FROM SAPHANADB.ADSO1 AS tbl" in n
    assert "tbl.reqtsn = req.REQUEST_TSN" in n
    assert "req.REQUEST_TSN > 1" in n and "req.REQUEST_TSN <= 2" in n

    cl = sap.SAPB4Config(
        dbtable="SAPHANADB.ADSO1",
        adso_type="CL",
        data_target="T1",
        extraction_timestamp="20240601120000",
        partition_column="RECORD",
    )
    q, _ = sap.b4_delta_query(cl, "1", "2")
    assert "FROM SAPHANADB.ADSO1_cl AS tbl" in _norm(q)


def test_b4_init_query_tech_cols():
    cfg = sap.SAPB4Config(
        dbtable="SAPHANADB.ADSO1",
        extraction_timestamp="20240601120000",
        include_changelog_tech_cols=True,
        partition_column="RECORD",
    )
    q, pred = sap.b4_init_query(cfg)
    n = _norm(q)
    assert "20240601120000000000000 AS reqtsn" in n
    assert "'0' AS datapakid, 0 AS record" in n
    assert _norm(pred) == "(SELECT DISTINCT(RECORD) FROM SAPHANADB.ADSO1 t)"


def test_b4_max_timestamp_query():
    cfg = sap.SAPB4Config(dbtable="SAPHANADB.ADSO1", adso_type="AQ", data_target="T1")
    q = _norm(sap.b4_max_timestamp_query(cfg))
    assert q.startswith(
        "(SELECT COALESCE(MAX(REQUEST_TSN), 1970000000000000000000) AS timestamp"
    )
    assert "FROM SAPHANADB.RSPMREQUEST" in q

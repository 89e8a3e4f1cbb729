"""SAP BW / SAP B4 extraction planning — query generation over JDBC.

Reference parity: ``utils/extraction/sap_bw_extraction_utils.py:99-380`` and
``utils/extraction/sap_b4_extraction_utils.py:18-280``. SAP extraction is
"JDBC plus generated SQL": an *init* load selects the whole active table
stamped with extraction timestamps; a *delta* load joins the changelog
(BW DSO) or changelog/active table (B4 ADSO, type CL/AQ) against the
activation-requests (RSODSACTREQ) / request-status (RSPMREQUEST) table,
bounded by (last-loaded timestamp, source max timestamp]. Parallelism comes
from the standard JDBC predicate mechanism — every generated query also has
a companion ``SELECT DISTINCT(partition_column)`` query.

Everything here is pure string planning (unit-testable without a SAP
system); the reader glues it to the JDBC source. Queries are wrapped in
parentheses so Spark's ``dbtable`` option treats them as subqueries.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

EXTRACTION_TYPE_INIT = "init"
EXTRACTION_TYPE_DELTA = "delta"


@dataclass
class SAPBWConfig:
    """SAP BW DSO extraction settings (reference ``sap_bw_extraction_utils.py:18-77``)."""

    dbtable: str
    extraction_type: str = EXTRACTION_TYPE_DELTA
    extraction_timestamp: str = ""  # yyyyMMddHHmmss; caller stamps it
    changelog_table: Optional[str] = None
    act_request_table: str = "SAPPHA.RSODSACTREQ"
    request_col_name: str = "actrequest"
    act_req_join_condition: Optional[str] = None
    odsobject: Optional[str] = None
    include_changelog_tech_cols: bool = True
    extra_cols_act_request: Optional[str] = None
    get_timestamp_from_act_request: bool = False
    sap_bw_schema: Optional[str] = "SAPPHA"
    partition_column: Optional[str] = None
    min_timestamp: Optional[str] = None
    max_timestamp: Optional[str] = None
    default_max_timestamp: str = "197000000000000"
    latest_timestamp_input_col: str = "actrequest_timestamp"
    ods_prefix: str = "8"
    logsys: Optional[str] = None


@dataclass
class SAPB4Config:
    """SAP B4 ADSO extraction settings (reference ``sap_b4_extraction_utils.py:27-80``)."""

    dbtable: str
    adso_type: str = "AQ"  # AQ (active-table deltas) or CL (changelog deltas)
    extraction_type: str = EXTRACTION_TYPE_DELTA
    extraction_timestamp: str = ""
    changelog_table: Optional[str] = None
    data_target: Optional[str] = None
    request_status_tbl: str = "SAPHANADB.RSPMREQUEST"
    request_col_name: str = "REQUEST_TSN"
    act_req_join_condition: Optional[str] = None
    include_changelog_tech_cols: bool = False
    extra_cols_req_status_tbl: Optional[str] = None
    request_status_tbl_filter: Optional[str] = None
    partition_column: Optional[str] = None
    min_timestamp: Optional[str] = None
    max_timestamp: Optional[str] = None
    default_max_timestamp: str = "1970000000000000000000"
    default_min_timestamp: str = "1970000000000000000000"
    latest_timestamp_input_col: str = "REQTSN"


def derive_odsobject(dbtable: str) -> str:
    """Object name = table part of ``schema.table`` (``sap_bw_extraction_utils.py:175-193``)."""
    return dbtable.split(".")[-1]


def bw_changelog_table(cfg: SAPBWConfig) -> str:
    """Changelog table when known locally: the explicit one, else ``<dbtable>_cl``.

    The RSTSODS-based runtime derivation needs a SAP roundtrip — see
    :func:`bw_changelog_lookup_query`.
    """
    return cfg.changelog_table or f"{cfg.dbtable}_cl"


def bw_changelog_lookup_query(cfg: SAPBWConfig) -> str:
    """Query that resolves the changelog table name inside SAP
    (``sap_bw_extraction_utils.py:99-172``): RSTSODS ⋈ RSBASIDOC on the
    logsys condition, matching ``<prefix><odsobject>_<tsprefix>``."""
    schema = f"{cfg.sap_bw_schema}." if cfg.sap_bw_schema else ""
    if cfg.logsys:
        logsys_cond = f"p.slogsys = '{cfg.logsys}' AND p.rlogsys = '{cfg.logsys}'"
    else:
        logsys_cond = "p.slogsys = p.rlogsys"
    odsobject = cfg.odsobject or derive_odsobject(cfg.dbtable)
    return (
        f"(SELECT ODSNAME_TECH FROM {schema}RSTSODS o "
        f"JOIN {schema}RSBASIDOC p ON {logsys_cond} "
        f"AND o.ODSNAME = '{cfg.ods_prefix}{odsobject}_' || p.tsprefix "
        f"AND USERAPP = 'CHANGELOG' AND VERSION = '000')"
    )


def bw_max_timestamp_query(cfg: SAPBWConfig) -> str:
    """Source-side max activation timestamp for the delta upper bound."""
    odsobject = cfg.odsobject or derive_odsobject(cfg.dbtable)
    return (
        f"(SELECT COALESCE(MAX(TIMESTAMP), {cfg.default_max_timestamp}) AS timestamp "
        f"FROM {cfg.act_request_table} "
        f"WHERE odsobject = '{odsobject}' AND operation = 'A' AND status = '0')"
    )


def _predicates_query(partition_column: str, source: str) -> str:
    return f"(SELECT DISTINCT({partition_column}) {source}"


def bw_init_query(cfg: SAPBWConfig) -> Tuple[str, str]:
    """Init-load query + its distinct-partition companion
    (``sap_bw_extraction_utils.py:208-286``)."""
    ts = cfg.extraction_timestamp
    if cfg.get_timestamp_from_act_request:
        if cfg.dbtable != bw_changelog_table(cfg) and cfg.dbtable != (cfg.changelog_table or ""):
            raise ValueError(
                "get_timestamp_from_act_request applies only to write-optimised "
                "DSOs (dbtable == changelog_table)"
            )
        odsobject = cfg.odsobject or derive_odsobject(cfg.dbtable)
        extraction = (
            f"(SELECT t.*, act_req.timestamp AS actrequest_timestamp, "
            f"CAST({ts} AS DECIMAL(15,0)) AS extraction_start_timestamp "
            f"FROM {cfg.dbtable} t "
            f"JOIN {cfg.act_request_table} AS act_req "
            f"ON t.request = act_req.{cfg.request_col_name} "
            f"WHERE act_req.odsobject = '{odsobject}' "
            f"AND operation = 'A' AND status = '0')"
        )
    else:
        if cfg.include_changelog_tech_cols:
            tech = (
                f"'0' AS request, "
                f"CAST({ts} AS DECIMAL(15,0)) AS actrequest_timestamp, "
                f"'0' AS datapakid, 0 AS partno, 0 AS record, "
            )
        else:
            tech = f"CAST({ts} AS DECIMAL(15,0)) AS actrequest_timestamp, "
        extraction = (
            f"(SELECT t.*, {tech}"
            f"CAST({ts} AS DECIMAL(15,0)) AS extraction_start_timestamp "
            f"FROM {cfg.dbtable} t)"
        )
    predicates = f"(SELECT DISTINCT({cfg.partition_column}) FROM {cfg.dbtable} t)"
    return extraction, predicates


def bw_delta_query(cfg: SAPBWConfig, min_timestamp: str, max_timestamp: str) -> Tuple[str, str]:
    """Delta-load query: changelog ⋈ activation-requests bounded by
    (min, max] (``sap_bw_extraction_utils.py:287-380``)."""
    odsobject = cfg.odsobject or derive_odsobject(cfg.dbtable)
    join_cond = (
        cfg.act_req_join_condition
        or f"changelog_tbl.request = act_req.{cfg.request_col_name}"
    )
    base = (
        f"FROM {bw_changelog_table(cfg)} AS changelog_tbl "
        f"JOIN {cfg.act_request_table} AS act_req ON {join_cond} "
        f"WHERE act_req.odsobject = '{odsobject}' "
        f"AND act_req.timestamp > {min_timestamp} "
        f"AND act_req.timestamp <= {max_timestamp} "
        f"AND operation = 'A' AND status = '0')"
    )
    cols = (
        f"(SELECT changelog_tbl.*, act_req.TIMESTAMP AS actrequest_timestamp, "
        f"CAST({cfg.extraction_timestamp} AS DECIMAL(15,0)) AS extraction_start_timestamp"
    )
    if cfg.extra_cols_act_request:
        cols += f", {cfg.extra_cols_act_request}"
    return f"{cols} {base}", _predicates_query(cfg.partition_column, base)


def derive_data_target(options: dict) -> str:
    """B4 data_target from the option, or derived from ``dbtable``
    (reference ``sap_b4_extraction_utils.py:104-125``): strip quote and
    backslash characters, take the segment after the last ``/``, drop its
    first and last character (``/BIC/abtable12`` -> ``btable1``)."""
    import re as _re

    if options.get("data_target"):
        return str(options["data_target"])
    cleaned = _re.sub(r"[\"'\\\\]", "", options["dbtable"])
    return cleaned.split("/")[-1][1:-1]


def b4_request_status_filter(cfg: SAPB4Config) -> str:
    """ADSO-type-specific RSPMREQUEST filter
    (``sap_b4_extraction_utils.py:261-280``)."""
    if cfg.request_status_tbl_filter:
        return cfg.request_status_tbl_filter
    target = f"UPPER(DATATARGET) = UPPER('{cfg.data_target}')"
    if cfg.adso_type == "AQ":
        return (
            "STORAGE = 'AQ' AND REQUEST_IS_IN_PROCESS = 'N' AND "
            "LAST_OPERATION_TYPE IN ('C', 'U') AND REQUEST_STATUS IN ('GG', 'GR') "
            f"AND {target}"
        )
    if cfg.adso_type == "CL":
        return (
            "STORAGE = 'AT' AND REQUEST_IS_IN_PROCESS = 'N' AND "
            "LAST_OPERATION_TYPE IN ('C', 'U') AND REQUEST_STATUS IN ('GG') "
            f"AND {target}"
        )
    raise ValueError(f"Unsupported ADSO type {cfg.adso_type!r}; expected AQ or CL")


def b4_max_timestamp_query(cfg: SAPB4Config) -> str:
    """Source-side max request timestamp for the delta upper bound."""
    return (
        f"(SELECT COALESCE(MAX({cfg.request_col_name}), {cfg.default_max_timestamp}) "
        f"AS timestamp FROM {cfg.request_status_tbl} "
        f"WHERE {b4_request_status_filter(cfg)})"
    )


def b4_changelog_table(cfg: SAPB4Config) -> str:
    """Delta source table: AQ reads the active table itself; CL reads the
    changelog (explicit, or ``schema.table`` → ``schema.table_cl``)."""
    if cfg.adso_type == "AQ":
        return cfg.dbtable
    return cfg.changelog_table or f"{cfg.dbtable}_cl"


def b4_init_query(cfg: SAPB4Config) -> Tuple[str, str]:
    """Init-load query + distinct-partition companion
    (``sap_b4_extraction_utils.py:126-165``)."""
    ts = cfg.extraction_timestamp
    tech = (
        f"{ts}000000000 AS reqtsn, '0' AS datapakid, 0 AS record, "
        if cfg.include_changelog_tech_cols
        else ""
    )
    extraction = (
        f"(SELECT t.*, {tech}"
        f"CAST({ts} AS DECIMAL(15,0)) AS extraction_start_timestamp "
        f"FROM {cfg.dbtable} t)"
    )
    predicates = f"(SELECT DISTINCT({cfg.partition_column}) FROM {cfg.dbtable} t)"
    return extraction, predicates


def b4_delta_query(cfg: SAPB4Config, min_timestamp: str, max_timestamp: str) -> Tuple[str, str]:
    """Delta-load query: (changelog|active) ⋈ RSPMREQUEST bounded by
    (min, max] (``sap_b4_extraction_utils.py:166-259``)."""
    join_cond = cfg.act_req_join_condition or f"tbl.reqtsn = req.{cfg.request_col_name}"
    base = (
        f"FROM {b4_changelog_table(cfg)} AS tbl "
        f"JOIN {cfg.request_status_tbl} AS req ON {join_cond} "
        f"WHERE {b4_request_status_filter(cfg)} "
        f"AND req.{cfg.request_col_name} > {min_timestamp} "
        f"AND req.{cfg.request_col_name} <= {max_timestamp})"
    )
    cols = (
        f"(SELECT tbl.*, CAST({cfg.extraction_timestamp} AS DECIMAL(15,0)) "
        f"AS extraction_start_timestamp"
    )
    if cfg.extra_cols_req_status_tbl:
        cols += f", {cfg.extra_cols_req_status_tbl}"
    return f"{cols} {base}", _predicates_query(cfg.partition_column, base)

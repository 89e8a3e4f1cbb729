"""SAP extraction parity-lite: OUR generated init/delta/predicate SQL must
equal the REFERENCE's, produced by running the reference's own
``SAPBWExtractionUtils``/``SAPB4ExtractionUtils`` (imported read-only from
``/root/reference`` — pure string planners, no SAP system involved) over the
same scenario knobs the reference's feature matrix uses
(``reference/tests/feature/test_extract_from_sap_bw.py`` /
``test_extract_from_sap_b4.py``). Comparison is whitespace/case-normalized
SQL equality — semantics, not formatting.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

from lakehouse_engine_spark.utils import sap_extraction as ours

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference repo not present"
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_ROOT)
    try:
        from lakehouse_engine.utils.extraction.sap_b4_extraction_utils import (
            SAPB4Extraction,
            SAPB4ExtractionUtils,
        )
        from lakehouse_engine.utils.extraction.sap_bw_extraction_utils import (
            SAPBWExtraction,
            SAPBWExtractionUtils,
        )
    finally:
        sys.path.remove(REF_ROOT)
    return {
        "SAPBWExtraction": SAPBWExtraction,
        "SAPBWExtractionUtils": SAPBWExtractionUtils,
        "SAPB4Extraction": SAPB4Extraction,
        "SAPB4ExtractionUtils": SAPB4ExtractionUtils,
    }


def norm(sql: str) -> str:
    """Whitespace/case-insensitive SQL normal form (the reference embeds
    indentation and a ``--# nosec`` marker in its f-strings)."""
    s = sql.replace("--# nosec", " ")
    s = re.sub(r"\s+", " ", s).strip().lower()
    s = s.replace(", ", ",").replace(" ,", ",").replace(" )", ")")
    return s


# the reference BW feature matrix's SQL-relevant knobs: the two DSO kinds x
# the partition/predicate/extra-cols/join-condition scenarios
_DSO_KINDS = [
    # (request_col_name, changelog_table, include_changelog_tech_cols)
    ("actrequest", "dummy_table_cl", True),  # extract_dso
    ("request", "dummy_table", False),  # extract_write_optimised_dso
]

_BW_SCENARIOS = [
    {"name": "no_part_col_extra_cols", "partition_column": "item",
     "extra_cols_act_request": "act_req.request as activation_request"},
    {"name": "int_part_col", "partition_column": "item"},
    {"name": "multi_extra_cols", "partition_column": "item",
     "extra_cols_act_request": "act_req.request as actrequest_request, status"},
    {"name": "str_part_col", "partition_column": '"/bic/article"'},
    {"name": "custom_join_condition", "partition_column": "item",
     "act_req_join_condition": "changelog_tbl.request = act_req.actrequest "
     "AND changelog_tbl.request = act_req.request"},
]


@pytest.mark.parametrize("req_col,cl_table,tech_cols", _DSO_KINDS,
                         ids=["dso", "write_optimised_dso"])
@pytest.mark.parametrize("scenario", _BW_SCENARIOS,
                         ids=[s["name"] for s in _BW_SCENARIOS])
def test_sap_bw_generated_sql_matches_reference(ref, scenario, req_col,
                                                cl_table, tech_cols):
    knobs = dict(
        dbtable="dummy_table",
        changelog_table=cl_table,
        odsobject="dummy_table",
        extraction_timestamp="20211004151010",
        request_col_name=req_col,
        include_changelog_tech_cols=tech_cols,
        partition_column=scenario["partition_column"],
        extra_cols_act_request=scenario.get("extra_cols_act_request"),
        act_req_join_condition=scenario.get("act_req_join_condition"),
    )
    theirs = ref["SAPBWExtractionUtils"](
        ref["SAPBWExtraction"](
            user="u", password="p", url="jdbc:x",
            min_timestamp="20211004151010",
            max_timestamp="20211104151010",
            **knobs,
        )
    )
    cfg = ours.SAPBWConfig(**knobs)

    ref_init, ref_init_pred = theirs._get_init_query()
    our_init, our_init_pred = ours.bw_init_query(cfg)
    assert norm(our_init) == norm(ref_init)
    assert norm(our_init_pred) == norm(ref_init_pred)

    ref_delta, ref_delta_pred = theirs._get_delta_query()
    our_delta, our_delta_pred = ours.bw_delta_query(
        cfg, "20211004151010", "20211104151010"
    )
    assert norm(our_delta) == norm(ref_delta)
    assert norm(our_delta_pred) == norm(ref_delta_pred)

    assert norm(ours.bw_max_timestamp_query(cfg)) == norm(
        theirs._MAX_TIMESTAMP_QUERY
    )


_B4_SCENARIOS = [
    {"name": "aq_plain", "adso_type": "AQ", "partition_column": "item"},
    {"name": "aq_extra_cols", "adso_type": "AQ", "partition_column": "item",
     "extra_cols_req_status_tbl": "req.request as status_request, req.status"},
    {"name": "cl_plain", "adso_type": "CL", "partition_column": "item"},
    {"name": "cl_custom_join", "adso_type": "CL",
     "partition_column": '"/bic/article"',
     "act_req_join_condition": "tbl.reqtsn = req.request_tsn "
     "AND tbl.reqtsn = req.request"},
]


@pytest.mark.parametrize("scenario", _B4_SCENARIOS,
                         ids=[s["name"] for s in _B4_SCENARIOS])
def test_sap_b4_generated_sql_matches_reference(ref, scenario):
    adso = scenario["adso_type"]
    changelog = "dummy_table" if adso == "AQ" else "dummy_table_cl"
    knobs = dict(
        dbtable="dummy_table",
        changelog_table=changelog,
        data_target="dummy_target",
        extraction_timestamp="20211004151010",
        include_changelog_tech_cols=(adso == "CL"),
        partition_column=scenario["partition_column"],
        extra_cols_req_status_tbl=scenario.get("extra_cols_req_status_tbl"),
        act_req_join_condition=scenario.get("act_req_join_condition"),
    )
    theirs = ref["SAPB4ExtractionUtils"](
        ref["SAPB4Extraction"](
            user="u", password="p", url="jdbc:x",
            adso_type=adso,
            min_timestamp="20211004151010000000000",
            max_timestamp="20211104151010000000000",
            **knobs,
        )
    )
    cfg = ours.SAPB4Config(adso_type=adso, **knobs)

    ref_init, ref_init_pred = theirs._get_init_query()
    our_init, our_init_pred = ours.b4_init_query(cfg)
    assert norm(our_init) == norm(ref_init)
    assert norm(our_init_pred) == norm(ref_init_pred)

    ref_delta, ref_delta_pred = theirs._get_delta_query()
    our_delta, our_delta_pred = ours.b4_delta_query(
        cfg, "20211004151010000000000", "20211104151010000000000"
    )
    assert norm(our_delta) == norm(ref_delta)
    assert norm(our_delta_pred) == norm(ref_delta_pred)

    assert norm(ours.b4_max_timestamp_query(cfg)) == norm(
        theirs._MAX_TIMESTAMP_QUERY
    )
    # the ADSO-type-specific request-status filter itself
    assert norm(ours.b4_request_status_filter(cfg)) == norm(
        theirs._B4_EXTRACTION.request_status_tbl_filter
    )


def test_sap_b4_data_target_derivation_matches_reference(ref):
    for opts in (
        {"dbtable": "/BIC/abtable12"},
        {"dbtable": '"/BIC/ASALES_AQ2"'},
        {"dbtable": "SAPHANADB./BIC/ADUMMY7"},
        {"dbtable": "/BIC/X", "data_target": "explicit_target"},
    ):
        assert ours.derive_data_target(opts) == ref[
            "SAPB4ExtractionUtils"
        ].get_data_target(opts)


def test_sap_bw_odsobject_and_changelog_lookup_match_reference(ref):
    assert ours.derive_odsobject("SAPPHA.dummy_table") == ref[
        "SAPBWExtractionUtils"
    ].get_odsobject({"dbtable": "SAPPHA.dummy_table"})
    assert ours.derive_odsobject("dummy_table") == ref[
        "SAPBWExtractionUtils"
    ].get_odsobject({"dbtable": "dummy_table"})

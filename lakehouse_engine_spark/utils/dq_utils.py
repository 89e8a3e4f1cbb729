"""PRISMA data quality — rule-table-driven DQ spec resolution.

Reference parity: ``utils/dq_utils.py:15-240`` and the ACON hookup at
``utils/acon_utils.py:210-235``. PRISMA is the reference's second DQ type:
instead of hand-writing ``dq_functions`` in the ACON, rules live in a
governance table (one row per rule: ``dq_tech_function`` + JSON
``arguments`` + meta columns like ``dq_rule_id``/``dimension``), filtered
per target table and execution point, and are compiled into the same
DQFunctionSpec list the validator path uses.

Spark-first notes: the rule table is tiny (O(#rules)) — reading and
collecting it driver-side is correct at any scale; the *data* validation it
configures still runs as one distributed aggregation pass
(``dq/dq_factory.py``). JSON argument parsing uses Python ``json`` on the
collected rows rather than ``from_json(schema_of_json(...))`` over a merged
sample — same result, no extra Spark jobs on a config table.

Portability: the reference resolves the result-sink bucket from its
packaged engine config (``configs/engine.yaml``); ours comes from the spec
key ``dq_bucket`` (falling back to the ``LAKEHOUSE_DQ_BUCKET`` env var), so
no proprietary bucket names are baked in.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

from lakehouse_engine_spark.core.definitions import DQSpecMalformedException

_LOGGER = logging.getLogger(__name__)

# Base projection for importing rules (reference ``definitions.py:733-736``).
PRISMA_BASE_PARAMETERS = ["arguments", "dq_tech_function"]

# Meta columns every PRISMA rule must carry (reference
# ``configs/engine.yaml:dq_functions_column_list``).
DQ_FUNCTIONS_COLUMN_LIST = [
    "dq_rule_id",
    "execution_point",
    "filters",
    "schema",
    "table",
    "column",
    "dimension",
]


def import_dq_rules_from_table(
    spark,
    spec: dict,
    execution_point: str,
    base_expectation_arguments: Optional[List[str]] = None,
    extra_meta_arguments: Optional[List[str]] = None,
) -> dict:
    """Compile rule-table rows into ``spec["dq_functions"]``.

    Reference ``utils/dq_utils.py:18-112``: select base + meta columns from
    ``dq_db_table`` where ``execution_point`` and ``table`` match (plus
    optional ``dq_table_extra_filters``), deduplicate on
    (dq_tech_function, arguments), and emit one function dict per rule with
    the meta columns folded under ``args["meta"]``.
    """
    base = base_expectation_arguments or PRISMA_BASE_PARAMETERS
    meta_cols = extra_meta_arguments or DQ_FUNCTIONS_COLUMN_LIST
    dq_db_table = spec["dq_db_table"]
    table_filter = spec.get("dq_table_table_filter")
    if not table_filter:
        raise DQSpecMalformedException(
            "When importing rules from a table dq_table_table_filter must be defined."
        )
    extra = (
        f" and {spec['dq_table_extra_filters']}"
        if spec.get("dq_table_extra_filters")
        else ""
    )
    fields = base + meta_cols
    rows = spark.sql(
        f"SELECT {', '.join(fields)} FROM {dq_db_table} "
        f"WHERE execution_point='{execution_point}' and table = '{table_filter}'"
        f"{extra}"
    ).collect()

    seen = set()
    dq_functions = []
    for row in rows:
        key = (row["dq_tech_function"], row["arguments"])
        if key in seen:
            _LOGGER.warning("Duplicated DQ rule dropped: %s", key)
            continue
        seen.add(key)
        args = json.loads(row["arguments"]) if row["arguments"] else {}
        args["meta"] = {c: row[c] for c in meta_cols}
        dq_functions.append(
            {
                "function": row["dq_tech_function"],
                "args": {k: v for k, v in args.items() if v is not None},
            }
        )
    spec["dq_functions"] = dq_functions
    return spec


def validate_dq_functions(
    spec: dict,
    execution_point: str = "",
    extra_meta_arguments: Optional[List[str]] = None,
) -> None:
    """Validate hand-written PRISMA dq_functions carry the full meta contract
    (reference ``utils/dq_utils.py:119-164``)."""
    if not extra_meta_arguments:
        _LOGGER.info("No extra meta parameters defined; skipping validation.")
        return
    for dq_function in spec.get("dq_functions", []):
        meta = (dq_function.get("args") or {}).get("meta")
        if not meta:
            raise DQSpecMalformedException(
                "The dq function must have a meta field containing all "
                f"the fields defined: {extra_meta_arguments}."
            )
        missing = sorted(set(extra_meta_arguments) - set(meta.keys()))
        if missing:
            raise DQSpecMalformedException(
                "The dq function meta field must contain all the "
                f"fields defined: {extra_meta_arguments}.\n"
                f"Found fields: {list(meta.keys())}.\nDiff: {missing}"
            )
        if execution_point and meta.get("execution_point") != execution_point:
            raise DQSpecMalformedException(
                "The dq function execution point must be the same as "
                "the execution point of the dq spec."
            )


def build_prisma_dq_spec(spark, spec: dict, execution_point: str) -> dict:
    """Resolve a ``dq_type: prisma`` spec dict into a validator-shaped spec
    (reference ``utils/dq_utils.py:166-240``)."""
    if spec.get("dq_db_table"):
        spec = import_dq_rules_from_table(
            spark, spec, execution_point, PRISMA_BASE_PARAMETERS, DQ_FUNCTIONS_COLUMN_LIST
        )
    elif spec.get("dq_functions"):
        validate_dq_functions(spec, execution_point, DQ_FUNCTIONS_COLUMN_LIST)
    else:
        raise DQSpecMalformedException(
            "When using PRISMA either dq_db_table or dq_functions needs to be defined."
        )

    spec["critical_functions"] = []
    spec["execution_point"] = execution_point
    spec["result_sink_db_table"] = None
    spec["fail_on_error"] = spec.get("fail_on_error", False)
    spec["max_percentage_failure"] = spec.get("max_percentage_failure", 1)

    if not spec.get("data_product_name"):
        raise DQSpecMalformedException(
            "When using PRISMA DQ data_product_name must be defined."
        )
    dq_bucket = spec.pop("dq_bucket", None) or os.environ.get("LAKEHOUSE_DQ_BUCKET")
    if dq_bucket:
        spec["result_sink_location"] = (
            f"{dq_bucket.rstrip('/')}/{spec['data_product_name']}/result_sink/"
        )
    if not spec.get("tbl_to_derive_pk") and not spec.get("unexpected_rows_pk"):
        raise DQSpecMalformedException(
            "When using PRISMA DQ either "
            "tbl_to_derive_pk or unexpected_rows_pk need to be defined."
        )
    # drop the prisma-only config keys so the DQSpec dataclass accepts it
    for k in ("dq_db_table", "dq_table_table_filter", "dq_table_extra_filters",
              "data_product_name"):
        spec.pop(k, None)
    return spec

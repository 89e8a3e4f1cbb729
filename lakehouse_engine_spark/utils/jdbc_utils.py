"""JDBC parallel-extraction helpers.

Reference semantics: ``utils/extraction/jdbc_extraction_utils.py:163-302`` —
the two pieces of planning logic Spark's JDBC source doesn't do itself:

* ``derive_upper_bound`` — ``SELECT COALESCE(MAX(col), default)`` pushed to
  the source so a partitioned scan can be configured without knowing the key
  range up front.
* ``generate_predicates`` — one predicate per distinct partition-column value
  (plus ``IS NULL``), yielding one Spark partition per source slice; preferred
  over lower/upper bounds for low-cardinality, non-uniform keys.

Defaults mirror the reference: fetchSize=100000, compress=true
(``jdbc_extraction_utils.py:89-90``).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import SparkSession

JDBC_DEFAULTS = {"fetchSize": "100000", "compress": "true"}


def _jdbc_scalar_query(spark: SparkSession, options: dict, query: str):
    opts = {k: v for k, v in options.items() if k not in ("dbtable", "query")}
    df = spark.read.format("jdbc").options(**opts).option("query", query).load()
    row = df.first()
    return row[0] if row is not None else None


def derive_upper_bound(
    spark: SparkSession,
    options: dict,
    cast_schema: Optional[str] = None,
    default: int = 1,
) -> str:
    """Compute max(partitionColumn) at the source (one scalar roundtrip)."""
    col = options.get("partitionColumn")
    table = options.get("dbtable")
    if not col or not table:
        raise ValueError("derive_upper_bound needs partitionColumn and dbtable options")
    expr = f"CAST(MAX({col}) AS {cast_schema})" if cast_schema else f"MAX({col})"
    value = _jdbc_scalar_query(spark, options, f"SELECT COALESCE({expr}, {default}) FROM {table}")
    return str(value)


def generate_predicates(
    spark: SparkSession,
    options: dict,
    column: Optional[str] = None,
    add_null: bool = True,
) -> List[str]:
    """One predicate per distinct partition value → one parallel JDBC slice each."""
    col = column or options.get("partitionColumn")
    table = options.get("dbtable")
    if not col or not table:
        raise ValueError("generate_predicates needs partitionColumn and dbtable options")
    opts = {k: v for k, v in options.items() if k not in ("dbtable", "query")}
    distinct = (
        spark.read.format("jdbc")
        .options(**opts)
        .option("query", f"SELECT DISTINCT {col} FROM {table} WHERE {col} IS NOT NULL")
        .load()
        .collect()
    )
    preds = [f"{col} = '{r[0]}'" for r in distinct]
    if add_null:
        preds.append(f"{col} IS NULL")
    return preds

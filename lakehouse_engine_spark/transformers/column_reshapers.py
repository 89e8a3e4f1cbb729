"""Column reshapers: select/cast/rename/expressions/nested-data operators.

Reference parity: ``transformers/column_reshapers.py:30-476``. All operators
are narrow projections (single ``select``/``withColumn``) — Catalyst folds
them into the scan, so they cost nothing extra at 100 TB.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_engine_spark.utils.schema_utils import (
    array_columns,
    flatten_df,
    map_columns,
    resolve_schema,
    schema_from_dict,
    schema_from_file,
)

TransformerFn = Callable[[DataFrame], DataFrame]


def cast(cols: Dict[str, str]) -> TransformerFn:
    """Cast columns to the designated types (reference ``column_reshapers.py:30-51``).

    Accepts BOTH the reference's pyspark type-class names ("StringType",
    per its getattr(spark_types, t)() resolution) and Spark SQL DDL names
    ("string")."""

    def _resolve(t: str):
        cls_ = getattr(T, t, None)
        if isinstance(cls_, type) and issubclass(cls_, T.DataType):
            return cls_()
        return t

    def _cast(df: DataFrame) -> DataFrame:
        return df.withColumns({c: F.col(c).cast(_resolve(t)) for c, t in cols.items()})

    return _cast


def column_selector(cols: "OrderedDict[str, str]") -> TransformerFn:
    """Select and alias columns (reference ``column_reshapers.py:54-69``)."""

    def _select(df: DataFrame) -> DataFrame:
        return df.select(*(F.col(c).alias(a) for c, a in cols.items()))

    return _select


def with_expressions(cols_and_exprs: Dict[str, str]) -> TransformerFn:
    """Add/replace columns from SQL expressions (reference ``column_reshapers.py:181-204``)."""

    def _with(df: DataFrame) -> DataFrame:
        return df.withColumns({c: F.expr(e) for c, e in cols_and_exprs.items()})

    return _with


def rename(cols: Dict[str, str], escape_col_names: bool = True) -> TransformerFn:
    """Rename columns (reference ``column_reshapers.py:207-235``)."""

    def _rename(df: DataFrame) -> DataFrame:
        return df.withColumnsRenamed(cols)

    return _rename


def flatten_schema(
    max_level: Optional[int] = None,
    shorten_names: bool = False,
    alias: bool = True,
    num_chars: int = 7,
    ignore_cols: Optional[List[str]] = None,
) -> TransformerFn:
    """Flatten nested structs (reference ``column_reshapers.py:72-112``)."""

    def _flatten(df: DataFrame) -> DataFrame:
        return flatten_df(df, max_level, shorten_names, alias, num_chars, ignore_cols)

    return _flatten


def explode_columns(
    explode_arrays: bool = False,
    array_cols_to_explode: Optional[List[str]] = None,
    explode_maps: bool = False,
    map_cols_to_explode: Optional[List[str]] = None,
) -> TransformerFn:
    """Explode array/map columns with ``explode_outer`` (reference ``column_reshapers.py:115-157,441-476``).

    Maps explode through ``map_entries`` into ``<col>_key`` / ``<col>_value``
    columns; arrays explode in place. Explode multiplies row count but never
    shuffles — it stays inside the scan stage.
    """

    def _explode(df: DataFrame) -> DataFrame:
        out = df
        acols = array_cols_to_explode if array_cols_to_explode is not None else (
            array_columns(out) if explode_arrays else []
        )
        for c in acols:
            out = out.withColumn(c, F.explode_outer(c))
        mcols = map_cols_to_explode if map_cols_to_explode is not None else (
            map_columns(out) if explode_maps else []
        )
        for c in mcols:
            out = out.withColumn(c, F.explode_outer(F.map_entries(c))).withColumns(
                {f"{c}_key": F.col(f"{c}.key"), f"{c}_value": F.col(f"{c}.value")}
            ).drop(c)
        return out

    return _explode


def from_json(
    input_col: str,
    schema: Optional[dict] = None,
    schema_path: Optional[str] = None,
    json_options: Optional[dict] = None,
    drop_all_cols: bool = False,
) -> TransformerFn:
    """Parse a JSON string/binary column into a struct (reference ``column_reshapers.py:349-409``).

    Reference contract: the parsed struct is ADDED as ``{input_col}_json``
    (the original column is kept; with ``drop_all_cols`` the struct is the
    only output column). Downstream ``flatten_schema`` expands it to
    ``{input_col}_json_<field>`` columns. When no schema is given, one is
    inferred from the data (extra job — batch only; supply a schema for
    streaming/scale paths).
    """

    def _from_json(df: DataFrame) -> DataFrame:
        if schema is not None:
            st: T.DataType = schema_from_dict(schema)
        elif schema_path is not None:
            st = schema_from_file(schema_path)
        else:
            sample = df.select(F.col(input_col).cast("string").alias("j"))
            st = df.sparkSession.read.json(
                sample.rdd.map(lambda r: r["j"])  # schema inference only
            ).schema
        parsed = F.from_json(F.col(input_col).cast("string"), st, json_options or {})
        out_col = f"{input_col}_json"
        if drop_all_cols:
            return df.select(parsed.alias(out_col))
        return df.select("*", parsed.alias(out_col))

    return _from_json


def to_json(in_cols: List[str], out_col: str, json_options: Optional[dict] = None) -> TransformerFn:
    """Serialise columns to a JSON string column (reference ``column_reshapers.py:412-438``)."""

    def _to_json(df: DataFrame) -> DataFrame:
        cols = df.columns if in_cols == ["*"] else in_cols
        return df.withColumn(out_col, F.to_json(F.struct(*cols), json_options or {}))

    return _to_json


def from_avro(
    schema: Optional[str] = None,
    key_col: str = "key",
    value_col: str = "value",
    options: Optional[dict] = None,
    expand_key: bool = False,
    expand_value: bool = True,
) -> TransformerFn:
    """Decode an Avro binary column (reference ``column_reshapers.py:238-282``).

    Requires the ``spark-avro`` JVM package (present on real clusters; absent
    in this container → raises a clear error at call time, not import time).
    """

    def _from_avro(df: DataFrame) -> DataFrame:
        try:
            from pyspark.sql.avro.functions import from_avro as avro_decode
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("spark-avro package not available") from e
        out = df.withColumn(value_col, avro_decode(F.col(value_col), schema, options or {}))
        if expand_value:
            out = out.select("*", f"{value_col}.*").drop(value_col)
        if expand_key:
            out = out.select("*", f"{key_col}.*").drop(key_col)
        return out

    return _from_avro


def strip_confluent_header(col: Column) -> Column:
    """Drop the 5-byte Confluent wire-format prefix (0x00 magic + 4-byte
    big-endian schema id) from a binary column, leaving the raw Avro body."""
    return F.substring(col, 6, 2147483647)


def fetch_registry_schema(schema_registry: str, subject: str) -> str:
    """Fetch the latest schema for ``subject`` from a Confluent-compatible
    schema registry over its public REST API."""
    import json
    import urllib.request

    url = f"{schema_registry.rstrip('/')}/subjects/{subject}/versions/latest"
    with urllib.request.urlopen(url) as resp:  # nosec: caller-supplied registry
        return json.loads(resp.read())["schema"]


def from_avro_with_registry(
    schema_registry: str,
    value_schema: str,
    key_schema: Optional[str] = None,
    key_col: str = "key",
    value_col: str = "value",
    expand_key: bool = False,
    expand_value: bool = True,
    fetch_schema=None,
    avro_decode=None,
) -> TransformerFn:
    """Schema-registry Avro decode, OSS formulation.

    The reference relies on a Databricks-only ``from_avro(subject=…)``
    signature (reference ``column_reshapers.py:285-346``). The portable
    equivalent implemented here: resolve each subject's schema from the
    registry REST API at plan time (driver-side — the schema becomes a
    literal in the plan, nothing is fetched per row), strip the 5-byte
    Confluent wire-format header, and decode with plain ``from_avro``.
    ``fetch_schema(registry, subject)`` and ``avro_decode(col, schema)``
    are injectable for tests / alternative registries.
    """

    def _decode_col(df: DataFrame, col_name: str, subject: str) -> DataFrame:
        fetch = fetch_schema or fetch_registry_schema
        schema_json = fetch(schema_registry, subject)
        decode = avro_decode
        if decode is None:
            try:
                from pyspark.sql.avro.functions import from_avro as _avro
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError("spark-avro package not available") from e

            def decode(c, s):  # noqa: ANN001
                return _avro(c, s)

        body = strip_confluent_header(F.col(col_name))
        return df.withColumn(col_name, decode(body, schema_json))

    def _expand(df: DataFrame, struct_col: str) -> DataFrame:
        # a decoded record field named like an existing column (topic,
        # partition, key, …) would duplicate the name and make every
        # downstream reference ambiguous — fail loudly at plan time
        existing = [c for c in df.columns if c != struct_col]
        fields = df.schema[struct_col].dataType.fieldNames()
        clashes = sorted(set(existing) & set(fields))
        if clashes:
            raise ValueError(
                f"from_avro_with_registry: decoded {struct_col!r} record "
                f"field(s) {clashes} collide with existing column(s); rename "
                "them upstream or expand manually with aliases "
                f"(e.g. select('{struct_col}.{clashes[0]}' as '…'))"
            )
        return df.select("*", f"{struct_col}.*").drop(struct_col)

    def _transform(df: DataFrame) -> DataFrame:
        # decode BOTH columns before any struct expansion: a value record
        # with a field named 'key' would otherwise shadow the Kafka key
        # column and make the key decode ambiguous
        out = _decode_col(df, value_col, value_schema)
        if key_schema:
            out = _decode_col(out, key_col, key_schema)
        if expand_value:
            out = _expand(out, value_col)
        if key_schema and expand_key:
            out = _expand(out, key_col)
        return out

    return _transform

"""Readers — one function per source family, dispatched by format.

Reference parity: ``io/reader_factory.py:23-63`` + ``io/readers/*``. Batch
uses ``spark.read``; streaming uses ``spark.readStream``. Schema enforcement,
``_metadata.file_path`` capture, temp-view registration and JDBC
bound/predicate derivation match the reference's reader semantics.

External connectors (SAP BW/B4, SFTP, SharePoint) are exposed as explicit
``NotImplementedError`` stubs: they need credentials/packages that cannot
exist here; the JDBC path they ride on is fully implemented (see
``utils/jdbc_utils.py`` for bound/predicate derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_engine_spark.core.definitions import (
    FILE_INPUT_FORMATS,
    InputFormat,
    InputSpec,
    ReadType,
    WrongArgumentsError,
)
from lakehouse_engine_spark.utils.schema_utils import resolve_schema


class ReaderFactory:
    """Dispatch an InputSpec to the right Spark source."""

    @staticmethod
    def get_data(spark: SparkSession, spec: InputSpec) -> DataFrame:
        fmt = spec.data_format
        streaming = spec.read_type == ReadType.STREAMING.value
        options = dict(spec.options or {})

        if fmt == InputFormat.DATAFRAME.value:
            df = spec.df_name
            if df is None:
                raise WrongArgumentsError(f"InputSpec {spec.spec_id}: df_name required")
        elif fmt == InputFormat.SQL.value or (spec.query and fmt is None):
            df = spark.sql(spec.query)
        elif spec.query and fmt not in (InputFormat.JDBC.value,):
            df = spark.sql(spec.query)
        elif spec.db_table and fmt not in (InputFormat.JDBC.value, InputFormat.KAFKA.value):
            # A catalog table knows its own storage format — honor db_table
            # regardless of the declared file format.
            reader = spark.readStream if streaming else spark.read
            df = reader.options(**options).table(spec.db_table)
        elif fmt == InputFormat.JDBC.value:
            df = _read_jdbc(spark, spec, options)
        elif fmt == InputFormat.KAFKA.value:
            reader = spark.readStream if streaming else spark.read
            df = reader.format("kafka").options(**options).load()
        elif fmt == InputFormat.RATE.value:
            df = spark.readStream.format("rate").options(**options).load()
        elif fmt == InputFormat.CLOUDFILES.value:
            # Databricks Auto Loader equivalent: OSS file streaming source.
            inner = options.pop("cloudFiles.format", options.pop("format", "parquet"))
            schema = resolve_schema(spark, spec.schema, spec.schema_path, spec.enforce_schema_from_table)
            reader = spark.readStream.format(inner).options(**options)
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.load(spec.location)
        elif fmt in FILE_INPUT_FORMATS:
            schema = resolve_schema(spark, spec.schema, spec.schema_path, spec.enforce_schema_from_table)
            reader = spark.readStream if streaming else spark.read
            reader = reader.format(fmt).options(**options)
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.load(spec.location)
        elif fmt == "sftp":
            from lakehouse_engine_spark.io.sftp_reader import read_sftp

            df = read_sftp(spark, spec)
        elif fmt == "sharepoint":
            from lakehouse_engine_spark.io.sharepoint import read_sharepoint

            df = read_sharepoint(spark, spec)
        elif fmt in ("sap_bw", "sap_b4"):
            raise NotImplementedError(
                f"{fmt} connector needs external credentials/packages; "
                "use the jdbc reader it wraps."
            )
        else:
            raise WrongArgumentsError(f"InputSpec {spec.spec_id}: cannot dispatch format {fmt}")

        if spec.with_filepath:
            df = df.selectExpr("*", "_metadata.file_path AS lhe_file_path")
        if spec.temp_view:
            df.createOrReplaceTempView(spec.temp_view)
        return df


def _read_jdbc(spark: SparkSession, spec: InputSpec, options: dict) -> DataFrame:
    """JDBC read with optional auto-upper-bound / generated predicates.

    Reference ``io/readers/jdbc_reader.py:26-66`` +
    ``utils/extraction/jdbc_extraction_utils.py:163-302``.
    """
    from lakehouse_engine_spark.utils import jdbc_utils

    jdbc_args = dict(spec.jdbc_args or {})
    if spec.calculate_upper_bound and "upperBound" not in options:
        options["upperBound"] = jdbc_utils.derive_upper_bound(
            spark, options, spec.calc_upper_bound_schema
        )
    if spec.generate_predicates and "predicates" not in jdbc_args:
        jdbc_args["predicates"] = jdbc_utils.generate_predicates(
            spark, options, add_null=spec.predicates_add_null
        )
    if jdbc_args.get("predicates"):
        return spark.read.jdbc(
            url=options.pop("url"),
            table=options.pop("dbtable"),
            predicates=jdbc_args["predicates"],
            properties={k: str(v) for k, v in options.items()},
        )
    return spark.read.format("jdbc").options(**options).load()

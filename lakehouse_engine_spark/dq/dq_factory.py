"""DQ factory — run a DQSpec natively on Spark.

Reference parity: ``dq_processors/dq_factory.py:280-378`` (process),
``:423-527`` (result-sink explosion), ``:636-719`` (failure policies) and
``dq_processors/validator.py:136-228`` (source tagging) — minus the GE
dependency. All row-level expectations evaluate in ONE aggregate job over the
input; only uniqueness/aggregate expectations add a job each.
"""

from __future__ import annotations

import datetime
import json
import uuid
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_engine_spark.core.definitions import (
    DQFunctionSpec,
    DQSpec,
    DQValidationsFailedException,
    OutputSpec,
    WriteType,
)
from lakehouse_engine_spark.dq import expectations as E

RESULT_SINK_SCHEMA = T.StructType(
    [
        T.StructField("run_name", T.StringType()),
        T.StructField("run_time", T.TimestampType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("spec_id", T.StringType()),
        T.StructField("input_id", T.StringType()),
        T.StructField("expectation_type", T.StringType()),
        T.StructField("kwargs", T.StringType()),
        T.StructField("expectation_success", T.BooleanType()),
        T.StructField("unexpected_count", T.LongType()),
        T.StructField("unexpected_percent", T.DoubleType()),
        T.StructField("element_count", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)


class DQFactory:
    """Compiles and runs DQSpec expectation suites."""

    @classmethod
    def run_dq_process(cls, spark: SparkSession, spec: DQSpec, df: DataFrame) -> DataFrame:
        if spec.cache_df:
            df = df.cache()
        functions = list(spec.dq_functions) + list(spec.critical_functions)
        critical = {id(f) for f in spec.critical_functions}

        row_fns: List[Tuple[DQFunctionSpec, object]] = []
        agg_fns: List[DQFunctionSpec] = []
        for fn in functions:
            if fn.function in E.ROW_EXPECTATIONS:
                row_fns.append((fn, E.ROW_EXPECTATIONS[fn.function](**fn.args)))
            elif fn.function in E.AGG_EXPECTATIONS:
                agg_fns.append(fn)
            else:
                raise ValueError(f"Unknown DQ expectation: {fn.function}")

        # One aggregate pass: element count + every row-level unexpected count.
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, (_, cond) in enumerate(row_fns):
            aggs.append(
                F.coalesce(F.sum(F.when(~cond, F.lit(1))), F.lit(0)).alias(f"__u{i}")
            )
        stats = df.agg(*aggs).first()
        n = int(stats["__n"])

        results = []  # (fn_spec, success, unexpected_count, element_count)
        for i, (fn, _) in enumerate(row_fns):
            u = int(stats[f"__u{i}"])
            results.append((fn, u == 0, u, n))
        for fn in agg_fns:
            if fn.function == "expect_column_values_to_be_unique":
                u, total = E.eval_unique(df, fn.args["column"])
                results.append((fn, u == 0, u, total))
            elif fn.function == "expect_table_row_count_to_be_between":
                ok = E.eval_row_count_between(n, **fn.args)
                results.append((fn, ok, 0 if ok else n, n))
            elif fn.function == "expect_queried_column_agg_value_to_be":
                ok = E.eval_queried_agg(spark, df, fn.args.get("template_dict", fn.args))
                results.append((fn, ok, 0 if ok else n, n))
            elif fn.function == "expect_column_to_exist":
                ok = E.eval_column_exists(df, **fn.args)
                results.append((fn, ok, 0 if ok else n, n))

        overall = all(ok for _, ok, _, _ in results)
        run_time = datetime.datetime.now(datetime.timezone.utc)
        run_name = f"{spec.spec_id}-{uuid.uuid4().hex[:8]}"
        rows = [
            (
                run_name,
                run_time,
                overall,
                spec.spec_id,
                spec.input_id,
                fn.function,
                json.dumps(fn.args, default=str),
                bool(ok),
                int(u),
                (float(u) / cnt * 100.0) if cnt else 0.0,
                int(cnt),
                spec.source,
            )
            for fn, ok, u, cnt in results
        ]
        result_df = spark.createDataFrame(rows, RESULT_SINK_SCHEMA)
        cls._write_result_sink(spark, spec, result_df)
        if spec.local_fs_root_dir and spec.store_backend == "file_system":
            cls._write_fs_store_artifact(spec, run_name, run_time, rows)

        out_df = df
        if spec.tag_source_data:
            out_df = cls._tag_source(df, row_fns)

        cls._log_or_fail(spec, results, critical, n)
        return out_df

    # ------------------------------------------------------------- internals

    @staticmethod
    def _write_result_sink(spark: SparkSession, spec: DQSpec, result_df: DataFrame) -> None:
        if not (spec.result_sink_location or spec.result_sink_db_table):
            return
        from lakehouse_engine_spark.io.writer_factory import WriterFactory

        WriterFactory.write(
            spark,
            result_df,
            OutputSpec(
                spec_id=f"{spec.spec_id}_result_sink",
                input_id=spec.spec_id,
                write_type=WriteType.APPEND.value,
                data_format=spec.result_sink_format,
                db_table=spec.result_sink_db_table,
                location=spec.result_sink_location,
                partitions=spec.result_sink_partitions,
                options=spec.result_sink_options,
            ),
        )

    @staticmethod
    def _write_fs_store_artifact(spec: DQSpec, run_name, run_time, rows) -> None:
        """GE-file-store-shaped validation artifact: one JSON per run under
        ``local_fs_root_dir/<run_name>/`` (reference ``store_backend:
        file_system`` — what build_data_docs reads; the result SINK stays
        the primary machine-readable output)."""
        import os

        d = os.path.join(spec.local_fs_root_dir, run_name)
        os.makedirs(d, exist_ok=True)
        payload = {
            "run_name": run_name,
            "run_time": run_time.isoformat(),
            "spec_id": spec.spec_id,
            "input_id": spec.input_id,
            "success": all(r[7] for r in rows),
            "expectations": [
                {
                    "expectation_type": r[5],
                    "kwargs": json.loads(r[6]),
                    "success": r[7],
                    "unexpected_count": r[8],
                    "unexpected_percent": r[9],
                    "element_count": r[10],
                }
                for r in rows
            ],
        }
        with open(os.path.join(d, "validation_result.json"), "w") as fh:
            json.dump(payload, fh, indent=1, default=str)

    @staticmethod
    def _tag_source(df: DataFrame, row_fns) -> DataFrame:
        """Append the ``dq_validations`` struct to every source row — computed
        inline (vectorized whens), no join back needed.

        Reference tags via unexpected-index join
        (``dq_processors/validator.py:136-228``); evaluating the same
        conditions in the projection is plan-equivalent and shuffle-free.
        """
        failures = F.array_compact(
            F.array(
                *[
                    F.when(~cond, F.lit(fn.function)).otherwise(F.lit(None))
                    for fn, cond in row_fns
                ]
            )
        )
        return df.withColumn(
            "dq_validations",
            F.struct(
                F.lit(True).alias("run_success"),
                (F.size(failures) == 0).alias("row_success"),
                failures.alias("failed_expectations"),
            ),
        )

    @staticmethod
    def _log_or_fail(spec: DQSpec, results, critical_ids, n: int) -> None:
        failed = [(fn, u, cnt) for fn, ok, u, cnt in results if not ok]
        if not failed:
            return
        crit_failed = [fn.function for fn, _, _ in failed if id(fn) in critical_ids]
        if crit_failed:
            raise DQValidationsFailedException(
                f"Critical DQ functions failed: {crit_failed}"
            )
        if spec.max_percentage_failure is not None:
            pct = 100.0 * len(failed) / max(len(results), 1)
            if pct > spec.max_percentage_failure:
                raise DQValidationsFailedException(
                    f"DQ failure percentage {pct:.1f}% exceeds "
                    f"max_percentage_failure={spec.max_percentage_failure}"
                )
            return
        if spec.fail_on_error:
            raise DQValidationsFailedException(
                f"DQ validations failed: {[fn.function for fn, _, _ in failed]}"
            )

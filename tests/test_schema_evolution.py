"""Schema evolution on evolving loads (reference
``tests/feature/test_schema_evolution.py``).

The reference exercises Delta auto-merge; without delta-spark the OSS
equivalent is parquet ``mergeSchema`` on read plus append writes whose
schema grows — the engine must pass evolution options through
InputSpec/OutputSpec untouched and keep old rows readable (nulls for
late-added columns).
"""

from __future__ import annotations

import os

from lakehouse_engine_spark import load_data


def _write_batch(spark, rows, schema, in_dir, mode="overwrite"):
    spark.createDataFrame(rows, schema).write.mode(mode).parquet(in_dir)


def test_append_load_with_added_column(spark, tmp_dir):
    """part-02 scenario: a later batch adds a column; reading the sink with
    mergeSchema shows the union schema, old rows null-filled."""
    in_dir = os.path.join(tmp_dir, "in")
    out_dir = os.path.join(tmp_dir, "out")

    def acon(read_schema=None):
        ispec = {
            "spec_id": "src",
            "read_type": "batch",
            "data_format": "parquet",
            "location": in_dir,
            "options": {"mergeSchema": True},
        }
        if read_schema:
            ispec["schema"] = read_schema
        return {
            "input_specs": [ispec],
            "output_specs": [
                {
                    "spec_id": "sink",
                    "input_id": "src",
                    "write_type": "append",
                    "data_format": "parquet",
                    "location": out_dir,
                    "options": {"mergeSchema": True},
                }
            ],
        }

    _write_batch(spark, [(1, "a")], "id INT, name STRING", in_dir)
    load_data(acon())

    _write_batch(spark, [(2, "b", 9.5)], "id INT, name STRING, score DOUBLE", in_dir)
    load_data(acon())

    result = spark.read.option("mergeSchema", True).parquet(out_dir)
    assert set(result.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in result.collect()}
    assert rows[1] == ("a", None)
    assert rows[2] == ("b", 9.5)


def test_append_load_with_removed_column(spark, tmp_dir):
    """part-03 scenario: a later batch drops a column; union schema remains,
    new rows null-filled for the dropped column."""
    in_dir = os.path.join(tmp_dir, "in")
    out_dir = os.path.join(tmp_dir, "out")

    _write_batch(spark, [(1, "a", 1.0)], "id INT, name STRING, score DOUBLE", in_dir)
    load_data(
        {
            "input_specs": [
                {"spec_id": "src", "data_format": "parquet", "location": in_dir}
            ],
            "output_specs": [
                {"spec_id": "sink", "input_id": "src", "write_type": "append",
                 "data_format": "parquet", "location": out_dir}
            ],
        }
    )
    _write_batch(spark, [(2, "b")], "id INT, name STRING", in_dir)
    load_data(
        {
            "input_specs": [
                {"spec_id": "src", "data_format": "parquet", "location": in_dir}
            ],
            "output_specs": [
                {"spec_id": "sink", "input_id": "src", "write_type": "append",
                 "data_format": "parquet", "location": out_dir}
            ],
        }
    )
    result = spark.read.option("mergeSchema", True).parquet(out_dir)
    assert set(result.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in result.collect()}
    assert rows[1] == 1.0 and rows[2] is None


def test_enforced_schema_casts_evolving_input(spark, tmp_dir):
    """Schema enforcement pins the sink schema regardless of input drift —
    the 'auto_merge_disabled' half of the reference matrix: extra input
    columns are dropped, missing ones must raise or null-fill per schema."""
    in_dir = os.path.join(tmp_dir, "in")
    out_dir = os.path.join(tmp_dir, "out")
    _write_batch(spark, [(1, "a", 9.5)], "id INT, name STRING, extra DOUBLE", in_dir)
    load_data(
        {
            "input_specs": [
                {
                    "spec_id": "src",
                    "data_format": "parquet",
                    "location": in_dir,
                }
            ],
            "transform_specs": [
                {
                    "spec_id": "pin",
                    "input_id": "src",
                    "transformers": [
                        {
                            "function": "column_selector",
                            "args": {"cols": {"id": "id", "name": "name"}},
                        }
                    ],
                }
            ],
            "output_specs": [
                {"spec_id": "sink", "input_id": "pin", "write_type": "overwrite",
                 "data_format": "parquet", "location": out_dir}
            ],
        }
    )
    result = spark.read.parquet(out_dir)
    assert result.columns == ["id", "name"]
    assert result.count() == 1

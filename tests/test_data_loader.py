"""DataLoader ACON end-to-end tests — the reference's dominant test pattern
(SURVEY.md §5): run the public API with a config dict, read back the output,
assert equality."""

from __future__ import annotations

import os

import pytest

from lakehouse_engine_spark import load_data
from lakehouse_engine_spark.core.definitions import WrongArgumentsError

from tests.conftest import TESTDATA, assert_df_equal


@pytest.fixture()
def src(spark, tmp_dir):
    path = os.path.join(tmp_dir, "src")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id INT, grp STRING, amt DOUBLE"
    ).write.parquet(path)
    return path


def test_full_overwrite_load(spark, src, tmp_dir):
    out = os.path.join(tmp_dir, "out")
    load_data(
        {
            "input_specs": [
                {"spec_id": "in", "data_format": "parquet", "location": src}
            ],
            "transform_specs": [
                {
                    "spec_id": "tr",
                    "input_id": "in",
                    "transformers": [
                        {"function": "expression_filter", "args": {"exp": "grp = 'a'"}}
                    ],
                }
            ],
            "output_specs": [
                {
                    "spec_id": "out",
                    "input_id": "tr",
                    "data_format": "parquet",
                    "location": out,
                    "write_type": "overwrite",
                }
            ],
        }
    )
    assert_df_equal(
        spark.read.parquet(out).select("id", "grp", "amt"),
        [(1, "a", 10.0), (3, "a", 30.0)],
    )


def test_append_load(spark, src, tmp_dir):
    out = os.path.join(tmp_dir, "out")
    acon = {
        "input_specs": [{"spec_id": "in", "data_format": "parquet", "location": src}],
        "output_specs": [
            {
                "spec_id": "out",
                "input_id": "in",
                "data_format": "parquet",
                "location": out,
                "write_type": "append",
            }
        ],
    }
    load_data(acon)
    load_data(acon)
    assert spark.read.parquet(out).count() == 6


def test_dataframe_output_returns_df(spark, src):
    res = load_data(
        {
            "input_specs": [{"spec_id": "in", "data_format": "parquet", "location": src}],
            "output_specs": [
                {"spec_id": "o", "input_id": "in", "data_format": "dataframe"}
            ],
        }
    )
    assert res["o"].count() == 3


def test_multi_input_join_via_sql(spark, src):
    res = load_data(
        {
            "input_specs": [
                {"spec_id": "a", "data_format": "parquet", "location": src, "temp_view": "side_a"},
                {
                    "spec_id": "b",
                    "data_format": "sql",
                    "query": "SELECT id, amt * 2 AS dbl FROM side_a",
                },
            ],
            "transform_specs": [
                {
                    "spec_id": "j",
                    "input_id": "a",
                    "transformers": [
                        {
                            "function": "join",
                            "args": {
                                "join_with": "b",
                                "join_condition": "a.id = b.id",
                                "join_type": "inner",
                                "select_cols": ["a.id", "b.dbl"],
                            },
                        }
                    ],
                }
            ],
            "output_specs": [
                {"spec_id": "o", "input_id": "j", "data_format": "dataframe"}
            ],
        }
    )
    assert_df_equal(res["o"], [(1, 20.0), (2, 40.0), (3, 60.0)])


def test_partitioned_write(spark, src, tmp_dir):
    out = os.path.join(tmp_dir, "parts")
    load_data(
        {
            "input_specs": [{"spec_id": "in", "data_format": "parquet", "location": src}],
            "output_specs": [
                {
                    "spec_id": "o",
                    "input_id": "in",
                    "data_format": "parquet",
                    "location": out,
                    "write_type": "overwrite",
                    "partitions": ["grp"],
                }
            ],
        }
    )
    assert sorted(d for d in os.listdir(out) if d.startswith("grp=")) == ["grp=a", "grp=b"]


def test_csv_roundtrip_with_schema(spark, tmp_dir):
    csv_dir = os.path.join(tmp_dir, "csv")
    os.makedirs(csv_dir)
    with open(os.path.join(csv_dir, "part1.csv"), "w", encoding="utf-8") as fh:
        fh.write("id,name\n1,ada\n2,grace\n")
    res = load_data(
        {
            "input_specs": [
                {
                    "spec_id": "in",
                    "data_format": "csv",
                    "location": csv_dir,
                    "schema": {
                        "type": "struct",
                        "fields": [
                            {"name": "id", "type": "integer", "nullable": True, "metadata": {}},
                            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
                        ],
                    },
                    "options": {"header": "true"},
                }
            ],
            "output_specs": [{"spec_id": "o", "input_id": "in", "data_format": "dataframe"}],
        }
    )
    assert_df_equal(res["o"], [(1, "ada"), (2, "grace")])


def test_unknown_input_id_raises(src):
    with pytest.raises(WrongArgumentsError):
        load_data(
            {
                "input_specs": [{"spec_id": "in", "data_format": "parquet", "location": src}],
                "output_specs": [
                    {"spec_id": "o", "input_id": "nope", "data_format": "dataframe"}
                ],
            }
        )


def test_table_write_and_read(spark, src):
    load_data(
        {
            "input_specs": [{"spec_id": "in", "data_format": "parquet", "location": src}],
            "output_specs": [
                {
                    "spec_id": "o",
                    "input_id": "in",
                    "data_format": "parquet",
                    "db_table": "test_dl_table",
                    "write_type": "overwrite",
                }
            ],
        }
    )
    try:
        res = load_data(
            {
                "input_specs": [{"spec_id": "t", "db_table": "test_dl_table", "data_format": "parquet"}],
                "output_specs": [{"spec_id": "o", "input_id": "t", "data_format": "dataframe"}],
            }
        )
        assert res["o"].count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS test_dl_table")


def test_schema_as_json_string_and_ddl(spark, tmp_dir):
    csv_dir = os.path.join(tmp_dir, "csv_str_schema")
    os.makedirs(csv_dir)
    with open(os.path.join(csv_dir, "part1.csv"), "w", encoding="utf-8") as fh:
        fh.write("id,name\n1,ada\n2,grace\n")
    json_schema = (
        '{"type":"struct","fields":['
        '{"name":"id","type":"integer","nullable":true,"metadata":{}},'
        '{"name":"name","type":"string","nullable":true,"metadata":{}}]}'
    )
    for schema in (json_schema, "id int, name string"):
        res = load_data(
            {
                "input_specs": [
                    {
                        "spec_id": "in",
                        "data_format": "csv",
                        "location": csv_dir,
                        "schema": schema,
                        "options": {"header": "true"},
                    }
                ],
                "output_specs": [
                    {"spec_id": "o", "input_id": "in", "data_format": "dataframe"}
                ],
            }
        )
        assert_df_equal(res["o"], [(1, "ada"), (2, "grace")])


def test_bucketed_table_write_enables_shuffle_free_join(spark, src, tmp_dir):
    """bucketBy co-locates the join key at write time: a self-join of two
    bucketed tables on the bucket key plans with NO Exchange."""
    from lakehouse_engine_spark import load_data
    from lakehouse_engine_spark.core.definitions import WrongArgumentsError
    import pytest as _pytest

    def acon(table):
        return {
            "input_specs": [
                {"spec_id": "o", "data_format": "parquet",
                 "location": os.path.join(TESTDATA, "orders.parquet")}
            ],
            "output_specs": [
                {"spec_id": "sink", "input_id": "o", "write_type": "overwrite",
                 "data_format": "parquet", "db_table": table,
                 "bucket_cols": ["o_custkey"], "bucket_num": 4,
                 "sort_cols": ["o_custkey"]}
            ],
        }

    load_data(acon("bt_orders_a"))
    load_data(acon("bt_orders_b"))
    try:
        a, b = spark.table("bt_orders_a"), spark.table("bt_orders_b")
        joined = a.join(b, "o_custkey").groupBy("o_custkey").count()
        # with broadcast suppressed, the bucketed SMJ must run with ZERO
        # exchanges — the write-time bucketing replaced the join shuffle
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Bucketed: true" in plan, plan[:1500]
        assert "Exchange" not in plan, plan[:1500]

        # bucketed write without a catalog table must fail loudly
        bad = acon("ignored")
        bad["output_specs"][0].pop("db_table")
        bad["output_specs"][0]["location"] = os.path.join(tmp_dir, "nope")
        with _pytest.raises(WrongArgumentsError):
            load_data(bad)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders_a")
        spark.sql("DROP TABLE IF EXISTS bt_orders_b")


def test_contextual_datapipe_decontaminate_with(spark, tmp_dir):
    """Datapipes contextual transformer: benchmark set referenced by spec_id
    in a pure-JSON ACON (no DataFrame objects in the config)."""
    docs = os.path.join(tmp_dir, "docs")
    bench = os.path.join(tmp_dir, "bench")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "unrelated words entirely separate from the benchmark suite text"),
        ],
        "doc_id INT, text STRING",
    ).write.parquet(docs)
    spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta theta")], "bid INT, text STRING"
    ).write.parquet(bench)
    res = load_data(
        {
            "input_specs": [
                {"spec_id": "docs", "data_format": "parquet", "location": docs},
                {"spec_id": "bench", "data_format": "parquet", "location": bench},
            ],
            "transform_specs": [
                {
                    "spec_id": "clean",
                    "input_id": "docs",
                    "transformers": [
                        {
                            "function": "text_decontaminate_with",
                            "args": {"benchmark_with": "bench", "ngram": 8, "mode": "drop"},
                        }
                    ],
                }
            ],
            "output_specs": [
                {"spec_id": "out", "input_id": "clean", "data_format": "dataframe"}
            ],
        }
    )
    assert [r["doc_id"] for r in res["out"].collect()] == [2]


def test_acon_round7_curation_pipeline(spark, tmp_dir):
    """Round-7 curation ops driven end-to-end through DataLoader with a
    pure-JSON ACON: Gopher rule filtering, DSIR scoring against a
    target slice resolved by spec_id, and WordPiece encoding with a
    vocab resolved by spec_id — the engine-integration seam for every
    new datapipes operator."""
    import os as _os

    docs = _os.path.join(tmp_dir, "r7docs")
    vocab = _os.path.join(tmp_dir, "r7vocab")
    long_good = (
        "the model trains on the web data and it reads the target "
        "style text for a clean corpus with many common words in it "
    ) * 2
    spark.createDataFrame(
        [(1, long_good), (2, "short"), (3, long_good + " extra tail")],
        "doc_id INT, text STRING",
    ).write.parquet(docs)
    spark.createDataFrame(
        [(p,) for p in ["the", "mo", "##del", "a", "##a", "t", "##t"]],
        "piece STRING",
    ).write.parquet(vocab)
    res = load_data(
        {
            "input_specs": [
                {"spec_id": "docs", "data_format": "parquet", "location": docs},
                {"spec_id": "vocab", "data_format": "parquet", "location": vocab},
            ],
            "transform_specs": [
                {
                    "spec_id": "target",
                    "input_id": "docs",
                    "transformers": [
                        {
                            "function": "expression_filter",
                            "args": {"exp": "doc_id = 1"},
                        }
                    ],
                },
                {
                    "spec_id": "curated",
                    "input_id": "docs",
                    "transformers": [
                        {
                            "function": "text_gopher_rules",
                            "args": {"min_words": 10, "mode": "filter"},
                        },
                        {
                            "function": "text_dsir_score_with",
                            "args": {"target_with": "target", "num_buckets": 32},
                        },
                        {
                            "function": "wordpiece_encode_with",
                            "args": {"vocab_id": "vocab"},
                        },
                    ],
                },
            ],
            "output_specs": [
                {"spec_id": "out", "input_id": "curated", "data_format": "dataframe"}
            ],
        }
    )
    rows = {r["doc_id"]: r for r in res["out"].collect()}
    assert set(rows) == {1, 3}  # gopher filter dropped the short doc
    assert all("dsir_score" in r.asDict() and r["dsir_score"] is not None
               for r in rows.values())
    assert all(r["wp_tokens_n"] > 0 for r in rows.values())


def test_delta_read_refuses_raw_parquet_scan_over_real_delta_table(spark, tmp_dir):
    """Without delta-spark, delta reads degrade to parquet ONLY for
    engine-written parquet-at-delta-location outputs. A location holding a
    GENUINE Delta table (_delta_log present — superseded part files on
    disk) must fail loudly: a raw parquet scan would silently resurrect
    deleted/overwritten row versions."""
    import os

    from lakehouse_engine_spark.core.exec_env import ExecEnv

    if ExecEnv.delta_available():
        pytest.skip("delta-spark installed — degradation path inactive")
    loc = os.path.join(tmp_dir, "real_delta")
    spark.range(3).write.parquet(loc)
    os.makedirs(os.path.join(loc, "_delta_log"))
    with pytest.raises(RuntimeError, match="_delta_log"):
        load_data(
            {
                "input_specs": [
                    {"spec_id": "d", "data_format": "delta", "location": loc}
                ],
                "output_specs": [
                    {"spec_id": "o", "input_id": "d", "data_format": "dataframe"}
                ],
            }
        )
    # without the log dir the engine's own degradation still works
    import shutil

    shutil.rmtree(os.path.join(loc, "_delta_log"))
    out = load_data(
        {
            "input_specs": [
                {"spec_id": "d", "data_format": "delta", "location": loc}
            ],
            "output_specs": [
                {"spec_id": "o", "input_id": "d", "data_format": "dataframe"}
            ],
        }
    )
    assert out["o"].count() == 3


def test_schema_from_file_uri_forms(tmp_dir):
    """file: URI parsing: triple-slash, percent-encoded chars, and
    localhost netloc resolve; a remote netloc is rejected (it must not
    silently become a relative path)."""
    import json as _json
    import os

    from lakehouse_engine_spark.utils.schema_utils import schema_from_file

    d = os.path.join(tmp_dir, "sch dir")
    os.makedirs(d)
    p = os.path.join(d, "s.json")
    with open(p, "w") as fh:
        _json.dump(
            {"type": "struct", "fields": [
                {"name": "x", "type": "integer", "nullable": True, "metadata": {}}
            ]}, fh,
        )
    from urllib.parse import quote

    assert schema_from_file(f"file://{quote(p)}").fieldNames() == ["x"]
    assert schema_from_file(f"file://localhost{quote(p)}").fieldNames() == ["x"]
    with pytest.raises(ValueError, match="netloc"):
        schema_from_file("file://remotehost/etc/schema.json")

"""Transformer-registry coverage: every reference transformer family
(SURVEY.md §2.3) exercised on small DataFrames through the factory — the same
dispatch path DataLoader uses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_engine_spark.core.definitions import TransformerSpec
from lakehouse_engine_spark.transformers.transformer_factory import TransformerFactory

from tests.conftest import assert_df_equal


def t(name, data=None, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args), data)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "Ada", 36, "1815-12-10"), (2, "Grace", 85, "1906-12-09"), (3, "Alan", 41, "1912-06-23")],
        "id INT, name STRING, age INT, born STRING",
    )


def test_column_selector(people):
    out = people.transform(t("column_selector", cols={"id": "pk", "name": "who"}))
    assert out.columns == ["pk", "who"]


def test_column_filter_exp(people):
    out = people.transform(t("column_filter_exp", exp=["id", "age * 2 AS dbl"]))
    assert_df_equal(out, [(1, 72), (2, 170), (3, 82)])


def test_with_expressions(people):
    out = people.transform(t("with_expressions", cols_and_exprs={"nm": "upper(name)"}))
    assert_df_equal(out.select("id", "nm"), [(1, "ADA"), (2, "GRACE"), (3, "ALAN")])


def test_rename(people):
    out = people.transform(t("rename", cols={"name": "who"}))
    assert "who" in out.columns and "name" not in out.columns


def test_cast(people):
    out = people.transform(t("cast", cols={"age": "double"}))
    assert dict(out.dtypes)["age"] == "double"


def test_with_literals(people):
    out = people.transform(t("with_literals", literals={"src": "unit"}))
    assert out.select("src").distinct().collect()[0][0] == "unit"


def test_column_dropper(people):
    out = people.transform(t("column_dropper", cols=["born", "age"]))
    assert out.columns == ["id", "name"]


def test_hash_masker_sha(people):
    out = people.transform(t("hash_masker", cols=["name"], approach="SHA"))
    row = out.filter("id = 1").first()
    assert len(row["name_hash"]) == 64  # sha2-256 hex
    murmur = people.transform(t("hash_masker", cols=["name"], approach="MURMUR3"))
    assert isinstance(murmur.first()["name_hash"], int)


def test_with_row_id(people):
    out = people.transform(t("with_row_id", output_col="rid"))
    assert out.select("rid").distinct().count() == 3


def test_with_auto_increment_id(people):
    out = people.transform(t("with_auto_increment_id", output_col="seq"))
    assert sorted(r["seq"] for r in out.collect()) == [0, 1, 2]


def test_with_regex_value(people):
    out = people.transform(
        t("with_regex_value", input_col="born", output_col="year", regex=r"(\d{4})", idx=1)
    )
    assert_df_equal(out.select("id", "year"), [(1, "1815"), (2, "1906"), (3, "1912")])


def test_expression_filter(people):
    assert people.transform(t("expression_filter", exp="age > 50")).count() == 1


def test_incremental_filter_value(people):
    out = people.transform(t("incremental_filter", input_col="age", increment_value=41))
    assert out.count() == 1  # strictly greater


def test_incremental_filter_df(spark, people):
    inc = spark.createDataFrame([(41,)], "latest INT")
    out = people.transform(
        t(
            "incremental_filter",
            input_col="age",
            increment_df=inc,
            increment_col="latest",
            greater_or_equal=True,
        )
    )
    assert out.count() == 2  # >= 41


def test_drop_duplicate_rows(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id INT, v STRING")
    assert df.transform(t("drop_duplicate_rows")).count() == 2
    assert df.transform(t("drop_duplicate_rows", cols=["v"])).count() == 2


def test_join_broadcast(spark, people):
    dim = spark.createDataFrame([(1, "math"), (2, "cs")], "id INT, field STRING")
    data = {"dim": dim}
    out = people.transform(
        t(
            "join",
            data,
            join_with="dim",
            join_condition="a.id = b.id",
            join_type="inner",
            broadcast_join=True,
        )
    )
    assert out.count() == 2
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_join_anti(spark, people):
    dim = spark.createDataFrame([(1,)], "id INT")
    out = people.transform(
        t("join", {"d": dim}, join_with="d", join_condition="a.id = b.id", join_type="left_anti")
    )
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


def test_union_and_union_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id INT, v STRING")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "id INT, v STRING")
    c = spark.createDataFrame([("z", 3)], "v STRING, id INT")
    data = {"b": b, "c": c}
    assert a.transform(t("union", data, union_with=["b"], deduplication=True)).count() == 2
    assert a.transform(t("union", data, union_with=["b"], deduplication=False)).count() == 3
    out = a.transform(t("union_by_name", data, union_with=["c"]))
    assert_df_equal(out.select("id", "v"), [(1, "x"), (3, "z")])


def test_get_max_value(people):
    out = people.transform(t("get_max_value", input_col="age", output_col="latest"))
    assert out.collect() == [(85,)] and out.columns == ["latest"]


def test_group_and_rank(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], "k INT, ver INT, v STRING"
    )
    out = df.transform(t("group_and_rank", group_key=["k"], ranking_key=["ver"]))
    assert_df_equal(out.select("k", "v"), [(1, "new"), (2, "only")])


def test_condense_record_mode_cdc(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "", "v1"),
            (1, 2, "U", "v2"),
            (2, 1, "", "v1"),
            (2, 2, "D", "gone"),
            (3, 1, "X", "bad-mode"),
        ],
        "k INT, req INT, record_mode STRING, v STRING",
    )
    out = df.transform(
        t(
            "condense_record_mode_cdc",
            business_key=["k"],
            record_mode_col="record_mode",
            valid_record_modes=["", "N", "R", "D", "U"],
            ranking_key_desc=["req"],
        )
    )
    got = {r["k"]: (r["record_mode"], r["v"]) for r in out.collect()}
    assert got == {1: ("U", "v2"), 2: ("D", "gone")}


def test_condense_cdc_newest_row_invalid_mode_suppresses_key(spark):
    # reference semantics: rank FIRST, filter record modes AFTER — when the
    # newest changelog image of a key carries an excluded record mode, the
    # key yields NO row (an older image must not be resurrected)
    df = spark.createDataFrame(
        [
            (1, 1, "", "v1"),
            (1, 2, "X", "excluded-newest"),
            (2, 1, "", "only"),
        ],
        "k INT, req INT, record_mode STRING, v STRING",
    )
    out = df.transform(
        t(
            "condense_record_mode_cdc",
            business_key=["k"],
            record_mode_col="record_mode",
            valid_record_modes=["", "N", "R", "D", "U"],
            ranking_key_desc=["req"],
        )
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {2: "only"}


def test_flatten_schema_and_explode(spark):
    df = spark.createDataFrame(
        [(1, {"a": 2, "b": {"c": 3}}, [10, 20])],
        "id INT, s STRUCT<a INT, b STRUCT<c INT>>, arr ARRAY<INT>",
    )
    flat = df.transform(t("flatten_schema"))
    assert set(flat.columns) == {"id", "s_a", "s_b_c", "arr"}
    # max_level=N expands structs met at depths 1..N (reference recursion
    # is `level <= max_level`): max_level=1 keeps the nested struct intact
    one_level = df.transform(t("flatten_schema", max_level=1))
    assert set(one_level.columns) == {"id", "s_a", "s_b", "arr"}
    exploded = df.transform(t("explode_columns", explode_arrays=True))
    assert exploded.count() == 2


def test_from_to_json(spark):
    df = spark.createDataFrame([(1, '{"x": 5}')], "id INT, payload STRING")
    out = df.transform(
        t("from_json", input_col="payload", schema={"type": "struct", "fields": [
            {"name": "x", "type": "integer", "nullable": True, "metadata": {}}]})
    )
    # reference contract: original kept, parsed struct added as <col>_json
    assert out.columns == ["id", "payload", "payload_json"]
    assert out.first()["payload_json"]["x"] == 5
    back = spark.createDataFrame([(1, 5)], "id INT, x INT").transform(
        t("to_json", in_cols=["x"], out_col="j")
    )
    assert back.select("j").first()[0] == '{"x":5}'


def test_from_avro_with_registry_strips_header_and_fetches_schema(spark):
    # Confluent wire format: 0x00 magic + 4-byte schema id + avro body.
    # The decoder seam turns the stripped body into a struct so the test
    # verifies header stripping + registry resolution without spark-avro.
    from pyspark.sql import functions as F

    payload = bytes([0, 0, 0, 0, 7]) + b"avro-body"
    df = spark.createDataFrame([(1, payload)], "id INT, value BINARY")
    fetched = []

    def fake_fetch(registry, subject):
        fetched.append((registry, subject))
        return '{"type":"record"}'

    def fake_decode(body_col, schema_json):
        assert schema_json == '{"type":"record"}'
        return F.struct(F.decode(body_col, "UTF-8").alias("body"))

    out = df.transform(
        t(
            "from_avro_with_registry",
            schema_registry="http://registry.local:8081",
            value_schema="orders-value",
            fetch_schema=fake_fetch,
            avro_decode=fake_decode,
        )
    )
    assert out.first()["body"] == "avro-body"  # 5-byte header gone
    assert fetched == [("http://registry.local:8081", "orders-value")]


def test_from_avro_with_registry_decodes_key_too(spark):
    from pyspark.sql import functions as F

    row = (bytes(5) + b"k1", bytes(5) + b"v1")
    df = spark.createDataFrame([row], "key BINARY, value BINARY")
    out = df.transform(
        t(
            "from_avro_with_registry",
            schema_registry="http://r",
            value_schema="t-value",
            key_schema="t-key",
            expand_key=True,
            fetch_schema=lambda r, s: s,
            avro_decode=lambda c, s: F.struct(
                F.decode(c, "UTF-8").alias(f"{s.split('-')[1]}_body")
            ),
        )
    )
    r = out.first()
    assert r["value_body"] == "v1" and r["key_body"] == "k1"


def test_from_avro_with_registry_rejects_field_collisions(spark):
    # a decoded record field named like an existing column (here: 'topic')
    # would expand into a duplicate column name — must raise at plan time
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(bytes(5) + b"v1", "t0")], "value BINARY, topic STRING"
    )
    with pytest.raises(ValueError, match="topic.*collide"):
        df.transform(
            t(
                "from_avro_with_registry",
                schema_registry="http://r",
                value_schema="t-value",
                fetch_schema=lambda r, s: s,
                avro_decode=lambda c, s: F.struct(
                    F.decode(c, "UTF-8").alias("body"),
                    F.lit("x").alias("topic"),
                ),
            )
        )


def test_date_transformers(spark):
    df = spark.createDataFrame([("2024-03-05", "20240305101112")], "d STRING, ts STRING")
    out = df.transform(t("convert_to_date", cols=["d"]))
    assert dict(out.dtypes)["d"] == "date"
    out = df.transform(
        t("convert_to_timestamp", cols=["ts"], source_format="yyyyMMddHHmmss")
    )
    assert dict(out.dtypes)["ts"] == "timestamp"
    fmt = out.transform(t("format_date", cols=["ts"], target_format="yyyy/MM"))
    assert fmt.first()["ts"] == "2024/03"


def test_get_date_hierarchy(spark):
    df = spark.createDataFrame([("2024-03-05",)], "d STRING").selectExpr("CAST(d AS DATE) d")
    out = df.transform(t("get_date_hierarchy", cols=["d"]))
    row = out.first()
    assert (row["d_day"], row["d_month"], row["d_quarter"], row["d_year"]) == (5, 3, 1, 2024)


def test_add_current_date(spark):
    df = spark.createDataFrame([(1,)], "id INT")
    out = df.transform(t("add_current_date", output_col="load_ts"))
    assert dict(out.dtypes)["load_ts"] == "timestamp"


def test_replace_nulls(spark):
    df = spark.createDataFrame([(None, None)], "n INT, s STRING")
    out = df.transform(t("replace_nulls"))
    assert out.first().asDict() == {"n": -999, "s": "UNKNOWN"}


def test_repartition_and_coalesce(people):
    assert people.transform(t("repartition", num_partitions=2)).rdd.getNumPartitions() == 2
    assert people.transform(t("coalesce", num_partitions=1)).rdd.getNumPartitions() == 1


def test_cache_persist_unpersist(people):
    cached = people.transform(t("cache"))
    assert cached.is_cached
    cached.transform(t("unpersist"))
    p = people.transform(t("persist", storage_level="MEMORY_ONLY"))
    assert p.is_cached
    p.transform(t("unpersist"))


def test_sql_transformation(spark, people):
    people.createOrReplaceTempView("ppl")
    out = people.transform(t("sql_transformation", sql="SELECT max(age) AS m FROM ppl"))
    assert out.first()["m"] == 85


def test_custom_transformation(people):
    out = people.transform(
        t("custom_transformation", custom_transformer=lambda df: df.withColumn("one", F.lit(1)))
    )
    assert out.select("one").first()[0] == 1


def test_unknown_transformer_raises():
    with pytest.raises(Exception):
        t("definitely_not_registered")

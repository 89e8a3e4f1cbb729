"""GAB feature tests — lookup-config-driven cadence rollup over orders.

Models the reference's GAB golden test pattern
(``tests/feature/test_gab.py`` + ``tests/resources/feature/gab/`` there):
a lookup config row + a staged SQL template, executed through the public
``execute_gab`` API, verified against a duckdb oracle on the same parquet.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from lakehouse_engine_spark import execute_gab
from lakehouse_engine_spark.utils.gab_utils import (
    cadence_configuration_at_end_date,
    cadence_end,
    cadence_start,
    extended_window_calculator,
    render_template,
)

STAGE_SQL = """
SELECT
    {{ to_date }} AS to_date,
    {{ project_date_column }} AS order_date,
    o_orderpriority,
    COUNT(*) AS orders,
    SUM(o_totalprice) AS total_price
FROM {{ database }}.gab_orders {{ joins }}
WHERE {{ filter_date_column }} >= '{{ start_date }}'
  AND {{ filter_date_column }} < '{{ end_date }}'
GROUP BY ALL
"""

MAPPINGS = {
    "vw_orders_kpi": {
        "dimensions": {
            "from_date": "order_date",
            "to_date": "to_date",
            "d1": "o_orderpriority",
        },
        "metric": {
            "m1": {"metric_name": "orders", "calculated_metric": {}, "derived_metric": {}},
            "m2": {
                "metric_name": "total_price",
                "calculated_metric": {},
                "derived_metric": [
                    {"label": "discounted_total", "formula": "total_price * 0.9"}
                ],
            },
        },
        "filter": {},
    }
}


@pytest.fixture(scope="module")
def gab_env(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("gab")
    (base / "1_orders.sql").write_text(STAGE_SQL)
    spark.sql("CREATE DATABASE IF NOT EXISTS gab_db")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders.write.mode("overwrite").saveAsTable("gab_db.gab_orders")

    lookup = spark.createDataFrame(
        [
            (
                "9001",
                "orders_kpi",
                "GLOBAL",
                str(MAPPINGS),
                str(
                    {
                        "1": {
                            "file_path": "1_orders.sql",
                            "table_alias": "orders_kpi",
                            "storage_level": "",
                            "project_date_column": "o_orderdate",
                            "filter_date_column": "o_orderdate",
                            "repartition": {},
                        }
                    }
                ),
                str({"MONTH": {}, "WEEK": {}}),
                0,
                "MONDAY",
                "Y",
                "Low",
            )
        ],
        "query_id string, query_label string, query_type string, mappings string, "
        "intermediate_stages string, recon_window string, timezone_offset int, "
        "start_of_the_week string, is_active string, queue string",
    )
    lookup.write.mode("overwrite").saveAsTable("gab_db.lkp_query_builder")
    yield {"base": str(base), "sf_dir": sf_dir}
    spark.sql("DROP VIEW IF EXISTS gab_db.vw_orders_kpi")
    spark.sql("DROP TABLE IF EXISTS gab_db.gab_insights")
    spark.sql("DROP TABLE IF EXISTS gab_db.gab_orders")
    spark.sql("DROP TABLE IF EXISTS gab_db.lkp_query_builder")


def test_gab_monthly_rollup_matches_duckdb(spark, gab_env):
    execute_gab(
        {
            "query_label_filter": ["orders_kpi"],
            "queue_filter": ["Low"],
            "cadence_filter": ["MONTH"],
            "target_database": "gab_db",
            "source_database": "gab_db",
            "start_date": "1995-01-01",
            "end_date": "1995-03-31",
            "current_date": "2026-01-01",
            "rerun_flag": "N",
            "target_table": "gab_insights",
            "gab_base_path": gab_env["base"],
            "lookup_table": "gab_db.lkp_query_builder",
        }
    )
    got = (
        spark.table("gab_db.gab_insights")
        .filter("cadence = 'MONTH'")
        .selectExpr("cast(from_date as string)", "d1", "m1", "round(m2, 2)")
        .collect()
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT cast(date_trunc('month', o_orderdate) as varchar) AS from_date,
               o_orderpriority AS d1,
               cast(count(*) as double) AS m1,
               round(sum(o_totalprice), 2) AS m2
        FROM read_parquet('{gab_env["sf_dir"]}/orders.parquet')
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
        GROUP BY 1, 2
        """
    ).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)

    # consumption view is a CATALOG view in the target database
    view = spark.table("gab_db.vw_orders_kpi")
    assert {"o_orderpriority", "orders", "total_price", "discounted_total"} <= set(
        view.columns
    )
    row = view.filter("cadence = 'MONTH'").selectExpr(
        "round(discounted_total / total_price, 4) as ratio"
    ).first()
    assert row["ratio"] == pytest.approx(0.9, abs=1e-3)


def test_gab_rerun_is_idempotent(spark, gab_env):
    acon = {
        "query_label_filter": ["orders_kpi"],
        "queue_filter": ["Low"],
        "cadence_filter": ["MONTH"],
        "target_database": "gab_db",
        "source_database": "gab_db",
        "start_date": "1995-01-01",
        "end_date": "1995-03-31",
        "current_date": "2026-01-01",
        "rerun_flag": "Y",
        "target_table": "gab_insights",
        "gab_base_path": gab_env["base"],
        "lookup_table": "gab_db.lkp_query_builder",
    }
    execute_gab(acon)
    first = spark.table("gab_db.gab_insights").count()
    execute_gab(acon)  # DELETE+INSERT of the same window must not duplicate
    assert spark.table("gab_db.gab_insights").count() == first


def test_gab_week_cadence_uses_calendar_join(spark, gab_env):
    execute_gab(
        {
            "query_label_filter": ["orders_kpi"],
            "queue_filter": ["Low"],
            "cadence_filter": ["WEEK"],
            "target_database": "gab_db",
            "source_database": "gab_db",
            "start_date": "1995-01-02",
            "end_date": "1995-01-29",  # a Sunday → week end (Monday weeks)
            "current_date": "2026-01-01",
            "rerun_flag": "N",
            "target_table": "gab_insights",
            "gab_base_path": gab_env["base"],
            "lookup_table": "gab_db.lkp_query_builder",
        }
    )
    weeks = (
        spark.table("gab_db.gab_insights")
        .filter("cadence = 'WEEK'")
        .selectExpr("cast(from_date as string) f", "cast(to_date as string) t")
        .distinct()
        .collect()
    )
    assert len(weeks) > 0
    for r in weeks:
        # every bucket is a Monday-started, 7-day week
        import datetime

        f = datetime.date.fromisoformat(r["f"])
        t = datetime.date.fromisoformat(r["t"])
        assert f.weekday() == 0 and (t - f).days == 6


def test_cadence_window_helpers():
    import datetime

    assert cadence_start("2024-03-15", "MONTH") == datetime.datetime(2024, 3, 1)
    assert cadence_end("2024-03-15", "QUARTER") == datetime.datetime(2024, 3, 31)
    assert cadence_start("2024-01-03", "WEEK", "SUNDAY") == datetime.datetime(
        2023, 12, 31
    )
    due = cadence_configuration_at_end_date("2024-03-31")
    assert {"MONTH", "QUARTER", "DAY"} <= set(due)
    assert "YEAR" not in due

    b0, b1, f0, f1 = extended_window_calculator(
        "MONTH", "MONTH", "2026-01-01", "1995-01-15", "1995-03-20", "GLOBAL", "N", "N"
    )
    assert b0 == datetime.datetime(1995, 1, 1)
    assert b1 == datetime.datetime(1995, 4, 1)  # end-exclusive


def test_render_template_if_else():
    out = render_template(
        "{% if off == 0 %}plain{% else %}shifted {{ off }}{% endif %} {{ x }}",
        {"off": 0, "x": "col"},
    )
    assert out.strip() == "plain col"
    out2 = render_template(
        "{% if off == 0 %}plain{% else %}shifted{% endif %}", {"off": 2}
    )
    assert out2 == "shifted"


def test_gab_recon_window_recompute_folds_in_late_data(spark, sf_dir, tmp_path):
    """The reconciliation path end-to-end through the REAL GAB class (the
    behavior q29 replays in SQL): a DAY-cadence use case reconciled
    MONTHLY. Run 1 loads Jan+Feb without the late cohort; late rows then
    land in the source; run 2 executes on a month-end end_date, so
    reconciliation_cadences fires recon_cadence=MONTH and the whole of
    February is recomputed and DELETE+INSERTed. January buckets must
    still exclude the late rows; February buckets must include them."""
    base = tmp_path / "stages"
    base.mkdir()
    (base / "1_orders.sql").write_text(STAGE_SQL.replace("gab_orders", "gab_recon_orders"))
    spark.sql("CREATE DATABASE IF NOT EXISTS gab_db")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).filter(
        "o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-03-01'"
    )
    late = "o_orderkey % 7 = 0"
    orders.filter(f"NOT ({late})").write.mode("overwrite").saveAsTable(
        "gab_db.gab_recon_orders"
    )
    lookup = spark.createDataFrame(
        [
            (
                "9002", "orders_recon", "GLOBAL", str(MAPPINGS),
                str({
                    "1": {
                        "file_path": "1_orders.sql",
                        "table_alias": "orders_recon",
                        "storage_level": "",
                        "project_date_column": "o_orderdate",
                        "filter_date_column": "o_orderdate",
                        "repartition": {},
                    }
                }),
                str({"DAY": {"recon_window": {"MONTH": {"snapshot": "N"}}}}),
                0, "MONDAY", "Y", "Low",
            )
        ],
        "query_id string, query_label string, query_type string, mappings string, "
        "intermediate_stages string, recon_window string, timezone_offset int, "
        "start_of_the_week string, is_active string, queue string",
    )
    lookup.write.mode("overwrite").saveAsTable("gab_db.lkp_recon_builder")
    acon = {
        "query_label_filter": ["orders_recon"],
        "queue_filter": ["Low"],
        "cadence_filter": ["DAY"],
        "target_database": "gab_db",
        "source_database": "gab_db",
        "start_date": "1995-01-01",
        "end_date": "1995-02-28",   # month end -> MONTH recon cadence fires
        "current_date": "1995-03-05",
        "rerun_flag": "N",
        "target_table": "gab_recon_insights",
        "gab_base_path": str(base),
        "lookup_table": "gab_db.lkp_recon_builder",
    }
    try:
        execute_gab(acon)
        # late rows land in the source
        orders.filter(late).write.mode("append").saveAsTable(
            "gab_db.gab_recon_orders"
        )
        # recompute run: business date inside February, month-end end_date
        execute_gab({**acon, "start_date": "1995-02-28", "end_date": "1995-02-28"})

        got = {
            (str(r["from_date"]), r["d1"]): r["m1"]
            for r in spark.table("gab_db.gab_recon_insights")
            .selectExpr("from_date", "d1", "m1")
            .collect()
        }
        con = duckdb.connect()
        want_rows = con.execute(
            f"""
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS from_date,
                   o_orderpriority AS d1,
                   cast(count(*) as double) AS m1
            FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE o_orderdate >= DATE '1995-01-01'
              AND o_orderdate < DATE '1995-03-01'
              AND (o_orderdate >= DATE '1995-02-01' OR o_orderkey % 7 <> 0)
            GROUP BY 1, 2
            """
        ).fetchall()
        want = {(r[0], r[1]): r[2] for r in want_rows}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS gab_db.gab_recon_insights")
        spark.sql("DROP TABLE IF EXISTS gab_db.gab_recon_orders")
        spark.sql("DROP TABLE IF EXISTS gab_db.lkp_recon_builder")

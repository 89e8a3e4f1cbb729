"""Physical-plan quality gates for the headline queries.

These assert the *shape* that keeps the engine fast at 100 TB: dimension
joins broadcast (no shuffle of the fact side), filters reach the parquet
scan (PushedFilters), and projection pruning reaches ReadSchema. A plan
regression here is a performance bug even when results stay correct.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry


def _plans(df):
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.toString()


def test_three_table_join_broadcasts_dimensions(spark, sf_dir):
    df = entry.queries()["q02_revenue_by_segment"](spark, sf_dir)
    physical, full = _plans(df)
    assert physical.count("BroadcastHashJoin") >= 2, physical[:2000]
    assert "SortMergeJoin" not in physical
    # fact scan reads only the needed lineitem columns
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", full)
    assert m, full[:2000]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols <= {"l_orderkey", "l_extendedprice", "l_discount"}


def test_incremental_filter_pushes_down(spark, sf_dir):
    df = entry.queries()["q05_incremental_filter"](spark, sf_dir)
    _, full = _plans(df)
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(l_shipdate", full), full[:2000]


def test_gab_calendar_join_broadcasts(spark, sf_dir):
    df = entry.queries()["q17_gab_weekly_rollup"](spark, sf_dir)
    physical, _ = _plans(df)
    assert "BroadcastNestedLoopJoin" in physical or "BroadcastHashJoin" in physical
    assert "SortMergeJoin" not in physical


def test_pricing_summary_prunes_columns(spark, sf_dir):
    df = entry.queries()["q01_pricing_summary"](spark, sf_dir)
    _, full = _plans(df)
    m = re.search(r"ReadSchema: struct<([^\n]*)", full)
    assert m
    # the needed measure columns reach the scan…
    assert "l_quantity" in m.group(1) and "l_extendedprice" in m.group(1)
    # …and the wide unused ones are pruned out (display may truncate, so
    # check the leading, untruncated portion)
    head = m.group(1)[:80]
    assert "l_comment" not in head and "l_orderkey" not in head

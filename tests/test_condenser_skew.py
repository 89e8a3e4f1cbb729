"""Skew hardening for the condensers: AQE cannot split a window partition,
so the salted two-stage tournament is the scale path for hot keys. These
pin (a) result equivalence with the unsalted window at a 90%-one-key 1M-row
distribution, and (b) the two-Window plan shape that bounds per-task sorts."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lakehouse_engine_spark.core.definitions import TransformerSpec
from lakehouse_engine_spark.transformers.transformer_factory import TransformerFactory


def t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def _skewed_df(spark, n=1_000_000):
    # 90% of rows on key 0; ranking key `ver` is unique per key so the
    # winner is deterministic and comparable across strategies
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 97) + 1)
        .alias("k"),
        F.col("id").alias("ver"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )


def test_group_and_rank_salted_matches_unsalted_on_1m_skew(spark):
    df = _skewed_df(spark)
    plain = df.transform(t("group_and_rank", group_key=["k"], ranking_key=["ver"]))
    salted = df.transform(
        t("group_and_rank", group_key=["k"], ranking_key=["ver"],
          salt_partitions=32)
    )
    expected = {(r["k"], r["ver"], r["payload"]) for r in plain.collect()}
    got = {(r["k"], r["ver"], r["payload"]) for r in salted.collect()}
    assert got == expected
    # the hot key keeps its true max under both strategies
    assert max(v for k, v, _ in got if k == 0) == 999_998
    # salted plan = two Window stages: a salt-bracket window (partitioned by
    # the salt column) feeding the final window among ≤32 survivors.
    # (AQE plan strings repeat nodes in an "== Initial Plan ==" section —
    # count within the final plan only.)
    def final_windows(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"\bWindow \[", plan.split("== Initial Plan ==")[0])), plan

    n_salted, salted_plan = final_windows(salted)
    n_plain, plain_plan = final_windows(plain)
    assert "lhe_salt" in salted_plan and n_salted >= 2
    assert "lhe_salt" not in plain_plan and n_plain == 1


def test_condense_cdc_salted_keeps_suppression_semantics(spark):
    # the NEWEST image of key 0 carries an excluded record mode ('D'):
    # the key must vanish — also under the salted tournament, where the
    # validity filter still runs after the FINAL rank
    df = _skewed_df(spark, n=100_000).withColumn(
        "recordmode",
        F.when((F.col("k") == 0) & (F.col("ver") == 99_998), F.lit("D"))
        .otherwise(F.lit("")),
    )
    args = dict(
        business_key=["k"], ranking_key_desc=["ver"],
        valid_record_modes=["", "N"],
    )
    plain = df.transform(t("condense_record_mode_cdc", **args))
    salted = df.transform(
        t("condense_record_mode_cdc", salt_partitions=16, **args)
    )
    expected = {(r["k"], r["ver"]) for r in plain.collect()}
    got = {(r["k"], r["ver"]) for r in salted.collect()}
    assert got == expected
    assert 0 not in {k for k, _ in got}  # hot key suppressed, not resurrected

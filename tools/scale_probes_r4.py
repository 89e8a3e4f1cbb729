"""Round-4 operator scale probes: synthetic replication of the sf0.1
tables to stress the new operators' plans at 10-100x driver scale.
Results are recorded in BASELINE.md; run standalone:

    python tools/scale_probes_r4.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_engine_spark.core.definitions import TransformerSpec
from lakehouse_engine_spark.core.exec_env import ExecEnv
from lakehouse_engine_spark.transformers.transformer_factory import TransformerFactory

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def replicate(df, n, id_col, shift):
    """n copies with shifted ids (keeps key cardinality structure)."""
    return df.crossJoin(
        ExecEnv.get_or_create().range(n).withColumnRenamed("id", "__rep")
    ).withColumn(id_col, F.col(id_col) + F.col("__rep") * shift).drop("__rep")


def probe_fuzzy_join(spark):
    """10k mangled supplier names vs the 10k clean set, nation-blocked.
    Worst-case blocking: every synthetic name has the same length, so the
    length bands prune nothing and cost is pairs-per-block bound —
    25 blocks x 400x400 = 4M levenshtein DPs. (Real-name corpora have
    length spread; for uniform-length keys pick a stronger block key.)"""
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    big = replicate(sup, 10, "s_suppkey", 1_000_000).persist()
    n = big.count()
    mangle = (
        "concat(substring(s_name, 1, pmod(s_suppkey, length(s_name))), "
        "substring(s_name, pmod(s_suppkey, length(s_name)) + 2))"
    )
    left = big.selectExpr("s_suppkey AS l_id", "s_nationkey", f"{mangle} AS name_m")
    right = big.select("s_suppkey", "s_nationkey", "s_name")
    t0 = time.time()
    out = left.transform(
        t("fuzzy_join", right=right, left_col="name_m", right_col="s_name",
          max_distance=2, block_on=["s_nationkey"])
    )
    rows = out.count()
    print(f"fuzzy_join: {n} x {n} rows, {rows} matches, {time.time()-t0:.1f}s")
    big.unpersist()


def probe_merge_intervals(spark):
    """2M intervals over 30k keys through the running-max span windows."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big = replicate(ev, 20, "user_id", 1_000_000).persist()
    n = big.count()
    iv = big.selectExpr(
        "user_id", "ts AS s",
        "ts + make_dt_interval(0, 0, CAST(FLOOR(value % 30) AS INT) + 1, 0) AS e",
    )
    t0 = time.time()
    rows = iv.transform(
        t("merge_intervals", on=["user_id"], start_col="s", end_col="e")
    ).count()
    print(f"merge_intervals: {n} intervals -> {rows} spans, {time.time()-t0:.1f}s")
    big.unpersist()


def probe_scd2(spark):
    """2M state events over 30k keys: lag-filter-lead on one exchange."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big = replicate(ev, 20, "user_id", 1_000_000).persist()
    n = big.count()
    states = big.groupBy("user_id", "ts").agg(F.min("event_type").alias("state"))
    t0 = time.time()
    rows = states.transform(
        t("scd2_build", key_cols=["user_id"], ts_col="ts", attr_cols=["state"])
    ).count()
    print(f"scd2_build: {n} events -> {rows} versions, {time.time()-t0:.1f}s")
    big.unpersist()


def probe_cdc_chunk(spark):
    """100k documents (20x) through content-defined chunking — pure
    row-space array expressions, zero shuffle."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = replicate(docs, 20, "doc_id", 1_000_000).persist()
    n = big.count()
    t0 = time.time()
    rows = big.transform(t("text_cdc_chunk", window=8, divisor=16)).count()
    print(f"text_cdc_chunk: {n} docs -> {rows} chunks, {time.time()-t0:.1f}s")
    big.unpersist()


def probe_cluster_sample(spark):
    """40k embeddings (20x) through hyperplane bucketing + sqrt caps."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    big = replicate(emb, 20, "vec_id", 1_000_000).persist()
    n = big.count()
    t0 = time.time()
    rows = big.transform(t("cluster_sample", num_planes=6, dim=64)).count()
    print(f"cluster_sample: {n} vectors -> {rows} sampled, {time.time()-t0:.1f}s")
    big.unpersist()


def probe_ewma(spark):
    """2M rows over 30k keys through the sorted-partition mapInPandas fold."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big = replicate(ev, 20, "user_id", 1_000_000).persist()
    n = big.count()
    series = big.groupBy("user_id", "ts").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v")
    )
    t0 = time.time()
    rows = series.transform(
        t("streaming_ewma_anomaly", on=["user_id"], value_col="v",
          ts_col="ts", alpha=0.25, threshold=2.5, min_periods=5)
    ).count()
    print(f"streaming_ewma_anomaly: {n} rows, {time.time()-t0:.1f}s")
    big.unpersist()


PROBES = {
    "fuzzy_join": probe_fuzzy_join,
    "merge_intervals": probe_merge_intervals,
    "scd2": probe_scd2,
    "cdc_chunk": probe_cdc_chunk,
    "cluster_sample": probe_cluster_sample,
    "ewma": probe_ewma,
}




def probe_snapshot_diff(spark):
    """3M-row snapshots through the full-outer key diff."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    old = replicate(orders, 20, "o_orderkey", 100_000_000).persist()
    n = old.count()
    new = old.filter("o_orderkey % 97 != 0").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    )
    t0 = time.time()
    res = {r["status"]: r["n"] for r in new.transform(
        t("snapshot_diff", right=old, key_cols=["o_orderkey"],
          compare_cols=["o_totalprice", "o_orderstatus"])
    ).collect()}
    print(f"snapshot_diff: {n} x {n} rows -> {res}, {time.time()-t0:.1f}s")
    old.unpersist()


PROBES["snapshot_diff"] = probe_snapshot_diff


if __name__ == "__main__":
    only = sys.argv[1:]
    spark = ExecEnv.get_or_create()
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)

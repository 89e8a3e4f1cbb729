"""Round-5 operator scale probes: gap_fill near-cap grids (the sequence()
expansion surface), funnel at 2M+ events, line-dedup at 100k docs.
Results are recorded in BASELINE.md; run standalone:

    python tools/scale_probes_r5.py [probe ...]
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


def probe_gap_fill_dense(spark):
    """The sequence() blow-up surface: 32 sparse keys, each with TWO events
    ~11 days apart, filled at '1 second' → ~960k buckets per key, just
    under the 1M default cap — 30M output rows materialized from 64 input
    rows. Measures the per-key array expansion + explode + grid join."""
    rows = spark.range(32).selectExpr(
        "concat('k', id) AS k",
        "to_timestamp_ntz('2024-01-01 00:00:00') AS ts",
        "1.0 AS v",
    ).union(
        spark.range(32).selectExpr(
            "concat('k', id) AS k",
            "to_timestamp_ntz('2024-01-12 02:39:59') AS ts",
            "2.0 AS v",
        )
    )
    t0 = time.time()
    out = rows.transform(
        t("gap_fill", on=["k"], ts_col="ts", step="1 second",
          aggs={"n": "CAST(count(1) AS LONG)"}, fill={"n": 0})
    )
    n = out.count()
    print(f"gap_fill_dense: 64 events -> {n} grid rows, {time.time()-t0:.1f}s")
    # and the cap trips cleanly one second past it
    bad = rows.withColumn(
        "ts",
        F.when(F.col("v") == 2.0,
               F.expr("to_timestamp_ntz('2024-01-13 00:00:00')")).otherwise(
            F.col("ts")
        ),
    )
    t0 = time.time()
    try:
        bad.transform(
            t("gap_fill", on=["k"], ts_col="ts", step="1 second",
              aggs={"n": "count(1)"})
        ).count()
        print("gap_fill_cap: ERROR — no raise")
    except Exception as exc:
        ok = "gap_fill: a key's grid needs" in str(exc)
        print(f"gap_fill_cap: raised={ok} in {time.time()-t0:.1f}s (fail-fast)")


def probe_funnel(spark):
    """sf0.1 events replicated 20x -> 2M events, 30k users, 3-stage funnel.
    Cost profile: one user-keyed exchange, stacked min-ts conditional
    aggregation per stage — no per-stage joins."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big = ev.crossJoin(
        ExecEnv.get_or_create().range(20).withColumnRenamed("id", "__rep")
    ).withColumn(
        "user_id", F.col("user_id") + F.col("__rep") * 1_000_000
    ).drop("__rep").persist()
    n = big.count()
    t0 = time.time()
    out = big.transform(
        t("funnel", on=["user_id"], stage_col="event_type", ts_col="ts",
          stages=["view", "click", "purchase"])
    )
    rows = out.count()
    print(f"funnel: {n} events -> {rows} stage rows, {time.time()-t0:.1f}s")
    big.unpersist()


def probe_line_dedup(spark):
    """sf0.1 documents replicated 20x -> 100k docs with every line
    duplicated 20-fold across the corpus: worst case for first-occurrence
    line dedup (every hash bucket is hot). Digest-keyed window, ids-only."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = docs.crossJoin(
        ExecEnv.get_or_create().range(20).withColumnRenamed("id", "__rep")
    ).withColumn(
        "doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000
    ).drop("__rep").persist()
    n = big.count()
    t0 = time.time()
    out = big.transform(t("text_line_dedup"))
    rows = out.count()
    print(f"line_dedup: {n} docs -> {rows} rows, {time.time()-t0:.1f}s")
    big.unpersist()


PROBES = {
    "gap_fill_dense": probe_gap_fill_dense,
    "funnel": probe_funnel,
    "line_dedup": probe_line_dedup,
}


def probe_codec_throughput(spark):
    """20k constructed payloads per codec (PNG with cycling filters, GIF
    real-LZW, baseline JPEG) through multimodal_image_decode — measures
    the native decoders' Arrow-batched throughput. JPEG is entropy-serial
    Python and documented fixture-grade; PNG/GIF inflate/LZW are also
    serial but cheaper; all scale linearly with cores and payload count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from lakehouse_engine_spark.datapipes.media_codecs import encode_gif, encode_png
    from lakehouse_engine_spark.datapipes.media_jpeg import encode_jpeg

    n = 20_000
    for name, maker in (
        ("png", lambda i: encode_png(
            np.full((16, 16, 3), (i % 256, (3 * i) % 256, (7 * i) % 256),
                    dtype=np.uint8),
            row_filters=[y % 5 for y in range(16)])),
        ("gif", lambda i: encode_gif(
            np.full((16, 16, 3), (i % 256, (3 * i) % 256, (7 * i) % 256),
                    dtype=np.uint8))),
        ("jpeg", lambda i: encode_jpeg(
            np.full((16, 16, 3), (i % 256, (3 * i) % 256, (7 * i) % 256),
                    dtype=np.uint8))),
    ):
        def _mk(ids, maker=maker):
            return pd.Series([maker(int(i)) for i in ids])

        mk = F.pandas_udf(_mk, "binary")
        payloads = spark.range(n).select(
            F.col("id"), mk("id").alias("payload")
        ).persist()
        rows = payloads.count()  # materialize fixtures OUTSIDE the timing
        t0 = time.time()
        decoded = payloads.transform(t("multimodal_image_decode", id_col="id"))
        ok = decoded.filter("codec IS NOT NULL").count()
        dt = time.time() - t0
        print(f"codec_{name}: {rows} payloads decoded={ok} in {dt:.1f}s"
              f" ({rows/dt:,.0f} img/s)")
        payloads.unpersist()


PROBES["codec_throughput"] = probe_codec_throughput


def probe_pagerank(spark):
    """1M-edge synthetic graph (200k nodes, out-degree 5), 5 iterations —
    measures the per-round join+agg cadence at 12 exchanges total."""
    from pyspark.sql import functions as F

    edges = spark.range(200_000).selectExpr("id AS src").crossJoin(
        spark.range(5).withColumnRenamed("id", "k")
    ).selectExpr("src", "(src * 7 + k * 13 + 1) % 200000 AS dst")
    t0 = time.time()
    out = edges.transform(t("graph_pagerank", iterations=5))
    n = out.count()
    total = out.agg(F.sum("rank_s")).first()[0]
    print(f"pagerank: 1M edges, {n} nodes, 5 iters in {time.time()-t0:.1f}s"
          f" (mass {total/1e12:.6f})")


def probe_bm25(spark):
    """sf0.1 documents replicated 20x -> 100k docs, 5 keyword queries:
    the corpus-side broadcast-prune means shuffled volume is matching
    tokens only."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = docs.crossJoin(
        ExecEnv.get_or_create().range(20).withColumnRenamed("id", "__rep")
    ).withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000
    ).drop("__rep").persist()
    n = big.count()
    qs = spark.createDataFrame(
        [(1, "hash join strategy"), (2, "window agg stream"),
         (3, "vector scan filter"), (4, "slow merge sort"),
         (5, "spark query plan")],
        "query_id LONG, query STRING",
    )
    t0 = time.time()
    out = big.transform(t("text_bm25_topk", queries_df=qs, k=10))
    rows = out.count()
    print(f"bm25: {n} docs, 5 queries -> {rows} rows in {time.time()-t0:.1f}s")
    big.unpersist()


PROBES["pagerank"] = probe_pagerank
PROBES["bm25"] = probe_bm25



def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

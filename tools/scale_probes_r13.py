"""Round-13 scale probes (run on local[32]; results recorded in BASELINE.md).

Usage::

    python tools/scale_probes_r13.py [probe ...]

* ``quality_buckets_10x`` — quality_bucket_split (dp149) AND the
  streaming_quality_buckets batch arm (dp152) over a 50k-doc corpus
  (10x sf0.1). Both are histogram-shaped: one map-side-combined
  aggregate over (group, score), a cumulative window over DISTINCT
  grid values, and (for dp149) a broadcast attach — wall should track
  corpus volume while the tier table stays grid-sized. The probe
  reports the grid size so the bounded-grid contract is visible.

* ``ccnet_10x`` — the full q33 chain (text_lm_score → persist →
  quality_bucket_split → mixture_sample) at 10x through the same ACON
  surface. Confirms the persist splice collapses the lm-score chain to
  ONE corpus pass regardless of how many downstream consumers read it.

* ``char_entropy_10x`` — text_char_entropy (dp151) at 10x: two keyed
  map-side-combined aggregations over exploded characters; wall should
  track total characters.

* ``streaming_quality_buckets_1m`` — the dp152 STREAMING arm over 1M
  scored events / 100 groups x 997-value per-group grid in two
  availableNow micro-batches: per-group state is the (score → count)
  map (O(grid)), per-batch work one dict merge + sort per group.
  Emission volume = groups x grid x batches (~200k snapshot rows).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_engine_spark.core.definitions import TransformerSpec  # noqa: E402
from lakehouse_engine_spark.core.exec_env import ExecEnv  # noqa: E402
from lakehouse_engine_spark.transformers.transformer_factory import (  # noqa: E402
    TransformerFactory,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = {}

BUCKETS = {"head": 3, "middle": 3, "tail": 4}


def _t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def _docs_10x(spark):
    """50k docs: sf0.1 documents x10 with distinct ids and rotated text
    (textually distinct copies — same staging as the r12 probes)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(10).withColumnRenamed("id", "__c"))
        .withColumn("__shift", (F.col("__c") * 29 + 1).cast("int"))
        .select(
            (F.col("doc_id") * 10 + F.col("__c")).alias("doc_id"),
            F.col("lang"),
            (F.col("n_chars") + F.col("__c")).alias("n_chars"),
            F.expr(
                "concat(substring(text, __shift, 100000), ' ', "
                "substring(text, 1, __shift - 1))"
            ).alias("text"),
        )
        .repartition(32)
    )
    loc = "/tmp/probe_docs10x_r13"
    big.write.mode("overwrite").parquet(loc)
    return spark.read.parquet(loc)


def probe_quality_buckets_10x(spark):
    big = _docs_10x(spark)
    n = big.count()
    t0 = time.time()
    tagged = big.transform(
        _t("quality_bucket_split", score_col="n_chars", buckets=BUCKETS,
           group_cols=["lang"])
    )
    dist = tagged.groupBy("bucket").count().collect()
    t1 = time.time() - t0
    t0 = time.time()
    table = big.transform(
        _t("streaming_quality_buckets", on=["lang"], score_col="n_chars",
           buckets=BUCKETS)
    )
    grid = table.count()
    t2 = time.time() - t0
    print(
        f"[quality_buckets_10x] {n} docs: attach (dp149) {t1:.1f}s "
        f"{sorted((r['bucket'], r['count']) for r in dist)}; "
        f"tier table (dp152 batch arm) {t2:.1f}s, grid={grid} rows "
        f"(state bound per group = distinct scores, not corpus size)"
    )


PROBES["quality_buckets_10x"] = probe_quality_buckets_10x


def probe_ccnet_10x(spark):
    big = _docs_10x(spark)
    n = big.count()
    t0 = time.time()
    out = (
        big.transform(_t("text_lm_score", top_v=500))
        .persist()
        .transform(
            _t("quality_bucket_split", score_col="avg_logprob",
               buckets=BUCKETS, group_cols=["lang"])
        )
        .transform(
            _t("mixture_sample", group_col="bucket", id_col="doc_id",
               weights={"head": 1.0, "middle": 0.5, "tail": 0.1})
        )
    )
    kept = out.count()
    print(
        f"[ccnet_10x] {n} docs scored+tiered+downsampled in "
        f"{time.time() - t0:.1f}s; {kept} docs kept"
    )


PROBES["ccnet_10x"] = probe_ccnet_10x


def probe_char_entropy_10x(spark):
    big = _docs_10x(spark)
    n = big.count()
    t0 = time.time()
    out = big.transform(_t("text_char_entropy"))
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars_counted").alias("chars"),
    ).collect()[0]
    print(
        f"[char_entropy_10x] {n} docs / {agg['chars']} chars in "
        f"{time.time() - t0:.1f}s"
    )


PROBES["char_entropy_10x"] = probe_char_entropy_10x


def probe_streaming_quality_buckets_1m(spark):
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="probe_qbuckets_")
    src, out, ck = [os.path.join(base, d) for d in ("src", "out", "ck")]
    try:
        for half in (0, 1):
            (
                spark.range(500_000)
                .select(
                    (F.col("id") % 100).alias("grp"),
                    # 997-value grid (prime, coprime with the group
                    # modulus, so EVERY group sees the full grid — the
                    # bounded-grid contract's worst in-contract case)
                    (((F.col("id") + half * 500_000) * 2654435761)
                     % 997).cast("double").alias("v"),
                )
                .coalesce(4)
                .write.mode("append")
                .parquet(src)
            )
        op = _t(
            "streaming_quality_buckets", on=["grp"], score_col="v",
            buckets=BUCKETS,
        )
        t0 = time.time()
        q = (
            spark.readStream.schema("grp BIGINT, v DOUBLE")
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
            .transform(op)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        n = spark.read.parquet(out).count()
        print(
            f"[streaming_quality_buckets_1m] 1M events / 100 groups x "
            f"997-value per-group grid in {time.time() - t0:.1f}s "
            f"end-to-end, {n} snapshot rows"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


PROBES["streaming_quality_buckets_1m"] = probe_streaming_quality_buckets_1m


def _emb_10x(spark):
    """20k vectors: sf0.1 embeddings x10 with distinct ids and a
    copy-specific deterministic perturbation (distinct directions, so
    ANN candidate structure is real rather than 10 exact clones)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    big = (
        emb.crossJoin(spark.range(10).withColumnRenamed("id", "__c"))
        .select(
            (F.col("vec_id") * 10 + F.col("__c")).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + 0.01 * __c * "
                "CASE WHEN i % 2 = 0 THEN 1 ELSE -1 END AS FLOAT))"
            ).alias("embedding"),
        )
        .repartition(32)
    )
    loc = "/tmp/probe_emb10x_r13"
    big.write.mode("overwrite").parquet(loc)
    return spark.read.parquet(loc)


def probe_ann_rerank_10x(spark):
    """knn_pq_refine and knn_mmr_rerank over a 20k-vector corpus, 100
    queries: the ADC/relevance scans dominate (one corpus pass each),
    the gather stays a broadcast semi-join of 100 x shortlist ids, and
    the re-rank windows/greedy groups stay shortlist-sized — wall
    should track corpus volume, emission stays queries x k."""
    big = _emb_10x(spark)
    n = big.count()
    t0 = time.time()
    ref = big.transform(
        _t("knn_pq_refine", k=5, shortlist=20, m=4, num_codes=16,
           query_filter="vec_id < 100")
    )
    nr = ref.count()
    t1 = time.time() - t0
    t0 = time.time()
    mmr = big.transform(
        _t("knn_mmr_rerank", k=5, shortlist=20, lam_permille=300,
           query_filter="vec_id < 100")
    )
    nm = mmr.count()
    t2 = time.time() - t0
    print(
        f"[ann_rerank_10x] {n} vectors / 100 queries: pq_refine "
        f"{t1:.1f}s ({nr} rows), mmr_rerank {t2:.1f}s ({nm} rows)"
    )


PROBES["ann_rerank_10x"] = probe_ann_rerank_10x


def probe_merge_fallback_1m(spark):
    """The parquet merge fallback is O(target) by design (full
    join-rewrite + atomic overwrite — real Delta touches only matched
    files). This probe puts a number on that trade at 1M target rows /
    10k-row delta, measured end-to-end through the public load_data
    merge path (WriterLock engaged), so the degraded-runtime cost model
    in BASELINE.md is a measurement, not an estimate."""
    import shutil
    import tempfile

    from lakehouse_engine_spark import load_data

    base = tempfile.mkdtemp(prefix="probe_merge_")
    tgt = os.path.join(base, "tgt")
    try:
        (
            spark.range(1_000_000)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("v"),
                F.lit("base").alias("src"),
            )
            .repartition(32)
            .write.parquet(tgt)
        )
        delta = spark.range(10_000).select(
            (F.col("id") * 100).alias("k"),
            F.lit(-1).cast("long").alias("v"),
            F.lit("delta").alias("src"),
        )
        t0 = time.time()
        load_data(
            {
                "input_specs": [
                    {"spec_id": "new", "data_format": "dataframe",
                     "df_name": delta}
                ],
                "output_specs": [
                    {"spec_id": "o", "input_id": "new",
                     "data_format": "parquet", "location": tgt,
                     "write_type": "merge",
                     "merge_opts": {
                         "merge_predicate": "current.k = new.k"
                     }}
                ],
            }
        )
        dt = time.time() - t0
        got = spark.read.parquet(tgt)
        n = got.count()
        upd = got.filter("src = 'delta'").count()
        print(
            f"[merge_fallback_1m] 1M-row target, 10k-row delta: "
            f"{dt:.1f}s end-to-end (join-rewrite + atomic overwrite, "
            f"lock engaged); {n} rows after, {upd} updated"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


PROBES["merge_fallback_1m"] = probe_merge_fallback_1m


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

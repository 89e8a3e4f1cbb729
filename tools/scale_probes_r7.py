"""Round-7 operator scale probes: the rewritten k-means assignment at
k=64/dim=256/1M vectors (with plan-BUILD time recorded separately from
execution — the round-6 defect was 78 s of driver planning for 0.15 s of
work), and the two new multi-second corpus aggregates from round 6
(corpus_overlap_stats, text_ngram_counts) at 100k docs. Results are
recorded in BASELINE.md; run standalone:

    python tools/scale_probes_r7.py [probe ...]
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

PROBES = {}


def t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def probe_kmeans_1m_k64_d256(spark):
    """embedding_kmeans at 1M vectors x 256 dims, k=64, 2 Lloyd rounds —
    the configuration whose ROUND-6 formulation would have spent hours in
    Catalyst analysis (O(k^2*dim) literal trees) and whose O(k*dim)
    scalar expansion dies at Janino's 64 KB method limit by k*dim ~ 1024.
    The Arrow-batched int64 kernel keeps the plan constant-size, so the
    interesting numbers are (a) transform BUILD time — driver-side
    planning + 2 iteration rounds of k*dim-row collects — and (b) the
    final assignment action. 256-dim vectors are synthesized by tiling
    the sf0.1 embeddings 4x wide and 500x tall with per-replica jitter."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    wide = emb.select(
        "vec_id",
        F.flatten(
            F.array(*[
                F.transform("embedding", lambda x: x + F.lit(0.001) * i)
                for i in range(4)
            ])
        ).alias("embedding"),
    )
    big = (
        wide.crossJoin(spark.range(500).withColumnRenamed("id", "__rep"))
        .select(
            (F.col("vec_id") * 1000 + F.col("__rep")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("__rep").cast("double") / 997.0
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    n = big.count()
    t0 = time.time()
    out = big.transform(t("embedding_kmeans", k=64, iterations=2))
    t_build = time.time() - t0
    t0 = time.time()
    stats = out.groupBy("cluster").count().orderBy(F.desc("count"))
    top = stats.first()
    t_exec = time.time() - t0
    n_clusters = stats.count()
    print(
        f"[kmeans_1m_k64_d256] {n} vectors x 256 dims, k=64, 2 rounds: "
        f"build (planning + 2 Lloyd collects) {t_build:.1f}s, final "
        f"assignment+agg {t_exec:.1f}s, {n_clusters} non-empty clusters, "
        f"largest {top['count']}"
    )
    big.unpersist()


PROBES["kmeans_1m_k64_d256"] = probe_kmeans_1m_k64_d256


def probe_corpus_overlap_100k(spark):
    """corpus_overlap_stats at 100k docs vs a 10k-doc reference corpus —
    the two distinct-shingle aggregates + semi-join audit at 20x the
    oracle scale. Cost should be linear in corpus shingles (map-side
    combined distincts), with the overlap a bucket-keyed semi-join."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .withColumn(
            "text",
            F.concat_ws(
                " ", F.col("text"),
                F.concat(F.lit("uniq"), F.col("doc_id") % 50_000),
            ),
        )
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    other = docs.limit(500).crossJoin(
        spark.range(20).withColumnRenamed("id", "__rep")
    ).withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000).drop(
        "__rep"
    )
    n = big.count()
    t0 = time.time()
    row = big.transform(t("corpus_overlap_stats", other_df=other)).first()
    dt = time.time() - t0
    print(
        f"[corpus_overlap_100k] {n} docs vs 10k reference: {dt:.1f}s "
        f"({row.asDict()})"
    )
    big.unpersist()


PROBES["corpus_overlap_100k"] = probe_corpus_overlap_100k


def probe_ngram_counts_100k(spark):
    """text_ngram_counts at 100k docs: the corpus n-gram count aggregate
    at 20x oracle scale — one explode + map-side-combined count with a
    TakeOrderedAndProject top-k cut (no global sort). Linear in corpus
    tokens."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    n = big.count()
    t0 = time.time()
    out = big.transform(t("text_ngram_counts", n=3, k=1000)).collect()
    dt = time.time() - t0
    print(
        f"[ngram_counts_100k] {n} docs, 3-grams top-1000: {len(out)} rows "
        f"in {dt:.1f}s"
    )
    big.unpersist()


PROBES["ngram_counts_100k"] = probe_ngram_counts_100k


def probe_dsir_100k(spark):
    """text_dsir_score at 100k source docs vs a 5k-doc target slice:
    two gram-explode bucket aggregates (~20M grams total) + the
    broadcast-attached scoring join + one doc-keyed aggregate. Linear
    in corpus grams; the bucket table stays 10k rows at any corpus
    size."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    n = big.count()
    target = big.filter("doc_id % 20 = 0")
    t0 = time.time()
    out = big.transform(t("text_dsir_score", target_df=target))
    cnt = out.filter("dsir_score > 0").count()
    dt = time.time() - t0
    print(f"[dsir_100k] {n} docs vs 5k target: {dt:.1f}s, "
          f"{cnt} docs score target-positive")
    big.unpersist()


PROBES["dsir_100k"] = probe_dsir_100k


def probe_pq_1m(spark):
    """embedding_pq_encode + knn_pq at 1M x 64-dim vectors (m=4, 256
    codes): both are one Arrow-batched corpus pass; the ANN side adds
    only the per-query top-k window over corpus x n_queries skinny
    rows."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    big = (
        emb.crossJoin(spark.range(500).withColumnRenamed("id", "__rep"))
        .select(
            (F.col("vec_id") * 1000 + F.col("__rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + F.col("__rep").cast("double") / 997.0,
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    n = big.count()
    t0 = time.time()
    enc = big.transform(t("embedding_pq_encode", m=4, k=256))
    total = enc.selectExpr("sum(pq_code_dist) AS s").first()["s"]
    t_enc = time.time() - t0
    t0 = time.time()
    ann = big.transform(
        t("knn_pq", k=10, m=4, num_codes=256, query_filter="vec_id < 8")
    )
    rows = ann.count()
    t_ann = time.time() - t0
    print(f"[pq_1m] {n} vectors: encode {t_enc:.1f}s (residual sum "
          f"{total}), ADC top-10 for 8 queries {t_ann:.1f}s ({rows} rows)")
    big.unpersist()


PROBES["pq_1m"] = probe_pq_1m


def probe_cc_path_1m(spark):
    """graph_connected_components on the adversarial shapes: (a) a
    1M-node PATH (diameter 10^6 — naive min-propagation would need 10^6
    rounds / 2x10^6 shuffles; the alternating star transform contracts
    it in O(log^2 n) rounds), and (b) a 1M-leaf STAR hub merged with a
    100k-node path (degree skew: one node touches 1M edges — the min
    combine is map-side partial, no neighbor-list materialization)."""
    n = 1_000_000
    path = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t0 = time.time()
    out = path.transform(t("graph_connected_components", max_iterations=60))
    comps = out.agg(
        F.countDistinct("component").alias("c"), F.count("*").alias("n")
    ).collect()[0]
    dt = time.time() - t0
    print(f"[cc_path_1m] path 1M nodes: {comps['c']} component(s) over "
          f"{comps['n']} nodes in {dt:.1f}s")
    assert comps["c"] == 1 and comps["n"] == n
    hub = spark.range(n).select(
        F.lit(5_000_000).alias("src"), (F.col("id") + 2_000_000).alias("dst")
    )
    tail = spark.range(100_000).select(
        (F.col("id") + 2_000_000).alias("src"),
        (F.col("id") + 2_000_001).alias("dst"),
    )
    t0 = time.time()
    out = hub.unionAll(tail).transform(
        t("graph_connected_components", max_iterations=60)
    )
    comps = out.agg(
        F.countDistinct("component").alias("c"), F.count("*").alias("n")
    ).collect()[0]
    dt = time.time() - t0
    print(f"[cc_hub_1m] 1M-leaf hub + 100k path: {comps['c']} component(s) "
          f"over {comps['n']} nodes in {dt:.1f}s")
    assert comps["c"] == 1


PROBES["cc_path_1m"] = probe_cc_path_1m


def probe_pca_1m_d256(spark):
    """embedding_pca at 1M vectors x 256 dims: the moments pass is one
    Arrow scan emitting <= dim*(dim+3)/2+1 partial rows per partition
    (dim^2-sized shuffle, row-count independent), eigh is driver-side
    O(dim^3), the projection a second stateless Arrow pass. Records the
    fit (moments+eigh) and project+agg phases separately."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    wide = emb.select(
        "vec_id",
        F.flatten(
            F.array(*[
                F.transform("embedding", lambda x: x + F.lit(0.001) * i)
                for i in range(4)
            ])
        ).alias("embedding"),
    )
    big = (
        wide.crossJoin(spark.range(500).withColumnRenamed("id", "__rep"))
        .select(
            (F.col("vec_id") * 1000 + F.col("__rep")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("__rep").cast("double") / 997.0
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    n = big.count()
    t0 = time.time()
    out = big.transform(t("embedding_pca", n_components=16))
    t_fit = time.time() - t0
    t0 = time.time()
    agg = out.select(
        F.avg(F.element_at("pca", 1)).alias("m1"),
        F.count("*").alias("n"),
    ).first()
    t_proj = time.time() - t0
    print(
        f"[pca_1m_d256] {n} vectors x 256 dims -> 16 components: "
        f"fit (1 Arrow moments pass + driver eigh) {t_fit:.1f}s, "
        f"project+agg {t_proj:.1f}s, mean(PC1)={agg['m1']:.3e} "
        f"(centered => ~0) over {agg['n']} rows"
    )
    big.unpersist()


PROBES["pca_1m_d256"] = probe_pca_1m_d256


def probe_frequent_terms_100k(spark):
    """text_frequent_terms at 100k docs (20x oracle scale): two corpus
    scans — a Misra-Gries candidate pass whose shuffle is bounded by
    k = ceil(1/min_support)+1 rows per partition regardless of
    vocabulary size, then a broadcast-pruned exact recount. Compare
    against the groupBy-everything shape vocab_top_k uses (which
    shuffles every distinct term)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    n = big.count()
    t0 = time.time()
    out = big.transform(t("text_frequent_terms", min_support=0.001)).collect()
    dt = time.time() - t0
    print(
        f"[frequent_terms_100k] {n} docs, min_support=0.1%: {len(out)} "
        f"exact heavy hitters in {dt:.1f}s (candidate shuffle bounded at "
        f"1001 rows/partition)"
    )
    big.unpersist()


PROBES["frequent_terms_100k"] = probe_frequent_terms_100k


def probe_hilbert_vs_zorder_spans(spark):
    """The file-skipping comparison layout_hilbert exists for: lay 10M
    (x, y) rows into 64 range partitions by Morton key vs Hilbert key,
    then measure the per-partition min/max BOX on each dimension — the
    exact statistics parquet footers would carry, partition = file proxy.
    Skipping power is the mean normalized box AREA (smaller = a point
    predicate on either dim prunes more files). Hilbert's unit-step
    adjacency removes Morton's cross-space seams, so its boxes should be
    measurably tighter at equal cost."""
    df = spark.range(10_000_000).selectExpr(
        "id",
        "cast(id % 3163 as long) AS x",
        "cast((id * 2654435761) % 3163 as long) AS y",
    )

    def boxes(out, key):
        p = out.withColumn("__pid", F.spark_partition_id())
        stats = (
            p.groupBy("__pid")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        span = 3163.0
        area = sum(
            ((r["x1"] - r["x0"] + 1) / span) * ((r["y1"] - r["y0"] + 1) / span)
            for r in stats
        ) / len(stats)
        return area, len(stats)

    t0 = time.time()
    hz = df.transform(
        t("layout_hilbert", cols=["x", "y"], bits_per_col=8,
          num_partitions=64)
    )
    a_h, n_h = boxes(hz, "hilbert_key")
    dt_h = time.time() - t0
    t0 = time.time()
    zz = df.transform(
        t("layout_zorder", cols=["x", "y"], bits_per_col=8,
          num_partitions=64)
    )
    a_z, n_z = boxes(zz, "zorder_key")
    dt_z = time.time() - t0
    print(
        f"[hilbert_vs_zorder] 10M rows, 64 partitions: mean normalized "
        f"min/max box area hilbert={a_h:.4f} ({dt_h:.1f}s, {n_h} parts) "
        f"vs zorder={a_z:.4f} ({dt_z:.1f}s, {n_z} parts) — "
        f"{a_z / a_h:.2f}x tighter"
    )


PROBES["hilbert_vs_zorder_spans"] = probe_hilbert_vs_zorder_spans


def probe_frequent_trigrams_100k(spark):
    """text_frequent_terms ngram=3 at 100k docs — the unbounded-
    vocabulary regime the MG pass exists for: the distinct 3-gram count
    here is corpus-sized (millions), but the candidate shuffle stays at
    k+1 = 1001 rows per partition. Contrast: text_ngram_counts must
    shuffle every distinct shingle a partition holds."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    n = big.count()
    distinct_grams = (
        big.selectExpr(
            "explode(filter(transform(sequence(1, greatest(size(split(trim("
            "lower(text)), '\\\\s+')) - 2, 1)), i -> concat_ws(' ', slice("
            "split(trim(lower(text)), '\\\\s+'), i, 3))), s -> s <> '')) g"
        )
        .agg(F.approx_count_distinct("g"))
        .first()[0]
    )
    t0 = time.time()
    out = big.transform(
        t("text_frequent_terms", min_support=0.001, ngram=3)
    ).collect()
    dt = time.time() - t0
    print(
        f"[frequent_trigrams_100k] {n} docs, ~{distinct_grams} distinct "
        f"3-grams, min_support=0.1%: {len(out)} exact heavy hitters in "
        f"{dt:.1f}s (candidate shuffle capped at 1001 rows/partition)"
    )
    big.unpersist()


PROBES["frequent_trigrams_100k"] = probe_frequent_trigrams_100k


def probe_decontaminate_spans_100k(spark):
    """text_decontaminate_spans at 100k docs vs a 5k-doc benchmark: the
    islands path must touch only CONTAMINATED documents (~5% here), so
    cost is the broadcast gram probe + a small exploded window."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    n = big.count()
    bench = docs.filter("doc_id % 10 = 0").selectExpr("doc_id AS bid", "text")
    t0 = time.time()
    out = big.transform(
        t("text_decontaminate_spans", benchmark_df=bench, ngram=8,
          min_fragment_tokens=5)
    )
    stats = out.selectExpr(
        "count(*) AS docs",
        "sum(CASE WHEN n_removed_tokens > 0 THEN 1 ELSE 0 END) AS dirty",
        "sum(n_removed_tokens) AS removed",
    ).first()
    dt = time.time() - t0
    print(f"[decon_spans_100k] {n} docs vs 5k benchmark: {dt:.1f}s — "
          f"{stats['dirty']} dirty docs, {stats['removed']} tokens removed")
    big.unpersist()


PROBES["decon_spans_100k"] = probe_decontaminate_spans_100k


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

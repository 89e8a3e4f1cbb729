"""Round-6 operator scale probes: BM25 with a 10k-query set on the
post-gate shuffle-join path, PageRank at 10M edges under a power-law
(hub-heavy) in-degree, and incremental dedup across 50 accumulated runs
with state compaction. Results are recorded in BASELINE.md; run
standalone:

    python tools/scale_probes_r6.py [probe ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
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


def probe_bm25_10k_queries(spark):
    """10k keyword queries over 100k docs with the query-side broadcasts
    PINNED OFF — the exact plan an eval-set-mining run with millions of
    queries gets after the round-6 size gate. Each doc carries two
    discriminative id-terms alongside the common-word body and each query
    pairs one discriminative term with one hub term — the realistic
    retrieval shape (selective terms bound the candidate set; the hub
    term exercises the per-term skew surface). A query set built ONLY of
    corpus-common words is the pathological case: every doc becomes a
    candidate for every query and scored pairs grow as |Q|x|D| (~10^9
    here) — that cost is inherent to dense-vocabulary BM25, not to the
    join strategy, and such query sets should be pruned upstream."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        # two selective id-terms per doc: ent<doc_id mod 20k>, ref<doc_id mod 7k>
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.col("text"),
                F.concat(F.lit("ent"), (F.col("doc_id") % 20_000)),
                F.concat(F.lit("ref"), (F.col("doc_id") % 7_000)),
            ),
        )
        .persist()
    )
    n = big.count()
    # 10k selective queries + every 1000th also carries the hub term
    # 'table' (matches every doc -> 100k candidates for those 10 queries)
    qs = spark.range(10_000).selectExpr(
        "id AS query_id",
        "concat('ent', id % 20000, ' ref', (id * 3) % 7000, "
        "CASE WHEN id % 1000 = 0 THEN ' table' ELSE '' END) AS query",
    )
    t0 = time.time()
    out = big.transform(
        t("text_bm25_topk", queries_df=qs, k=5, broadcast_queries=False)
    )
    rows = out.count()
    print(
        f"bm25_10k_queries: {n} docs x 10k queries (shuffle-join path) -> "
        f"{rows} rows in {time.time()-t0:.1f}s",
        flush=True,
    )
    big.unpersist()


def probe_pagerank_10m_skew(spark):
    """10M edges, 1M source nodes x 10 out-edges, destinations drawn from
    a u^8 power law — node 0 alone receives ~18% of all edges (a 1.8M
    in-degree hub). Proves the per-iteration groupBy(dst) survives hub
    skew via map-side partial aggregation (the combine collapses each
    input partition's contribution to the hub into ONE row before the
    exchange, so the hub's shuffle input is #partitions rows, not 1.8M)."""
    edges = (
        spark.range(1_000_000)
        .selectExpr("id AS src")
        .crossJoin(spark.range(10).withColumnRenamed("id", "k"))
        .selectExpr(
            "src",
            # deterministic uniform in [0,1) from a Knuth hash, raised to
            # the 8th power -> heavy concentration at low node ids
            "CAST(pow(pmod(src * 2654435761 + k * 40503, 2147483647)"
            " / 2147483647.0, 8.0) * 1000000 AS LONG) AS dst",
        )
    )
    hub = edges.groupBy("dst").count().orderBy(F.desc("count")).first()
    t0 = time.time()
    out = edges.transform(t("graph_pagerank", iterations=5))
    n = out.count()
    top = out.orderBy(F.desc("rank_s")).first()
    print(
        f"pagerank_10m_skew: 10M edges, {n} nodes, hub in-degree "
        f"{hub['count']} (node {hub['dst']}), 5 iters in "
        f"{time.time()-t0:.1f}s; top rank node {top['node']} "
        f"({top['rank']:.4f})", flush=True
    )


def probe_incremental_dedup_50_runs(spark):
    """50 accumulated ingest runs against one digest state with
    compaction (compact_after_files=16): each run ingests 10k rows, 20%
    repeats of earlier runs. Without compaction the state degrades into
    50+ part files; the probe records the final file count and the
    last-run wall time (dominated by the anti-join against the full
    state)."""
    tmp = tempfile.mkdtemp(prefix="dedup50_")
    state = os.path.join(tmp, "digests")
    try:
        last = 0.0
        for run in range(50):
            # 8k fresh keys + 2k repeats from the previous run
            df = spark.range(10_000).selectExpr(
                f"id + {run} * 10000 AS doc_id",
                f"CASE WHEN id < 8000 THEN concat('doc-', {run} * 8000 + id) "
                f"ELSE concat('doc-', {max(run - 1, 0)} * 8000 + id - 8000) "
                "END AS text",
            )
            t0 = time.time()
            df.transform(
                t("dedup_incremental_exact", state_location=state,
                  key_cols=["text"], id_col="doc_id",
                  compact_after_files=16)
            ).count()
            last = time.time() - t0
        parts = [
            p for p in os.listdir(state) if p.startswith("part-")
        ]
        digests = spark.read.parquet(state).count()
        print(
            f"incremental_dedup_50_runs: 50 runs x 10k rows -> {digests} "
            f"state digests in {len(parts)} files; last run "
            f"{last:.1f}s", flush=True
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_semantic_dedup_40k(spark):
    """sf0.1 embeddings replicated 20x -> 40k vectors with 20 identical
    copies each (every copy pair lands in the same best-cosine cluster):
    the centroid-blocked pairwise path must collapse the corpus to the
    unique 2000 vectors. 64 centroids -> clusters of ~625 -> ~13M verify
    pairs; this O(sum cluster^2) cost is the num_centroids /
    max_cluster_size knob (SemDeDup runs cluster counts proportional to
    corpus size). History: the array-carrying formulation took 134.7s
    (element_at chains and struct-max-with-arrays fall out of codegen);
    scalar-column expansion of the same plan runs in ~12s."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    big = emb.crossJoin(
        spark.range(20).withColumnRenamed("id", "__rep")
    ).withColumn("vec_id", F.col("vec_id") + F.col("__rep") * 1_000_000
    ).drop("__rep").persist()
    n = big.count()
    t0 = time.time()
    out = big.transform(
        t("dedup_semantic_centroid", threshold=0.9999, num_centroids=64,
          dim=64)
    )
    kept = out.count()
    print(
        f"semantic_dedup_40k: {n} vectors (20 copies each), 64 centroids "
        f"-> {kept} survivors in {time.time()-t0:.1f}s",
        flush=True,
    )
    big.unpersist()


def probe_hash_embedding_100k(spark):
    """sf0.1 documents replicated 20x -> 100k docs through
    text_hash_embedding(dim=64): explode + (id, bucket) map-side-combined
    aggregate + dense assembly — cost linear in corpus tokens."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = docs.crossJoin(
        spark.range(20).withColumnRenamed("id", "__rep")
    ).withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000
    ).drop("__rep").persist()
    n = big.count()
    t0 = time.time()
    out = big.transform(t("text_hash_embedding", dim=64))
    total = out.selectExpr(
        "sum(aggregate(hash_embedding, 0.0D, (s, v) -> s + v * v)) AS m"
    ).first()["m"]
    print(
        f"hash_embedding_100k: {n} docs -> 64-dim vectors in "
        f"{time.time()-t0:.1f}s (sum-sq {total:.1f})",
        flush=True,
    )
    big.unpersist()


PROBES["bm25_10k_queries"] = probe_bm25_10k_queries
PROBES["pagerank_10m_skew"] = probe_pagerank_10m_skew
PROBES["incremental_dedup_50_runs"] = probe_incremental_dedup_50_runs
PROBES["semantic_dedup_40k"] = probe_semantic_dedup_40k
PROBES["hash_embedding_100k"] = probe_hash_embedding_100k


def probe_bloom_decontaminate_100k(spark):
    """Bloom decontamination at 100k docs against a 10k-doc benchmark:
    the joinless probe path — the benchmark folds to one ~131 KiB bitmap
    map no matter its size, the corpus side is pure codegen bit tests +
    one hit-count aggregate. Contrast: the exact n-gram join ships every
    distinct benchmark gram hash to every task."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .persist()
    )
    n = big.count()
    bench = big.filter("doc_id % 10 = 0")  # 10k docs play the eval set
    t0 = time.time()
    out = big.transform(
        t("text_decontaminate_bloom", benchmark_df=bench, ngram=8,
          num_bits=1 << 20, num_hashes=4)
    )
    flagged = out.filter("maybe_contaminated").count()
    dt = time.time() - t0
    print(f"[bloom_decontaminate_100k] {n} docs vs 10k-doc benchmark: "
          f"{flagged} flagged in {dt:.1f}s")
    big.unpersist()


def probe_zorder_10m(spark):
    """layout_zorder at 10M rows, 2 dims x 16 bits, 64 range partitions:
    the write-side layout cost is one min/max agg + a codegen projection
    + ONE range exchange (sampled bounds). Also probes rank-CDF mode on a
    100k-distinct skewed dimension (guarded single-task window)."""
    df = (
        spark.range(10_000_000)
        .selectExpr(
            "id",
            "cast(id % 1000000 as long) AS ck",
            "timestamp'2020-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 86400) AS ts",
        )
    )
    t0 = time.time()
    out = df.transform(
        t("layout_zorder", cols=["ck", "ts"], bits_per_col=16,
          num_partitions=64)
    )
    n = out.count()
    dt = time.time() - t0
    print(f"[zorder_10m] minmax: {n} rows laid out in {dt:.1f}s")
    skew = spark.range(10_000_000).selectExpr(
        "id", "cast(pow(id % 100000, 2) as long) AS x", "id % 1000 AS y"
    )
    t0 = time.time()
    out2 = skew.transform(
        t("layout_zorder", cols=["x", "y"], bits_per_col=16, method="rank",
          num_partitions=64)
    )
    n2 = out2.count()
    dt2 = time.time() - t0
    print(f"[zorder_10m] rank-CDF (100k-distinct skewed dim): {n2} rows "
          f"in {dt2:.1f}s")


def probe_incremental_minhash_20_runs(spark):
    """20 sequential near-dup ingest runs x 10k docs (30% near-repeats of
    earlier runs) against one band-bucket state with compaction: state
    stays bucket-hashes-only and the last run's cost is flat."""
    state = tempfile.mkdtemp() + "/bk"
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).persist()
    docs.count()
    last = 0.0
    total_survivors = 0
    for run in range(20):
        batch = (
            docs.limit(500)
            .withColumn("doc_id", F.col("doc_id") + F.lit(run * 1_000_000))
            .withColumn(
                "text",
                F.when(
                    (F.col("doc_id") % 10) < 3,
                    F.col("text"),  # exact repeat of an earlier run's doc
                ).otherwise(F.concat_ws(" ", F.col("text"), F.lit(f"r{run}"))),
            )
        )
        t0 = time.time()
        out = batch.transform(
            t("dedup_incremental_minhash", state_location=state,
              compact_after_files=8)
        )
        total_survivors += out.count()
        last = time.time() - t0
    import glob
    n_files = len(glob.glob(state + "/part-*"))
    print(f"[incremental_minhash_20_runs] 20 runs x 500 docs: "
          f"{total_survivors} total survivors, state files={n_files}, "
          f"last-run {last:.1f}s")
    docs.unpersist()


PROBES["bloom_decontaminate_100k"] = probe_bloom_decontaminate_100k
PROBES["zorder_10m"] = probe_zorder_10m
PROBES["incremental_minhash_20_runs"] = probe_incremental_minhash_20_runs


def probe_interval_overlap_1m(spark):
    """interval_overlap_join at 1M x 1M intervals (100 keys, ~5k-unit
    spans, 10k-unit buckets): the bucketed equi-join + first-shared-bucket
    dedup plan — contrast a nested-loop inequality join, which at this
    size evaluates ~10^10 key-local pairs."""
    left = spark.range(1_000_000).selectExpr(
        "id AS lid", "cast(id % 100 as long) AS g",
        "cast((id * 37) % 1000000000 as long) AS s",
    ).selectExpr("lid", "g", "s", "s + 5000 AS e")
    right = spark.range(1_000_000).selectExpr(
        "id AS rid", "cast(id % 100 as long) AS g",
        "cast((id * 53 + 1234) % 1000000000 as long) AS s",
    ).selectExpr("rid", "g", "s", "s + 4000 AS e")
    t0 = time.time()
    out = left.transform(
        t("interval_overlap_join", right=right, on=["g"],
          left_start="s", left_end="e", right_start="s", right_end="e",
          bucket_width=10_000)
    )
    n = out.count()
    dt = time.time() - t0
    print(f"[interval_overlap_1m] 1M x 1M intervals, 100 keys: "
          f"{n} overlapping pairs in {dt:.1f}s")


PROBES["interval_overlap_1m"] = probe_interval_overlap_1m


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

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


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

"""Clustering operators for embedding-space corpus curation.

K-means over document embeddings is the backbone of several curation
recipes: SemDeDup prunes within-cluster near-duplicates, cluster-balanced
sampling flattens topic skew, and per-cluster quality stats drive mixture
reweighting. ``dedup_semantic_centroid`` (similarity.py) consumes
externally-supplied centroids; this module TRAINS them, Spark-first and
bit-exactly replayable by an external SQL engine.

Numeric design (the same discipline as ``graph_pagerank``): embeddings
quantize to an integer grid (default scale 1024 — a power of two, so
``float -> double * 1024 + 0.5 -> floor`` is EXACT in IEEE arithmetic and
any engine reproduces identical grid points), distances are exact bigint
sums of squared integer diffs, and centroid updates use explicit floor
division — no floating-point accumulation anywhere, so iteration K's
centroids are bit-identical across Spark, DuckDB, and a Python reference.

Scale design: the quantized ``(id, vector)`` projection is computed once;
each Lloyd iteration is (a) a pure-codegen assignment — the k candidate
distances are literal-array ``zip_with``/``aggregate`` expressions, no
shuffle, no UDF — and (b) ONE map-side-combined aggregation keyed on
(cluster, dim) whose post-combine shuffle volume is k*dim rows
regardless of corpus size. The only driver traffic is k initial rows and
k*dim partial sums per iteration (same class of control decision as
bpe_train's top-pair collect). Assignment cost is O(rows * k * dim)
inside whole-stage codegen; bigint sums hold to ~1.7e16 rows per cluster
at the default grid before overflow.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]


def _floordiv(s: int, n: int) -> int:
    """Exact floor division replayable as portable SQL (`s//n` with the
    negative-numerator case rewritten so truncating engines agree)."""
    if s >= 0:
        return s // n
    return -((-s + n - 1) // n)


def _quantize_expr(input_col: str, scale: int):
    return F.transform(
        F.col(input_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )


def _dist_expr(vec_col: str, centroid: Sequence[int]):
    lit_arr = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit_arr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign_cols(vec_col: str, centroids: List[List[int]]):
    """Return (cluster, dist) Columns: argmin over literal centroids,
    ties to the smallest cluster id. Pure codegen — k CASE/least exprs."""
    dists = [_dist_expr(vec_col, c) for c in centroids]
    best = F.least(*dists) if len(dists) > 1 else dists[0]
    cluster = F.lit(0)
    for j in range(len(dists) - 1, -1, -1):
        cluster = F.when(dists[j] == best, F.lit(j)).otherwise(cluster)
    return cluster.cast("int"), best


@register("embedding_kmeans")
def embedding_kmeans(
    id_col: str = "vec_id",
    input_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    quant_scale: int = 1024,
    output_col: str = "cluster",
) -> TransformerFn:
    """Deterministic Lloyd k-means on an ``array<float>`` column.

    Semantics (stated exactly so an external oracle replays them):

    * quantize each component to ``floor(double(x)*quant_scale + 0.5)``
      (exact for power-of-two scales);
    * initial centroids are the quantized vectors of the ``k`` rows with
      the smallest ``(md5(cast(id as string)), id)`` — a seedless,
      engine-portable pseudo-random draw (the corpus-wide md5 convention);
      cluster ids 0..k-1 follow that order;
    * ``iterations`` full Lloyd rounds: assign every point to the nearest
      centroid by exact squared L2 (ties -> smallest cluster id), then
      recompute each centroid as the per-dimension FLOOR-division of the
      assigned sums by the assigned count; empty clusters keep their
      previous centroid;
    * output = the input rows plus ``<output_col>`` (int, assignment
      against the final centroids) and ``<output_col>_dist`` (bigint,
      exact squared grid distance to that centroid).

    Downstream: feed ``<output_col>`` to ``cluster_sample`` /
    ``dedup_semantic_centroid`` for SemDeDup-style pruning, or group on
    it for per-topic quality stats.
    """
    if k < 1:
        raise ValueError(f"embedding_kmeans: k must be >= 1, got {k}")
    if iterations < 0:
        raise ValueError(
            f"embedding_kmeans: iterations must be >= 0, got {iterations}"
        )

    def _kmeans(df: DataFrame) -> DataFrame:
        q = df.select(
            F.col(id_col).alias("__id"),
            _quantize_expr(input_col, quant_scale).alias("__v"),
        ).persist()
        try:
            init = (
                q.select(
                    "__v",
                    F.md5(F.col("__id").cast("string")).alias("__h"),
                    "__id",
                )
                .orderBy("__h", "__id")
                .limit(k)
                .collect()
            )  # driver control decision: k rows
            if not init:
                schema_cols = [
                    F.lit(None).cast("int").alias(output_col),
                    F.lit(None).cast("long").alias(f"{output_col}_dist"),
                ]
                return df.select("*", *schema_cols).limit(0)
            centroids = [list(r["__v"]) for r in init]
            for _ in range(iterations):
                cl, _d = _assign_cols("__v", centroids)
                sums = (
                    q.select(cl.alias("__c"), F.posexplode("__v").alias("__i", "__x"))
                    .groupBy("__c", "__i")
                    .agg(
                        F.sum("__x").alias("__s"),
                        F.count(F.lit(1)).alias("__n"),
                    )
                    .collect()
                )  # k*dim rows after map-side combine
                nxt = [list(c) for c in centroids]
                for r in sums:
                    nxt[r["__c"]][r["__i"]] = _floordiv(int(r["__s"]), int(r["__n"]))
                centroids = nxt
            cl, dist = _assign_cols("__v", centroids)
            out = df.withColumn("__v", _quantize_expr(input_col, quant_scale))
            out = out.withColumn(output_col, cl).withColumn(
                f"{output_col}_dist", dist
            )
            return out.drop("__v")
        finally:
            q.unpersist()

    return _kmeans


@register("cluster_stats")
def cluster_stats(
    cluster_col: str = "cluster",
    dist_col: str = "cluster_dist",
) -> TransformerFn:
    """Per-cluster diagnostics over a k-means assignment: size, exact
    total/mean inertia (sum of squared grid distances), and the max
    distance — the table a curation pipeline reads to decide which
    clusters to prune, re-split, or down-sample. One map-side-combined
    aggregation; mean is rounded to 6 places for cross-engine stability
    (sum and count are exact bigints, so the rounded quotient is too).
    """

    def _stats(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(F.col(cluster_col).alias("cluster"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("size"),
                F.sum(dist_col).cast("long").alias("inertia"),
                F.max(dist_col).cast("long").alias("max_dist"),
            )
            .select(
                "cluster",
                "size",
                "inertia",
                F.round(F.col("inertia") / F.col("size"), 6).alias("mean_dist"),
                "max_dist",
            )
        )

    return _stats

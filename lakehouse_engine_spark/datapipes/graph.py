"""Graph operators for corpus-quality pipelines.

Link-graph signals are a standard web-corpus curation input (PageRank /
centrality feeds quality filtering, crawl prioritization, and dedup
survivor choice). The operators here run the classic iterative
message-passing shape Spark-first: edges stay partitioned by source,
each iteration is one co-partitioned join + one map-side-combined
aggregation, and lineage is truncated per round with ``localCheckpoint``
so iteration K's plan never replays rounds 1..K-1 (the same discipline
as ``dedup_connected_components``).

Numeric design: ranks are SCALED BIGINTS (1e12 grid) and every
per-edge contribution is ``(rank * 17) div (20 * outdeg)`` — damping
0.85 as the exact rational 17/20 with integer floor division — so sums
are order-independent and an external SQL engine replays every
iteration bit-for-bit (no floating-point accumulation anywhere).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]

SCALE = 10**12


@register("graph_pagerank")
def pagerank(
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    output_col: str = "rank",
) -> TransformerFn:
    """Fixed-iteration PageRank over an edge list (one row per directed
    edge). Returns one row per node: ``node``, ``<output_col>_s`` (the
    exact scaled-bigint rank) and ``<output_col>`` (double, /1e12).

    Semantics: damping 0.85 (exactly 17/20), uniform init ``SCALE div
    N``, teleport term ``(3*SCALE) div (20*N)``; per-edge contribution
    ``(rank*17) div (20*outdeg)`` in integer floor division. Dangling
    nodes (no out-edges) leak their mass rather than redistributing it —
    the simple variant, stated here so the oracle can replay it; ranks
    therefore sum to slightly less than SCALE in graphs with dangling
    nodes. All arithmetic stays below 2^63 for any graph (rank ≤ SCALE,
    rank*17 ≤ 1.7e13).

    Scale design: each iteration is ONE join of the rank table against
    the (outdeg-annotated, persisted) edge list on the source key and one
    map-side-combined sum keyed by destination — both hash-partitioned on
    node ids, so AQE coalesces and reuses exchanges; no broadcast of
    anything corpus-sized, no driver-side state beyond the node count.
    ``localCheckpoint`` per round keeps the plan depth constant.
    """
    if iterations < 1:
        raise ValueError(f"graph_pagerank: iterations must be >= 1, got {iterations}")

    def _pr(df: DataFrame) -> DataFrame:
        from pyspark import StorageLevel

        edges = df.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        )
        outdeg = edges.groupBy("__src").agg(
            F.count(F.lit(1)).cast("long").alias("__outdeg")
        )
        # annotate each edge with its source's out-degree ONCE — the
        # per-iteration join then only touches the rank table
        annotated = edges.join(outdeg, "__src").persist(StorageLevel.MEMORY_AND_DISK)
        nodes = (
            edges.select(F.col("__src").alias("__node"))
            .union(edges.select(F.col("__dst").alias("__node")))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n = nodes.count()
        if n == 0:
            return df.sparkSession.createDataFrame(
                [], f"node long, {output_col}_s long, {output_col} double"
            )
        init_s = SCALE // n
        base_s = (3 * SCALE) // (20 * n)
        ranks = nodes.select(
            "__node", F.lit(init_s).cast("long").alias("__r")
        ).localCheckpoint(eager=False)
        for _ in range(iterations):
            contribs = (
                annotated.join(
                    ranks.withColumnRenamed("__node", "__src"), "__src"
                )
                .select(
                    F.col("__dst").alias("__node"),
                    F.expr("(__r * 17) div (20 * __outdeg)").alias("__c"),
                )
                .groupBy("__node")
                .agg(F.sum("__c").alias("__in"))
            )
            ranks = (
                nodes.join(contribs, "__node", "left")
                .select(
                    "__node",
                    (F.lit(base_s) + F.coalesce("__in", F.lit(0)))
                    .cast("long")
                    .alias("__r"),
                )
                .localCheckpoint(eager=True)
            )
        annotated.unpersist()
        nodes.unpersist()
        return ranks.select(
            F.col("__node").alias("node"),
            F.col("__r").alias(f"{output_col}_s"),
            (F.col("__r") / F.lit(float(SCALE))).alias(output_col),
        )

    return _pr

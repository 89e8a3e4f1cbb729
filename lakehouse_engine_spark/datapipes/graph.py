"""Graph operators for corpus-quality pipelines.

Link-graph signals are a standard web-corpus curation input (PageRank /
centrality feeds quality filtering, crawl prioritization, and dedup
survivor choice). The operators here run the classic iterative
message-passing shape Spark-first: edges stay partitioned by source,
each iteration is one co-partitioned join + one map-side-combined
aggregation, and lineage is truncated per round with ``iter_materialize``
(localCheckpoint on static clusters; recomputable persist or reliable
checkpoint under dynamic allocation — see datapipes/materialize.py) so
iteration K's plan never replays rounds 1..K-1 (the same discipline as
``dedup_connected_components``).

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

from lakehouse_engine_spark.datapipes.materialize import (
    iter_materialize,
    release,
)
from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]

SCALE = 10**12

# Driver tier gate (r15, the kmeans/bpe pattern): when the DISTINCT
# canonical edge set fits under this row budget (probed with a bounded
# limit(n+1) collect, never a corpus count), the iterative loop runs on
# the driver — union-find for connected components, the exact int64
# recurrence for PageRank — with ZERO per-round Spark jobs. The
# distributed loops are byte-for-byte unchanged above the gate (the
# 100 TB path); ids outside int/str fall back too (Python ordering must
# replicate Spark's). Tests pin both tiers row-identical.
GRAPH_DRIVER_MAX_EDGES = 200_000


def _driver_safe_ids(rows, *cols) -> bool:
    """True when every id in the collected rows is an int or str —
    the types whose Python ordering/equality replicate Spark's."""
    for r in rows:
        for c in cols:
            v = r[c]
            if v is None:
                continue
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                return False
    return True


@register("graph_connected_components")
def connected_components(
    src_col: str = "src",
    dst_col: str = "dst",
    output_col: str = "component",
    max_iterations: int = 50,
) -> TransformerFn:
    """Connected components over an edge list via the alternating
    large-star / small-star algorithm (Kiveris et al., *Connected
    Components in MapReduce and Beyond*, SoCC'14 — a public paper).
    Returns one row per node: ``node``, ``<output_col>`` (the smallest
    node id in its component — deterministic, engine-independent).

    Input rows are undirected edges; direction is ignored, duplicates
    and self-loops are tolerated (a self-loop registers the node in the
    output universe without connecting it to anything — callers can
    union ``(n, n)`` rows to label isolated nodes). Ids may be any
    orderable type (numeric or string); "smallest" is Spark's ordering
    for that type.

    Scale design — this exists because the min-label-propagation loop in
    ``dedup_connected_components`` converges in O(graph diameter) rounds,
    which is the right shape for near-dup bucket cliques (diameter 1-3)
    but DIES on high-diameter graphs: a 1M-node path graph would need 1M
    rounds. The star transforms contract paths exponentially —
    O(log^2 n) rounds worst-case, 2-8 rounds in practice — so the same
    1M-node path converges in a handful of passes (see
    tools/scale_probes_r7.py). Each half-round is ONE node-keyed
    exchange feeding a window-min (r14: the earlier groupBy-min +
    join-back pair cost two exchanges plus a join per half-round for
    the identical per-row min — at scale the join was a sort-merge
    whose sort the window pays anyway, minus the second sorted side),
    shuffling only (node, node) pairs — never neighbor lists, never
    anything super-linear in the edge count. Skew safety: a hub of
    degree d lands its d rows in one sorted window partition
    (spillable), exactly the profile of the sort-merge join it
    replaces. ``localCheckpoint`` per round keeps plan depth constant;
    convergence is an exact changed-edge count (distinct sets:
    equal cardinality + empty one-sided ``exceptAll``).
    """
    if max_iterations < 1:
        raise ValueError(
            f"graph_connected_components: max_iterations must be >= 1, "
            f"got {max_iterations}"
        )

    def _cc(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        raw = df.select(
            F.col(src_col).alias("__a"), F.col(dst_col).alias("__b")
        )
        # lazy: only the final output join reads it (the old persist +
        # count was unpersisted before the output action ever ran, so it
        # cost a job and cached nothing the final plan used — r14)
        nodes = (
            raw.select(F.col("__a").alias("__node"))
            .union(raw.select(F.col("__b").alias("__node")))
            .distinct()
        )
        def _stats(e: DataFrame):
            row = e.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: an int64 hash sum overflows under ANSI
                F.sum(F.xxhash64("__u", "__v").cast("decimal(20,0)")).alias(
                    "h"
                ),
            ).first()
            return int(row["n"]), row["h"]

        canonical = (
            raw.where(F.col("__a") != F.col("__b"))
            .select(
                F.greatest("__a", "__b").alias("__u"),
                F.least("__a", "__b").alias("__v"),
            )
            .distinct()
        )
        # ----- driver tier (r15): union-find when the edge set is small.
        # The star rounds exist for graphs whose EDGE SET cannot sit on
        # one machine; below the gate a driver union-find computes the
        # identical min-of-component labels (pinned against the star
        # rounds by test_connected_components_driver_tier_parity and by
        # the union-find reference test) with zero per-round jobs. The
        # bounded limit(n+1) collect doubles as the materialization the
        # stats probe would have paid.
        probe_rows = canonical.limit(GRAPH_DRIVER_MAX_EDGES + 1).collect()
        if len(probe_rows) <= GRAPH_DRIVER_MAX_EDGES and _driver_safe_ids(
            probe_rows, "__u", "__v"
        ):
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            for r in probe_rows:
                ra, rb = find(r["__u"]), find(r["__v"])
                if ra != rb:
                    # union by the SMALLER root so every component root
                    # is its minimum id (the star algorithm's label)
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            members = set(parent)
            for r in probe_rows:
                members.add(r["__u"])
                members.add(r["__v"])
            spark = df.sparkSession
            from pyspark.sql import types as T

            ndt = df.schema[src_col].dataType
            labels = spark.createDataFrame(
                [(m, find(m)) for m in members],
                T.StructType(
                    [
                        T.StructField("__node", ndt),
                        T.StructField("__comp", ndt),
                    ]
                ),
            )
            return nodes.join(F.broadcast(labels), "__node", "left").select(
                F.col("__node").alias("node"),
                F.coalesce("__comp", "__node").alias(output_col),
            )
        edges = iter_materialize(
            canonical,
            eager=False,  # the _stats probe below materializes it (r14)
            corpus_sized=True,
        )
        prev_n, prev_h = _stats(edges)
        converged = prev_n == 0
        node_w = Window.partitionBy("__u")
        for _ in range(max_iterations):
            if converged:
                break
            # large-star: every node u sends its strictly-LARGER
            # neighbors to m = min(u, neighbors) — contracts tall
            # trees toward the minimum without growing edge count.
            # Window-min instead of groupBy-min + join-back: one
            # exchange per half-round instead of two, no join, and the
            # per-row __mv is the identical value. The half-round
            # outputs are multisets (the old intra-round distinct is
            # gone): every consumer is duplicate-insensitive — window
            # MIN, the filters, and the round-final distinct — so the
            # per-round edge SET is unchanged, round for round (pinned
            # by test_connected_components_round_set_identity).
            sym = edges.union(
                edges.select(F.col("__v").alias("__u"), F.col("__u").alias("__v"))
            )
            large = (
                sym.withColumn("__mv", F.min("__v").over(node_w))
                .where(F.col("__v") > F.col("__u"))
                .select(
                    F.col("__v").alias("__u"),
                    F.least("__u", "__mv").alias("__v"),
                )
            )
            # small-star: every node u re-points its smaller-or-equal
            # neighbors (and itself) at their collective minimum
            sm = large.withColumn("__m", F.min("__v").over(node_w))
            new_edges = (
                sm.where(F.col("__v") != F.col("__m"))
                .select(F.col("__v").alias("__u"), F.col("__m").alias("__v"))
                .union(sm.select(F.col("__u"), F.col("__m").alias("__v")))
                .distinct()
            )
            # lazy materialization: the stats aggregate right below is
            # the materializing action — one job per round, not two
            new_edges = iter_materialize(new_edges, eager=False, corpus_sized=True)
            # cheap necessary condition first (count + order-free hash
            # sum, ONE aggregate job); the exact exceptAll confirmation
            # runs only when it signals a fixpoint — distinct sets of
            # equal size with an empty one-sided difference are equal
            new_n, new_h = _stats(new_edges)
            if (
                new_n == prev_n
                and new_h == prev_h
                and new_edges.exceptAll(edges).count() == 0
            ):
                converged = True
            release(edges)  # previous round, now superseded
            edges, prev_n, prev_h = new_edges, new_n, new_h
        if not converged:
            raise RuntimeError(
                f"graph_connected_components: no convergence after "
                f"{max_iterations} alternating star rounds — the bound is "
                f"O(log^2 n); raise max_iterations only for graphs beyond "
                f"~2^{max_iterations // 2} nodes or report a bug"
            )
        # converged edge set is (child, root) stars rooted at each
        # component's minimum; roots + isolated nodes label themselves
        labels = edges.select(
            F.col("__u").alias("__node"), F.col("__v").alias("__comp")
        )
        return (
            nodes.join(labels, "__node", "left")
            .select(
                F.col("__node").alias("node"),
                F.coalesce("__comp", "__node").alias(output_col),
            )
        )

    return _cc


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
    map-side-combined sum keyed by destination; nodes without in-edges
    get their base rank by riding a zero-contribution row through that
    same sum (r14 — previously a per-iteration ``nodes LEFT JOIN``,
    i.e. one more exchange and a join per round, for the identical
    int64 result). No broadcast of anything corpus-sized, no
    driver-side state beyond the node count. ``localCheckpoint`` per
    round keeps the plan depth constant.
    """
    if iterations < 1:
        raise ValueError(f"graph_pagerank: iterations must be >= 1, got {iterations}")

    def _pr(df: DataFrame) -> DataFrame:
        from pyspark import StorageLevel

        edges = df.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        )
        # ----- driver tier (r15): the exact int64 recurrence locally
        # when the edge list is small (bounded limit(n+1) collect; the
        # kmeans/bpe gate pattern). Every quantity is the same integer
        # arithmetic the distributed loop computes — order-free sums,
        # floor division, dangling leak — so ranks are bit-identical
        # (pinned by test_pagerank_driver_tier_parity and the existing
        # pure-Python reference test). Zero per-iteration Spark jobs;
        # the distributed loop is unchanged above the gate. SQL
        # equi-join semantics are replicated exactly: a NULL-src edge
        # never matches the rank table (contributes nothing), while
        # NULL destinations aggregate as a regular group.
        probe_rows = edges.limit(GRAPH_DRIVER_MAX_EDGES + 1).collect()
        if len(probe_rows) <= GRAPH_DRIVER_MAX_EDGES and _driver_safe_ids(
            probe_rows, "__src", "__dst"
        ):
            from pyspark.sql import types as T

            ndt = df.schema[src_col].dataType
            node_set = set()
            outdeg_d: dict = {}
            for r in probe_rows:
                node_set.add(r["__src"])
                node_set.add(r["__dst"])
                outdeg_d[r["__src"]] = outdeg_d.get(r["__src"], 0) + 1
            n = len(node_set)
            if n == 0:
                return df.sparkSession.createDataFrame(
                    [],
                    T.StructType(
                        [
                            T.StructField("node", ndt),
                            T.StructField(f"{output_col}_s", T.LongType()),
                            T.StructField(output_col, T.DoubleType()),
                        ]
                    ),
                )
            init_s = SCALE // n
            base_s = (3 * SCALE) // (20 * n)
            ranks_d = {m: init_s for m in node_set}
            for _ in range(iterations):
                contrib: dict = {}
                for r in probe_rows:
                    s = r["__src"]
                    if s is None:
                        continue  # NULL src: the rank equi-join drops it
                    c = (ranks_d[s] * 17) // (20 * outdeg_d[s])
                    d = r["__dst"]
                    contrib[d] = contrib.get(d, 0) + c
                ranks_d = {
                    m: base_s + contrib.get(m, 0) for m in node_set
                }
            out = df.sparkSession.createDataFrame(
                [(m, ranks_d[m]) for m in node_set],
                T.StructType(
                    [
                        T.StructField("__node", ndt),
                        T.StructField("__r", T.LongType()),
                    ]
                ),
            )
            return out.select(
                F.col("__node").alias("node"),
                F.col("__r").alias(f"{output_col}_s"),
                (F.col("__r") / F.lit(float(SCALE))).alias(output_col),
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
            # empty-graph schema must MATCH the populated path's: node
            # keeps the caller's src column type (a long-typed empty
            # frame breaks unions with string-keyed outputs — r14 review)
            from pyspark.sql import types as T

            ndt = df.schema[src_col].dataType
            return df.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("node", ndt),
                        T.StructField(f"{output_col}_s", T.LongType()),
                        T.StructField(output_col, T.DoubleType()),
                    ]
                ),
            )
        init_s = SCALE // n
        base_s = (3 * SCALE) // (20 * n)
        ranks = iter_materialize(
            nodes.select("__node", F.lit(init_s).cast("long").alias("__r")),
            eager=False,
            corpus_sized=True,
        )
        zero_rows = nodes.select(
            "__node", F.lit(0).cast("long").alias("__c")
        )
        for _ in range(iterations):
            # Every node's zero row rides the SAME exchange the
            # destination-keyed sum already pays (map-side combine folds
            # it away), replacing the per-iteration `nodes LEFT JOIN
            # contribs` — one fewer exchange and no join per round, and
            # sum(contribs + 0) == coalesce(sum(contribs), 0) exactly in
            # int64 (r14).
            contribs = (
                annotated.join(
                    ranks.withColumnRenamed("__node", "__src"), "__src"
                )
                .select(
                    F.col("__dst").alias("__node"),
                    F.expr("(__r * 17) div (20 * __outdeg)").alias("__c"),
                )
                .union(zero_rows)
                .groupBy("__node")
                .agg(F.sum("__c").alias("__in"))
            )
            # LAZY truncation (eager=False): plan depth still resets per
            # round, but no per-round job is launched — the final action
            # computes the whole chain in one job, checkpointing each
            # round's blocks as it first computes them (identical work,
            # minus `iterations` job launches; r14). Safe because every
            # corpus_sized arm of iter_materialize is checkpoint-based
            # (release() is a no-op there) — the persist-wrapper arm,
            # which must be materialized before its predecessor is
            # released, is never taken for corpus-sized frames.
            nxt = iter_materialize(
                contribs.select(
                    "__node",
                    (F.lit(base_s) + F.col("__in")).cast("long").alias("__r"),
                ),
                eager=False,
                corpus_sized=True,
            )
            release(ranks)  # previous round, now superseded
            ranks = nxt
        annotated.unpersist()
        nodes.unpersist()
        return ranks.select(
            F.col("__node").alias("node"),
            F.col("__r").alias(f"{output_col}_s"),
            (F.col("__r") / F.lit(float(SCALE))).alias(output_col),
        )

    return _pr

"""Materialization policy for iterative datapipes loops.

Iterative operators (connected components, PageRank, the BPE trainer)
re-derive a small control frame every round; without per-round plan
truncation Catalyst re-analyzes a plan that grows one layer per round
(quadratic driver time, StackOverflow at thousands of rounds). The
classic truncation is ``localCheckpoint`` — but its blocks are NOT
recomputable, so losing the executor that holds them (dynamic-allocation
scale-in, spot kill) fails every downstream stage unrecoverably.

:func:`iter_materialize` picks per environment:

* Static cluster: ``localCheckpoint`` (blocks are reference-tracked and
  dropped when the plan is GC'd — no cache-manager entry, no release
  protocol needed).
* ``spark.dynamicAllocation.enabled`` + a reliable checkpoint dir
  (``SparkContext.setCheckpointDir``): ``checkpoint`` — fault-tolerant
  and plan-truncating (checkpoint files outlive the job unless
  ``spark.cleaner.referenceTracking.cleanCheckpoints`` is set; the
  cluster admin's documented trade).
* ``spark.dynamicAllocation.enabled`` without a checkpoint dir:
  ``persist`` (recomputable from lineage) behind a plan-truncating
  LogicalRDD wrapper for control-sized frames (distinct words, merge
  states) — the caller MUST call :func:`release` on the previous
  round's frame once the next round is materialized; corpus-sized
  frames fall back to a warned ``localCheckpoint`` (see
  :func:`iter_materialize` for why un-truncated plans are not an
  option).

NOT for every localCheckpoint site: operators whose returned (lazy) plan
must read a snapshot of state the operator itself then MUTATES — the
``dedup_incremental_*`` family checkpoints the survivors BEFORE
appending their digests to the state the anti-join reads — must keep
``localCheckpoint`` unconditionally: a lineage recompute after executor
loss would re-read the already-updated state and silently drop rows,
so failing loudly is the correct behavior there.

One-shot size probes (count now, reuse in a lazily-returned plan) use
:func:`probe_materialize`: checkpoint on static clusters, NO
materialization under dynamic allocation (a persist could never be
released; the probe recomputes instead — leak-free and loss-safe).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOGGER = logging.getLogger(__name__)
_warned_corpus_dyn = False
_warned_wide_lazy = False

# Lazy corpus-sized checkpoints hold ~rounds x checkpoint blocks until
# the loop's final action computes the whole chain (the r14 lazy-
# materialization trade). That is bounded and spillable for the NARROW
# control frames iterative loops actually checkpoint — (node, rank),
# (u, v), (id, old, label) — but a corpus-WIDE frame (documents with
# text/payload columns) would hold rounds x the corpus on disk. Frames
# wider than this column budget auto-switch to eager (2x blocks max),
# with a one-time warning, instead of relying on a code-comment
# convention (r14 VERDICT "what's wrong" #3).
NARROW_FRAME_MAX_COLS = 4


def dyn_alloc_enabled(spark) -> bool:
    """Whether executors can be removed under us (dynamic allocation) —
    split out so tests can monkeypatch the environment signal."""
    return (
        spark.conf.get("spark.dynamicAllocation.enabled", "false") or "false"
    ).lower() == "true"


def has_checkpoint_dir(spark) -> bool:
    """Whether a reliable checkpoint dir is configured — split out so
    tests can pin the branch regardless of shared-session state."""
    return not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()


def iter_materialize(
    df: DataFrame, eager: bool = True, corpus_sized: bool = False
) -> DataFrame:
    """Truncate the logical plan of one loop round (policy above).

    ``eager=False`` preserves the one-job-per-round optimization where
    the caller's own next action materializes the frame (the graph CC
    stats probe); the dyn-alloc persist branch stays lazy the same way.

    ``corpus_sized=True`` declares the frame scales with the corpus
    (CC labels/edges, PageRank ranks): the LogicalRDD wrapper's Python
    Row round-trip is only acceptable for control-sized frames
    (distinct words, merge states), and leaving the plan UN-truncated is
    not an option at all — these loops reference the previous round's
    frame several times per round, so the un-truncated plan tree grows
    EXPONENTIALLY (measured: the 1M-node CC probe explodes past 400
    stages and OOMs the driver by round ~13). Under dynamic allocation
    without a checkpoint dir, corpus-sized frames therefore fall back
    to ``localCheckpoint`` with a one-time warning: bounded plans and
    native-speed rounds, at the documented risk that executor scale-in
    fails the job loudly — configure ``SparkContext.setCheckpointDir``
    to get the fault-tolerant branch instead.
    """
    spark = df.sparkSession
    if not eager and corpus_sized and len(df.columns) > NARROW_FRAME_MAX_COLS:
        global _warned_wide_lazy
        if not _warned_wide_lazy:
            _warned_wide_lazy = True
            _LOGGER.warning(
                "iter_materialize: corpus-sized frame with %d columns "
                "requested a LAZY checkpoint — lazy chains hold every "
                "round's blocks until the final action, which is only "
                "acceptable for narrow control frames (<= %d columns). "
                "Switching to eager materialization for this frame.",
                len(df.columns),
                NARROW_FRAME_MAX_COLS,
            )
        eager = True
    if dyn_alloc_enabled(spark):
        if has_checkpoint_dir(spark):
            return df.checkpoint(eager=eager)
        if corpus_sized:
            global _warned_corpus_dyn
            if not _warned_corpus_dyn:
                _warned_corpus_dyn = True
                _LOGGER.warning(
                    "iter_materialize: dynamic allocation is on but no "
                    "checkpoint dir is set — corpus-sized loop frames use "
                    "localCheckpoint (non-recomputable after executor "
                    "scale-in; the job fails loudly). Set "
                    "SparkContext.setCheckpointDir for fault tolerance."
                )
            return df.localCheckpoint(eager=eager)
        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            cached.count()
        out = spark.createDataFrame(cached.rdd, cached.schema)
        out._lhe_cache_handle = cached
        return out
    return df.localCheckpoint(eager=eager)


def release(df) -> None:
    """Unpersist the cache handle attached by :func:`iter_materialize`'s
    persist branch; no-op for every other branch (and for None)."""
    handle = getattr(df, "_lhe_cache_handle", None)
    if handle is not None:
        handle.unpersist()


def probe_materialize(df: DataFrame) -> DataFrame:
    """One-shot size-probe materialization (policy above).

    Mirrors :func:`iter_materialize` on the dyn-alloc branch: with a
    reliable checkpoint dir configured the probe is checkpointed
    (fault-tolerant, reused by the final plan); without one it is left
    un-materialized — a persist could never be released, so the probe
    recomputes instead (leak-free and loss-safe)."""
    spark = df.sparkSession
    if dyn_alloc_enabled(spark):
        if has_checkpoint_dir(spark):
            return df.checkpoint(eager=True)
        return df
    return df.localCheckpoint(eager=True)

"""Round-11 scale probes (run on local[32]; results recorded in BASELINE.md).

Usage::

    python tools/scale_probes_r11.py [probe ...]

* ``semantic_hier_widek`` — dedup_semantic_hier at 200k x 256-dim
  synthetic vectors (the round-9/10 knee corpus), k_eff = 32768
  (256x128): SemDeDup at the cluster count the paper's web-scale runs
  use, which the flat arm (dedup_semantic_centroid, broadcast-centroid
  assignment capped at MAX_K=4096) cannot reach. Expected cell size
  ~ N/k_eff ~ 6, so the in-cell pair join's sum(cell^2) term is tiny —
  assignment (the hier trainer) dominates, and that cost was mapped by
  the round-10 kmeans_hier_widek probe.

* ``incremental_embedding_runs`` — dedup_incremental_embedding over
  three consecutive 100k x 64-dim deliveries against one persistent
  bucket-hash state: per-run cost must stay flat (state is hashes-only
  — num_tables strings per kept vector — so run N's history semi-join
  scales with kept-corpus size, not with N), and the state parts stay
  compacted.
"""

from __future__ import annotations

import os
import shutil
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


def _t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def _knee_corpus(spark):
    """200k x 256-dim corpus (the round-9/10 knee corpus, same recipe)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    big = (
        emb.crossJoin(spark.range(100).withColumnRenamed("id", "__c"))
        .select(
            (F.col("vec_id") * 100 + F.col("__c")).alias("vec_id"),
            F.flatten(
                F.array(
                    *[
                        F.transform(
                            "embedding",
                            lambda x, i=i: x * (1.0 + 0.01 * i)
                            + F.col("__c") * 0.001,
                        )
                        for i in range(4)
                    ]
                )
            ).alias("embedding"),
        )
        .repartition(32)
    )
    loc = "/tmp/probe_semdedup_emb_r11"
    big.write.mode("overwrite").parquet(loc)
    return spark.read.parquet(loc)


def probe_semantic_hier_widek(spark):
    big = _knee_corpus(spark)
    n = big.count()
    k1, k2 = 256, 128
    op = _t(
        "dedup_semantic_hier",
        threshold=0.95,
        k_coarse=k1,
        k_fine=k2,
        coarse_iterations=1,
        fine_iterations=1,
        keep="all",
        dim=256,
    )
    t0 = time.time()
    out = big.transform(op)
    dups = out.filter("is_duplicate").count()
    kept = n - dups
    print(
        f"[semantic_hier_widek] {n} x 256 dims, k_eff={k1 * k2} "
        f"({k1}x{k2}), threshold=0.95: {time.time() - t0:.1f}s, "
        f"{dups} duplicates dropped, {kept} kept"
    )


PROBES["semantic_hier_widek"] = probe_semantic_hier_widek


def probe_incremental_embedding_runs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    state = "/tmp/probe_incemb_state_r11"
    shutil.rmtree(state, ignore_errors=True)
    for run in range(3):
        # each delivery: 100k 64-dim vectors, half fresh, half near-dups
        # of the PREVIOUS delivery (shifted ids, jittered values)
        big = (
            emb.crossJoin(spark.range(100).withColumnRenamed("id", "__c"))
            .select(
                (
                    F.col("vec_id") * 1000 + F.col("__c") * 10 + run
                ).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x * (1.0 + 0.0001 * run) + F.col("__c") * 0.01,
                ).alias("embedding"),
            )
            .repartition(32)
        )
        loc = f"/tmp/probe_incemb_run{run}_r11"
        big.write.mode("overwrite").parquet(loc)
        delivery = spark.read.parquet(loc)
        n = delivery.count()
        op = _t(
            "dedup_incremental_embedding",
            state_location=state,
            threshold=0.98,
            num_planes=12,
            num_tables=4,
            dim=64,
            compact_after_files=8,
            # this synthetic corpus is 2000 true directions x 100 jittered
            # copies — hot buckets are the POINT of the cap: at the default
            # 10k cap a degenerate bucket still yields 50M pairs; 2000 keeps
            # the pair budget ~2M/bucket (the production tuning rule: cap^2/2
            # x hot-bucket-count must fit the shuffle budget)
            max_bucket_size=2000,
        )
        t0 = time.time()
        kept = delivery.transform(op).count()
        state_rows = spark.read.parquet(state).count()
        parts = len(
            [p for p in os.listdir(state) if p.startswith("part-")]
        )
        print(
            f"[incremental_embedding_runs] run {run}: {n} x 64 dims in "
            f"{time.time() - t0:.1f}s, kept {kept}, state {state_rows} "
            f"hashes / {parts} parts"
        )


PROBES["incremental_embedding_runs"] = probe_incremental_embedding_runs


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


def probe_linear_fit_10m(spark):
    """Round-11 continuation: linear_fit_normal over 10M rows x 3
    features in 32 groups — the trainer must stay SCAN-BOUND (one
    map-side-combined decimal-moment pass; the Cramer solve is a
    projection on 32 rows). Compare against a plain count() of the same
    generated input: the fit should cost ~the scan, not a multiple."""
    rows = 10_000_000
    base = (
        spark.range(rows)
        .select(
            (F.col("id") % 32).alias("g"),
            (F.col("id") % 1013).cast("double").alias("x1"),
            ((F.col("id") * 7) % 997).cast("double").alias("x2"),
            ((F.col("id") * 13) % 1009).cast("double").alias("x3"),
        )
        .withColumn(
            "y",
            2.0 + 3.0 * F.col("x1") - 1.5 * F.col("x2") + 0.25 * F.col("x3"),
        )
    )
    t0 = time.time()
    base.count()
    scan = time.time() - t0
    t0 = time.time()
    out = base.transform(
        _t(
            "linear_fit_normal",
            feature_cols=["x1", "x2", "x3"],
            y_col="y",
            group_cols=["g"],
        )
    ).collect()
    fit = time.time() - t0
    ok = all(abs(r["w1"] - 3.0) < 1e-6 and abs(r["r2"] - 1.0) < 1e-9 for r in out)
    print(
        f"linear_fit_10m: scan {scan:.1f}s fit {fit:.1f}s "
        f"({len(out)} groups, exact-recovery={ok})"
    )


PROBES["linear_fit_10m"] = probe_linear_fit_10m


def probe_winnow_long_docs(spark):
    """Round-11 continuation: text_winnow_fingerprint over 20k synthetic
    ~2000-char docs (40M chars, ~40M grams) — per-doc cost must stay
    linear in length x window (the staged hash-array projection; the
    un-staged form was O(len^2) and measured pathological). Reports
    wall + selected-fingerprint count (~1/window of grams)."""
    docs = (
        spark.range(20_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(300)),
                    lambda i: F.concat(
                        F.lit("w"),
                        ((F.col("id") * 31 + i * 17) % 5000).cast("string"),
                    ),
                ),
            ).alias("text"),
        )
    )
    t0 = time.time()
    n = docs.transform(_t("text_winnow_fingerprint", k=5, window=4)).count()
    wall = time.time() - t0
    print(f"winnow_long_docs: {wall:.1f}s for 20k x ~2k chars -> {n} fingerprints")


PROBES["winnow_long_docs"] = probe_winnow_long_docs


def probe_streaming_pattern_1m(spark):
    """Round-11 continuation: streaming_event_pattern over 1M events /
    10k keys delivered as two availableNow micro-batches — per-key state
    is O(max_span) and per-batch work is one pandas sort + regex per
    key, so wall should track event volume, not state size. Reports
    per-run wall + the final match totals."""
    import os
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="probe_pat_")
    src, out, ck = [os.path.join(base, d) for d in ("src", "out", "ck")]
    types = ["view", "click", "purchase", "error"]
    try:
        for half in (0, 1):
            (
                spark.range(500_000)
                .select(
                    (F.col("id") % 10_000).alias("user_id"),
                    F.timestamp_seconds(
                        F.lit(1_700_000_000) + half * 500_000 + F.col("id")
                    ).cast("timestamp_ntz").alias("ts"),
                    (F.col("id") + half * 500_000).alias("event_id"),
                    F.element_at(
                        F.array(*[F.lit(t) for t in types]),
                        # vary per user-step: id%10000 is the user, id//10000
                        # the step — a pure id*k%4 is constant per user
                        (
                            (F.col("id") % 10_000 + (F.col("id") / 10_000).cast("long"))
                            % 4 + 1
                        ).cast("int"),
                    ).alias("event_type"),
                )
                .coalesce(4)
                .write.mode("append")
                .parquet(src)
            )
        op = _t(
            "streaming_event_pattern",
            on=["user_id"],
            symbols={"view": "v", "click": "c", "purchase": "p", "error": "e"},
            pattern="vc*p",
            max_span=20,
            tiebreak_col="event_id",
        )
        t0 = time.time()
        q = (
            spark.readStream.schema(
                "user_id BIGINT, ts TIMESTAMP_NTZ, event_id BIGINT, event_type STRING"
            )
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
        wall = time.time() - t0
        res = spark.read.parquet(out)
        latest = res.groupBy("user_id").agg(F.max("seq_len").alias("m"))
        total = (
            res.join(latest, ["user_id"])
            .filter(F.col("seq_len") == F.col("m"))
            .agg(F.sum("n_matches"))
            .first()[0]
        )
        print(
            f"streaming_pattern_1m: {wall:.1f}s for 1M events / 10k keys "
            f"(2 micro-batches) -> {total} total matches"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


PROBES["streaming_pattern_1m"] = probe_streaming_pattern_1m


if __name__ == "__main__":
    main()

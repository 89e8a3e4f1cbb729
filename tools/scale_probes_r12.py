"""Round-12 scale probes (run on local[32]; results recorded in BASELINE.md).

Usage::

    python tools/scale_probes_r12.py [probe ...]

* ``paragraph_dedup_10x`` — text_paragraph_dedup over a 50k-doc corpus
  (10x the sf0.1 documents table, same 3-paragraph staging as dp147
  with a corpus-wide shared boilerplate middle). Proves the round-11
  design holds at 10x: signatures stay a projection (now via the
  mapInArrow-free per-paragraph codegen folds), the only shuffles are
  the band bucket-min, the dup semi-join, and the per-doc reassembly —
  wall should scale ~linearly with paragraphs, no pair joins anywhere.

* ``winnow_cross_10x`` — text_winnow_cross_overlap screening 50k main
  docs against a 2k-excerpt reference (both 10x dp148's shape). The
  two fingerprint sets are persisted once each (the round-11 fix) and
  candidate generation is the fp equi-join under max_bucket_size — the
  probe confirms the persist + cap keep the pair volume bounded at 10x.
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

SHARED = (
    "this shared boilerplate disclaimer paragraph appears in every "
    "document of the corpus and must dedup to one surviving copy"
)


def _t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def _docs_10x(spark):
    """50k docs: the sf0.1 documents table x10 with distinct integral ids.
    Each copy ROTATES its text by a copy-specific offset — textually
    distinct documents (distinct shingles/fingerprints), so the corpus
    behaves like 50k real docs rather than 10 exact clones of 5k (clones
    just inflate every fingerprint bucket past the boilerplate cap and
    the probe degenerates)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(10).withColumnRenamed("id", "__c"))
        .withColumn("__shift", (F.col("__c") * 29 + 1).cast("int"))
        .select(
            (F.col("doc_id") * 10 + F.col("__c")).alias("doc_id"),
            F.expr(
                "concat(substring(text, __shift, 100000), ' ', "
                "substring(text, 1, __shift - 1))"
            ).alias("text"),
        )
        .repartition(32)
    )
    loc = "/tmp/probe_docs10x_r12"
    big.write.mode("overwrite").parquet(loc)
    return spark.read.parquet(loc)


def probe_paragraph_dedup_10x(spark):
    big = _docs_10x(spark)
    n = big.count()
    staged = big.withColumn(
        "text",
        F.concat(
            F.substring("text", 1, 50),
            F.lit("\n" + SHARED + "\n"),
            F.substring("text", 51, 100000),
        ),
    )
    t0 = time.time()
    out = staged.transform(_t("text_paragraph_dedup"))
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_paragraphs").alias("paras"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    print(
        f"[paragraph_dedup_10x] {n} docs / {agg['paras']} paragraphs in "
        f"{time.time() - t0:.1f}s; {agg['kept']} paragraphs kept "
        f"({agg['paras'] - agg['kept']} boilerplate copies dropped)"
    )


PROBES["paragraph_dedup_10x"] = probe_paragraph_dedup_10x


def probe_winnow_cross_10x(spark):
    """Runs at dp148's cap (50) AND at 10x the cap (500): fingerprint
    doc-frequency scales with corpus size, so a fixed cap silently
    reclassifies detection-carrying fingerprints as boilerplate at 10x —
    the production tuning rule this probe quantifies is cap ∝ expected
    per-phrase doc frequency, with the pair budget bounded by
    cap_main x cap_ref per hot fingerprint either way."""
    big = _docs_10x(spark)
    n = big.count()
    ref = big.filter("doc_id % 25 = 0").select(
        "doc_id", F.substring("text", 20, 120).alias("text")
    )
    nref = ref.count()
    for cap in (50, 500):
        t0 = time.time()
        out = big.transform(
            _t(
                "text_winnow_cross_overlap",
                other_df=ref,
                min_shared=3,
                max_bucket_size=cap,
            )
        )
        pairs = out.count()
        print(
            f"[winnow_cross_10x] cap={cap}: {n} main docs x {nref} "
            f"reference excerpts in {time.time() - t0:.1f}s; "
            f"{pairs} overlap pairs"
        )


PROBES["winnow_cross_10x"] = probe_winnow_cross_10x




def probe_streaming_topk_1m(spark):
    """streaming_topk_score over 1M scored events / 10k keys in two
    availableNow micro-batches: per-key state is the k (score, id)
    pairs, per-batch work one dict merge + sort per key — wall should
    track event volume. Emission volume = 10k keys x k x batches."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="probe_topk_")
    src, out, ck = [os.path.join(base, d) for d in ("src", "out", "ck")]
    try:
        for half in (0, 1):
            (
                spark.range(500_000)
                .select(
                    (F.col("id") % 10_000).alias("src_key"),
                    (F.col("id") + half * 500_000).alias("id"),
                    ((F.col("id") * 2654435761) % 1_000_003)
                    .cast("double")
                    .alias("v"),
                )
                .coalesce(4)
                .write.mode("append")
                .parquet(src)
            )
        op = _t(
            "streaming_topk_score",
            on=["src_key"],
            id_col="id",
            score_col="v",
            k=5,
        )
        t0 = time.time()
        q = (
            spark.readStream.schema("src_key BIGINT, id BIGINT, v DOUBLE")
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
            f"[streaming_topk_1m] 1M events / 10k keys, k=5: "
            f"{time.time() - t0:.1f}s end-to-end, {n} snapshot rows"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


PROBES["streaming_topk_1m"] = probe_streaming_topk_1m


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

"""Round-9 scale probes (run on local[32]; results recorded in BASELINE.md).

Usage::

    python tools/scale_probes_r9.py [probe ...]

* ``curation_pipeline_100k`` — the q31 composed ACON chain (stage ->
  gopher -> corpus line dedup -> MinHash+LSH -> 8-gram decontamination ->
  mixture plan) over a 100k-doc corpus tiled from sf0.1, all through ONE
  ``load_data`` run. The interesting number is that composition through
  ``transform_specs`` costs the SUM of its stages — no multiplicative
  re-computation (each stage's frame feeds the next lazily; one action).
* ``kmeans_knee`` — embedding_kmeans at 200k x 256-dim synthetic
  vectors, k in {64, 256, 1024, 4096}: locates the knee where the Arrow
  kernel's per-batch (batch x k) int64 distance tensor starts to
  dominate the scan (SemDeDup-realistic coarse-quantizer regime).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_engine_spark.core.exec_env import ExecEnv  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = {}


def probe_curation_pipeline_100k(spark):
    from lakehouse_engine_spark import load_data
    import __spark_entry__ as entry

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    big = (
        docs.crossJoin(spark.range(20).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
    )
    loc = "/tmp/probe_curation_docs"
    big.write.mode("overwrite").parquet(loc)
    n = spark.read.parquet(loc).count()

    staged_text = (
        "concat(substring(text, 1, 60), chr(10), "
        f"'{entry._Q31_FOOTER}', chr(10), substring(text, 61, 100000))"
    )
    acon = {
        "input_specs": [
            {"spec_id": "docs", "data_format": "parquet", "location": loc}
        ],
        "transform_specs": [
            {
                "spec_id": "bench",
                "input_id": "docs",
                "transformers": [
                    {
                        "function": "expression_filter",
                        "args": {"exp": "doc_id % 1000 = 0"},
                    }
                ],
            },
            {
                "spec_id": "curated",
                "input_id": "docs",
                "transformers": [
                    {
                        "function": "with_expressions",
                        "args": {"cols_and_exprs": {"text": staged_text}},
                    },
                    {
                        "function": "text_gopher_rules",
                        "args": {
                            "min_words": 30,
                            "stopwords": list(entry._Q31_STOPWORDS),
                            "min_stopword_hits": 2,
                        },
                    },
                    {
                        "function": "expression_filter",
                        "args": {"exp": "gopher_keep"},
                    },
                    {"function": "text_line_dedup", "args": {}},
                    {
                        "function": "dedup_minhash_lsh",
                        "args": {
                            "text_col": "text_deduped",
                            "num_hashes": 12,
                            "bands": 4,
                            "shingle_size": 3,
                        },
                    },
                    {
                        "function": "text_decontaminate_with",
                        "args": {
                            "benchmark_with": "bench",
                            "input_col": "text_deduped",
                            "ngram": 8,
                            "mode": "drop",
                        },
                    },
                    {
                        "function": "mixture_plan",
                        "args": {
                            "group_col": "lang",
                            "weights": {"en": 50, "de": 30, "fr": 15, "xx": 5},
                            "budget_tokens": 20_000_000,
                            "token_col": "n_chars",
                            "max_epochs_ppm": 2_000_000,
                        },
                    },
                ],
            },
        ],
        "output_specs": [
            {"spec_id": "out", "input_id": "curated", "data_format": "dataframe"}
        ],
    }
    t0 = time.time()
    res = load_data(acon)
    rows = res["out"].collect()
    dt = time.time() - t0
    avail = {r["lang"]: r["available"] for r in rows}
    print(
        f"[curation_pipeline_100k] {n} docs through the 7-stage composed "
        f"chain in {dt:.1f}s; per-lang available tokens: {avail}"
    )


PROBES["curation_pipeline_100k"] = probe_curation_pipeline_100k


def probe_kmeans_knee(spark):
    from lakehouse_engine_spark.core.definitions import TransformerSpec
    from lakehouse_engine_spark.transformers.transformer_factory import (
        TransformerFactory,
    )

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
    loc = "/tmp/probe_kmeans_emb"
    big.write.mode("overwrite").parquet(loc)
    big = spark.read.parquet(loc)
    n = big.count()
    for k in (64, 256, 1024, 4096):
        op = TransformerFactory.get_transformer(
            TransformerSpec("embedding_kmeans", {"k": k, "iterations": 1})
        )
        t0 = time.time()
        big.transform(op).count()
        print(f"[kmeans_knee] {n} x 256 dims, k={k}: {time.time() - t0:.1f}s")


PROBES["kmeans_knee"] = probe_kmeans_knee


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

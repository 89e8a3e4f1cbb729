"""Round-10 scale probes (run on local[32]; results recorded in BASELINE.md).

Usage::

    python tools/scale_probes_r10.py [probe ...]

* ``kmeans_hier_widek`` — embedding_kmeans_hier at 200k x 256-dim
  synthetic vectors (the round-9 knee corpus), effective k in
  {32768 = 256x128, 65536 = 256x256}: the regime the flat trainer's
  MAX_K=4096 cap points at. Per-batch assignment work is rows x k_fine
  (not rows x k_eff), so the wide-k runs stay inside the same Arrow
  kernel budget the knee probe mapped; driver control state is
  sum(cell sub-centroids) x dim int64 (~67 MB at 32k x 256).
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


def _knee_corpus(spark):
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
    loc = "/tmp/probe_kmeans_emb_r10"
    big.write.mode("overwrite").parquet(loc)
    return spark.read.parquet(loc)


def probe_kmeans_hier_widek(spark):
    from lakehouse_engine_spark.core.definitions import TransformerSpec
    from lakehouse_engine_spark.transformers.transformer_factory import (
        TransformerFactory,
    )

    big = _knee_corpus(spark)
    n = big.count()
    for k1, k2 in ((256, 128), (256, 256)):
        op = TransformerFactory.get_transformer(
            TransformerSpec(
                "embedding_kmeans_hier",
                {
                    "k_coarse": k1,
                    "k_fine": k2,
                    "coarse_iterations": 1,
                    "fine_iterations": 1,
                },
            )
        )
        t0 = time.time()
        out = big.transform(op)
        n_clusters = out.select("cluster").distinct().count()
        print(
            f"[kmeans_hier_widek] {n} x 256 dims, k_eff={k1 * k2} "
            f"({k1}x{k2}): {time.time() - t0:.1f}s, "
            f"{n_clusters} non-empty clusters"
        )


PROBES["kmeans_hier_widek"] = probe_kmeans_hier_widek


def main():
    spark = ExecEnv.get_or_create()
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main()

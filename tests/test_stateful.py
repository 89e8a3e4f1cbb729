"""streaming_running_totals: custom stateful operator on
applyInPandasWithState — per-key accumulators carried across micro-batches
AND across query restarts (state store restored from the checkpoint)."""

from __future__ import annotations

import os

from lakehouse_engine_spark.core.definitions import TransformerSpec
from lakehouse_engine_spark.transformers.transformer_factory import TransformerFactory


def t(name, **args):
    return TransformerFactory.get_transformer(TransformerSpec(name, args))


def _stage(spark, path, rows):
    spark.createDataFrame(rows, "domain STRING, tokens INT").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_stream(spark, src, out, ck, op):
    q = (
        spark.readStream.schema("domain STRING, tokens INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .transform(op)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_running_totals_accumulate_across_batches_and_restarts(spark, tmp_dir):
    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t(
        "streaming_running_totals", on=["domain"], value_col="tokens", budget=100
    )

    # run 1: two files → two micro-batches; totals accumulate within the run
    _stage(spark, src, [("web", 40), ("web", 20), ("code", 10)])
    _stage(spark, src, [("web", 30)])
    _run_stream(spark, src, out, ck, op)
    rows = {
        (r["domain"], r["total_rows"]): (
            r["batch_rows"],
            r["total_value"],
            r["budget_exceeded"],
        )
        for r in spark.read.parquet(out).collect()
    }
    assert rows[("web", 2)] == (2, 60.0, False)   # batch 1
    assert rows[("web", 3)] == (1, 90.0, False)   # batch 2 carries state
    assert rows[("code", 1)] == (1, 10.0, False)

    # "kill", stage more, restart on the SAME checkpoint: the state store
    # restores (web continues from 90, crossing the 100 budget)
    _stage(spark, src, [("web", 15), ("code", 5)])
    _run_stream(spark, src, out, ck, op)
    rows = {
        (r["domain"], r["total_rows"]): (r["total_value"], r["budget_exceeded"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows[("web", 4)] == (105.0, True)      # budget tripped post-restart
    assert rows[("code", 2)] == (15.0, False)


def test_running_totals_batch_fallback(spark):
    df = spark.createDataFrame(
        [("web", 40), ("web", 20), ("code", 10)], "domain STRING, tokens INT"
    )
    out = {
        r["domain"]: (r["total_rows"], r["total_value"], r["budget_exceeded"])
        for r in df.transform(
            t("streaming_running_totals", on=["domain"], value_col="tokens",
              budget=50)
        ).collect()
    }
    assert out == {"web": (2, 60.0, True), "code": (1, 10.0, False)}

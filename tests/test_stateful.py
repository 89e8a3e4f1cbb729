"""streaming_running_totals: custom stateful operator on
applyInPandasWithState — per-key accumulators carried across micro-batches
AND across query restarts (state store restored from the checkpoint)."""

from __future__ import annotations

import os

import pytest

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


def _stage_ts(spark, path, rows):
    spark.createDataFrame(
        rows, "sensor STRING, ts TIMESTAMP_NTZ, v DOUBLE"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_ewma_stream(spark, src, out, ck, op):
    q = (
        spark.readStream.schema("sensor STRING, ts TIMESTAMP_NTZ, v DOUBLE")
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


def _mk_rows(vals, start=0):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    return [
        ("s1", t0 + timedelta(minutes=start + i), float(v))
        for i, v in enumerate(vals)
    ]


def test_ewma_anomaly_batch_flags_spike(spark):
    """Batch mode: a flat series with one spike — only the spike is
    flagged, z is NULL during warm-up, ewma tracks the level."""
    vals = [10, 11, 10, 11, 10, 11, 10, 100, 10, 11]
    df = spark.createDataFrame(
        _mk_rows(vals), "sensor STRING, ts TIMESTAMP_NTZ, v DOUBLE"
    )
    out = df.transform(
        t("streaming_ewma_anomaly", on=["sensor"], value_col="v",
          ts_col="ts", alpha=0.3, threshold=3.0, min_periods=5)
    ).orderBy("ts").collect()
    flags = [r["is_anomaly"] for r in out]
    assert flags == [False] * 7 + [True, False, False]
    assert all(r["z"] is None for r in out[:5])  # warm-up
    assert abs(out[-1]["ewma"] - 11) < 30  # pulled up by spike, decaying
    with pytest.raises(ValueError):
        t("streaming_ewma_anomaly", on=["sensor"], value_col="v", alpha=0.0)
    with pytest.raises(ValueError):
        t("streaming_ewma_anomaly", on=["sensor"], value_col="v", min_periods=0)


def test_ewma_anomaly_stream_matches_batch_and_survives_restart(spark, tmp_dir):
    """The same series split into 3 micro-batches across 2 runs (restart
    from checkpoint between them) produces EXACTLY the batch-mode output:
    batch-boundary independence + state-store recovery in one pin."""
    vals = [10, 11, 10, 11, 10, 11, 10, 100, 10, 11, 10, 50]
    src = os.path.join(tmp_dir, "esrc")
    out = os.path.join(tmp_dir, "eout")
    ck = os.path.join(tmp_dir, "eck")
    op = t("streaming_ewma_anomaly", on=["sensor"], value_col="v",
           ts_col="ts", alpha=0.3, threshold=3.0, min_periods=5)

    _stage_ts(spark, src, _mk_rows(vals[:5], 0))
    _stage_ts(spark, src, _mk_rows(vals[5:8], 5))
    _run_ewma_stream(spark, src, out, ck, op)
    _stage_ts(spark, src, _mk_rows(vals[8:], 8))   # after "kill"
    _run_ewma_stream(spark, src, out, ck, op)      # restart, same ck

    streamed = [
        (r["v"], r["ewma"], r["z"], r["is_anomaly"])
        for r in spark.read.parquet(out).orderBy("ts").collect()
    ]
    batch_df = spark.createDataFrame(
        _mk_rows(vals), "sensor STRING, ts TIMESTAMP_NTZ, v DOUBLE"
    )
    batched = [
        (r["v"], r["ewma"], r["z"], r["is_anomaly"])
        for r in batch_df.transform(op).orderBy("ts").collect()
    ]
    assert len(streamed) == len(vals)
    for s, b in zip(streamed, batched):
        assert s[0] == b[0] and s[3] == b[3]
        assert abs(s[1] - b[1]) < 1e-9
        assert (s[2] is None) == (b[2] is None)
        if s[2] is not None:
            assert abs(s[2] - b[2]) < 1e-9


def test_approx_distinct_accuracy_and_bounded_state(spark, tmp_dir):
    """HLL stateful distinct: batch estimate within the sketch's error
    band; streaming across two runs (restart between) converges to the
    same estimate as one batch pass over everything — the registers, not
    the values, are the state."""
    import pyspark.sql.functions as F

    vals = [(f"d{i % 7}", f"v{i}") for i in range(2000)]
    df = spark.createDataFrame(vals, "domain STRING, v STRING")
    est = {
        r["domain"]: r["approx_distinct"]
        for r in df.transform(
            t("streaming_approx_distinct", on=["domain"], value_col="v",
              precision=6)
        ).collect()
    }
    for d, e in est.items():
        true = 2000 / 7
        assert abs(e - true) / true < 0.4, (d, e)  # 3x the 13% std error

    src = os.path.join(tmp_dir, "hsrc")
    out = os.path.join(tmp_dir, "hout")
    ck = os.path.join(tmp_dir, "hck")
    op = t("streaming_approx_distinct", on=["domain"], value_col="v",
           precision=6)
    half = len(vals) // 2
    spark.createDataFrame(vals[:half], "domain STRING, v STRING").coalesce(
        1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema("domain STRING, v STRING")
            .option("maxFilesPerTrigger", 1).parquet(src)
            .transform(op)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(vals[half:], "domain STRING, v STRING").coalesce(
        1).write.mode("append").parquet(src)
    run()  # restart on same checkpoint: registers restored
    # cumulative streaming estimate == the one-pass batch estimate
    # (identical hash + registers), for every domain
    stream_cum = {
        r["domain"]: r["approx_distinct"]
        for r in spark.read.parquet(out)
        .groupBy("domain").agg(F.max("approx_distinct").alias("approx_distinct"))
        .collect()
    }
    assert stream_cum == est
    with pytest.raises(ValueError):
        t("streaming_approx_distinct", on=["domain"], value_col="v",
          precision=2)


def test_ewma_null_values_do_not_poison_state(spark):
    """A null/NaN value row is emitted unscored (z NULL, not flagged) and
    does NOT fold into the key's state — before round 5, one NaN made
    ewma/ewvar NaN forever, so every later row z-scored to NaN. The fold
    must behave as if the null row never happened, except the row itself
    still appears in the output with the current baseline."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    vals = [10.0, 11.0, None, 10.0, 11.0, 10.0, 11.0, 100.0, 10.0]
    rows = [
        ("s1", t0 + timedelta(minutes=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "sensor STRING, ts TIMESTAMP_NTZ, v DOUBLE")
    out = (
        df.transform(
            t("streaming_ewma_anomaly", on=["sensor"], value_col="v",
              ts_col="ts", alpha=0.3, threshold=3.0, min_periods=5)
        )
        .orderBy("ts")
        .collect()
    )
    # the null row: unscored, unflagged, ewma = baseline before it
    nrow = out[2]
    assert nrow["z"] is None and nrow["is_anomaly"] is False
    assert nrow["ewma"] == pytest.approx(out[1]["ewma"])
    # state survived: the spike (8 non-null values in) is still caught
    assert [r["is_anomaly"] for r in out] == (
        [False] * 7 + [True, False]
    )
    # and every post-null z is a real number once warmed up
    assert all(r["z"] is not None for r in out[6:])


def test_ewma_null_key_is_single_group_batch_matches_stream_semantics(spark):
    """A NULL key partition must fold as ONE group in the batch path —
    NaN != NaN comparisons used to split it into a group per row (fresh
    state each row: never warms up, never flags), diverging from
    streaming groupBy where null is a single group."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    vals = [10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 10.0, 100.0, 10.0]
    rows = [
        (None, t0 + timedelta(minutes=i), v) for i, v in enumerate(vals)
    ] + [
        ("s2", t0 + timedelta(minutes=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "sensor STRING, ts TIMESTAMP_NTZ, v DOUBLE")
    out = df.transform(
        t("streaming_ewma_anomaly", on=["sensor"], value_col="v",
          ts_col="ts", alpha=0.3, threshold=3.0, min_periods=5)
    ).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["sensor"], []).append(r)
    for key in (None, "s2"):
        seq = sorted(by_key[key], key=lambda r: r["ts"])
        assert [r["is_anomaly"] for r in seq] == [False] * 7 + [True, False], key


def test_approx_distinct_jvm_fast_path_matches_pandas_fold(spark):
    """Batch HLL has two implementations: the JVM codegen register build
    (integral/string values) and the pandas md5 fold (everything else,
    and the streaming state path). Their estimates must be IDENTICAL —
    same hash, same registers, same float arithmetic — across dtypes."""
    rows = [(i % 7, f"v{i % 53}") for i in range(2000)]
    sdf = spark.createDataFrame(rows, "k INT, v STRING")
    # string dtype → JVM path
    jvm = {
        r["k"]: (r["batch_rows"], r["approx_distinct"])
        for r in sdf.transform(
            t("streaming_approx_distinct", on=["k"], value_col="v")
        ).collect()
    }
    # force the pandas path by routing the same values through a DOUBLE
    # column whose str() rendering is identical in both paths is NOT
    # guaranteed — so instead compare against the reference fold directly
    import hashlib

    def ref(vals):
        m = 64
        regs = [0] * m
        for v in vals:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            idx, rest = h & 63, h >> 6
            rho = 55 if rest == 0 else 54 - rest.bit_length() + 1
            regs[idx] = max(regs[idx], rho)
        import math
        inv = sum(1 << (56 - r) for r in regs) / float(1 << 56)
        est = 0.709 * 64 * 64 / inv
        zeros = regs.count(0)
        if est <= 160 and zeros:
            est = 64 * math.log(64 / zeros)
        return int(est + 0.5)

    by_key = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    for k, vals in by_key.items():
        assert jvm[k] == (len(vals), ref(vals)), k
    # double values still take the pandas fold (str() rendering differs
    # from Spark's cast) and agree with the reference fold over str(v)
    ddf = spark.createDataFrame(
        [(1, float(i % 11) + 0.25) for i in range(200)], "k INT, v DOUBLE"
    )
    got = ddf.transform(
        t("streaming_approx_distinct", on=["k"], value_col="v")
    ).first()
    assert got["approx_distinct"] == ref([float(i % 11) + 0.25 for i in range(200)])


def test_hll_estimate_max_rank_register_never_negative_shift():
    """Regression: precision=4 has max register rank 61-4=57; the old
    2^56-scaled harmonic sum computed `1 << (56 - 57)` and raised
    ValueError. The scale is now 2^(61-precision), non-negative across
    the whole allowed [4,12] range even with every register at max rank."""
    import math

    from lakehouse_engine_spark.datapipes.stateful import hll_estimate

    for p in range(4, 13):
        m = 1 << p
        regs = [61 - p] * m  # every register at the max possible rank
        assert hll_estimate(regs, p) > 0
    # and at precision 6 the rescale is bit-identical to the dp95 DuckDB
    # oracle's 2^56 scaling (same rational number → same rounded double)
    import random

    random.seed(7)
    regs = [random.randint(0, 55) for _ in range(64)]
    inv56 = sum(1 << (56 - r) for r in regs) / float(1 << 56)
    ref = 0.709 * 64 * 64 / inv56
    zeros = regs.count(0)
    if ref <= 160 and zeros:
        ref = 64 * math.log(64 / zeros)
    assert hll_estimate(regs, 6) == ref


def test_approx_distinct_precision_bounds_run(spark):
    """The operator accepts the full documented precision range; the
    boundary precisions run end-to-end on the batch path."""
    sdf = spark.createDataFrame(
        [(1, f"v{i % 29}") for i in range(300)], "k INT, v STRING"
    )
    for p in (4, 12):
        got = sdf.transform(
            t("streaming_approx_distinct", on=["k"], value_col="v", precision=p)
        ).first()
        assert got["batch_rows"] == 300 and got["approx_distinct"] > 0, p


def test_approx_distinct_integral_nulls_stream_matches_batch(spark, tmp_dir):
    """An int64 column CONTAINING NULLS reaches the pandas fold as float64
    (Arrow nullability), so str(123.0)='123.0' used to hash differently
    from the JVM fast path's CAST(123 AS STRING)='123' — batch and
    streaming estimates diverged. The fold now coerces back to int for
    integral source columns; the two paths must agree exactly."""
    import pyspark.sql.functions as F

    rows = [
        ("k%d" % (i % 3), None if i % 17 == 0 else (i % 41) * 1000 + i % 7)
        for i in range(600)
    ]
    sdf = spark.createDataFrame(rows, "domain STRING, v LONG")
    batch = {
        r["domain"]: r["approx_distinct"]
        for r in sdf.transform(
            t("streaming_approx_distinct", on=["domain"], value_col="v")
        ).collect()
    }

    src = os.path.join(tmp_dir, "isrc")
    out = os.path.join(tmp_dir, "iout")
    ck = os.path.join(tmp_dir, "ick")
    sdf.coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema("domain STRING, v LONG")
        .parquet(src)
        .transform(
            t("streaming_approx_distinct", on=["domain"], value_col="v")
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {
        r["domain"]: r["approx_distinct"]
        for r in spark.read.parquet(out)
        .groupBy("domain")
        .agg(F.max("approx_distinct").alias("approx_distinct"))
        .collect()
    }
    assert stream == batch


def _latest_per_domain(df):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("domain").orderBy(F.desc("n_seen"))
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter("__r = 1")
        .drop("__r")
    )


def test_reservoir_quantiles_stream_matches_batch_and_restarts(spark, tmp_dir):
    """streaming_reservoir_quantiles: the hash-priority reservoir is
    mergeable, so the cumulative streaming estimate after any number of
    micro-batches equals the one-pass batch estimate over the same rows —
    including across a query restart (reservoir restored from the
    checkpoint). Null values join neither the sample nor n_seen."""
    import pyspark.sql.functions as F

    rows = [
        ("k%d" % (i % 3), i, None if i % 19 == 0 else float((i * 37) % 101))
        for i in range(600)
    ]
    sdf = spark.createDataFrame(rows, "domain STRING, event_id LONG, v DOUBLE")
    op = t("streaming_reservoir_quantiles", on=["domain"], value_col="v",
           id_col="event_id", k=32, probs=[0.5, 0.9])
    batch = {
        r["domain"]: (r["n_seen"], r["sample_n"], r["q_50"], r["q_90"])
        for r in sdf.transform(op).collect()
    }
    assert all(n == 200 - len([1 for d, i, v in rows
                               if v is None and d == k])
               for k, (n, _, _, _) in batch.items())

    src = os.path.join(tmp_dir, "rsrc")
    out = os.path.join(tmp_dir, "rout")
    ck = os.path.join(tmp_dir, "rck")
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], "domain STRING, event_id LONG, v DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema("domain STRING, event_id LONG, v DOUBLE")
            .option("maxFilesPerTrigger", 1).parquet(src)
            .transform(op)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows[half:], "domain STRING, event_id LONG, v DOUBLE")\
        .coalesce(1).write.mode("append").parquet(src)
    run()  # restart on the same checkpoint: reservoir restored
    final = {
        r["domain"]: (r["n_seen"], r["sample_n"], r["q_50"], r["q_90"])
        for r in _latest_per_domain(spark.read.parquet(out)).collect()
    }
    assert final == batch


def test_streaming_dedup_exact_batch_arm(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other"), (5, "same")],
        "doc_id INT, text STRING",
    )
    out = df.transform(t("streaming_dedup_exact")).collect()
    got = {r["doc_id"]: r["content_digest"] for r in out}
    assert set(got) == {1, 2}  # smallest id wins per digest
    assert len({r["content_digest"] for r in out}) == 2


def test_streaming_dedup_exact_across_batches_and_restarts(spark, tmp_dir):
    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t("streaming_dedup_exact", id_col="doc_id")

    def stage(rows):
        spark.createDataFrame(rows, "doc_id INT, text STRING").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema("doc_id INT, text STRING")
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

    # batch 1 has an in-batch dup (1 wins over 4); batch 2 repeats "a"
    stage([(4, "a"), (1, "a"), (2, "b")])
    stage([(9, "a"), (3, "c")])
    run()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]

    # kill + restart on the same checkpoint: state survives — "a" and "c"
    # stay swallowed, only the genuinely new "d" emits
    stage([(7, "a"), (8, "c"), (6, "d")])
    run()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 6]


def _stage_events(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP_NTZ, event_id INT, event_type STRING"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_pattern_stream(spark, src, out, ck, op):
    q = (
        spark.readStream.schema(
            "user_id INT, ts TIMESTAMP_NTZ, event_id INT, event_type STRING"
        )
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


def test_streaming_event_pattern_spans_batches_and_restarts(spark, tmp_dir):
    """A match whose symbols arrive in DIFFERENT micro-batches completes
    when the closing symbol lands (the carried suffix lives in the state
    store); counts keep accumulating across a checkpoint restart; the
    carry is bounded by max_span."""
    import datetime as dt

    import os

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t(
        "streaming_event_pattern",
        on=["user_id"],
        symbols={"view": "v", "click": "c", "purchase": "p"},
        pattern="vc*p",
        max_span=10,
        tiebreak_col="event_id",
    )
    # batch 1: v c (pending, no match) — batch 2: p completes it
    _stage_events(spark, src, [(1, at(0), 1, "view"), (1, at(1), 2, "click")])
    _stage_events(spark, src, [(1, at(2), 3, "purchase")])
    _run_pattern_stream(spark, src, out, ck, op)
    rows = {
        (r["user_id"], r["seq_len"]): (r["n_new"], r["n_matches"], r["first_match"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(1, 2)] == (0, 0, None)        # pending after batch 1
    assert rows[(1, 3)] == (1, 1, "vcp")       # completed across the boundary

    # restart on the same checkpoint: another full match accumulates
    _stage_events(spark, src, [(1, at(3), 4, "view"), (1, at(4), 5, "purchase")])
    _run_pattern_stream(spark, src, out, ck, op)
    rows = {
        (r["user_id"], r["seq_len"]): (r["n_new"], r["n_matches"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(1, 5)] == (1, 2)


def test_streaming_event_pattern_batch_arm_matches_batch_operator(spark):
    """On a batch frame the op reshapes event_pattern_match's totals into
    the streaming columns; max_span validation."""
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, T0, 1, "view"), (1, T0 + dt.timedelta(minutes=1), 2, "purchase"),
        (2, T0, 3, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING"
    )
    out = {
        r["user_id"]: (r["n_new"], r["n_matches"], r["seq_len"], r["first_match"])
        for r in df.transform(
            t("streaming_event_pattern", on=["user_id"],
              symbols={"view": "v", "click": "c", "purchase": "p"},
              pattern="vc*p", max_span=10, tiebreak_col="event_id")
        ).collect()
    }
    assert out[1] == (1, 1, 2, "vp")
    assert out[2] == (0, 0, 1, None)
    with pytest.raises(ValueError):
        t("streaming_event_pattern", on=["user_id"], symbols={"view": "v"},
          pattern="v", max_span=0)


def _stage_ids(spark, path, rows):
    spark.createDataFrame(rows, "src STRING, id BIGINT").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_bottomk_stream(spark, src, out, ck, op):
    q = (
        spark.readStream.schema("src STRING, id BIGINT")
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


def test_streaming_bottomk_sample_order_independent_and_restart_safe(spark, tmp_dir):
    """The maintained sample is a pure function of the id SET: streaming
    any split of the ids (including across a restart) converges to the
    batch arm's bottom-k; re-delivered ids don't double-enter; snapshots
    carry cumulative total_seen."""
    import os

    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t("streaming_bottomk_sample", on=["src"], id_col="id", k=3)

    ids = [("a", i) for i in range(20)]
    batch_df = spark.createDataFrame(ids, "src STRING, id BIGINT")
    expected = sorted(
        r["id"] for r in batch_df.transform(op).collect()
    )

    _stage_ids(spark, src, ids[:7])
    _stage_ids(spark, src, ids[7:12] + ids[:2])  # re-delivery of 0,1
    _run_bottomk_stream(spark, src, out, ck, op)
    _stage_ids(spark, src, ids[12:])             # rest after a restart
    _run_bottomk_stream(spark, src, out, ck, op)

    rows = spark.read.parquet(out).collect()
    latest_seen = max(r["total_seen"] for r in rows)
    final = sorted(r["id"] for r in rows if r["total_seen"] == latest_seen)
    assert final == expected
    assert latest_seen == 22  # 20 ids + 2 re-deliveries counted as rows
    # every snapshot is a valid bottom-k of what had been seen
    assert all(1 <= r["sample_rank"] <= 3 for r in rows)


def test_streaming_bottomk_sample_batch_arm_window_rank(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", 100)], "src STRING, id BIGINT"
    )
    out = df.transform(
        t("streaming_bottomk_sample", on=["src"], id_col="id", k=2)
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r)
    assert len(by["a"]) == 2 and all(r["total_seen"] == 10 for r in by["a"])
    assert len(by["b"]) == 1 and by["b"][0]["sample_rank"] == 1
    with pytest.raises(ValueError):
        t("streaming_bottomk_sample", on=["src"], id_col="id", k=0)
    with pytest.raises(ValueError):
        t("streaming_bottomk_sample", on=[], id_col="id", k=1)


def _stage_items(spark, path, rows):
    spark.createDataFrame(rows, "src STRING, item STRING").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_hh_stream(spark, src, out, ck, op):
    q = (
        spark.readStream.schema("src STRING, item STRING")
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


def test_streaming_heavy_hitters_guarantee_across_restart(spark, tmp_dir):
    """An item above the n/width frequency bar must be IN the summary
    with its true count inside [count_min, count_max]; summary size
    never exceeds width; state survives a checkpoint restart."""
    import os

    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t("streaming_heavy_hitters", on=["src"], value_col="item", width=3)

    # hot item "H" (12x) among 9 distinct cold items (1x each): n=21,
    # true freq 12/21 >> 1/3
    hot = [("a", "H")] * 6
    cold1 = [("a", f"c{i}") for i in range(5)]
    _stage_items(spark, src, hot + cold1)
    _stage_items(spark, src, [("a", "H")] * 3)
    _run_hh_stream(spark, src, out, ck, op)
    _stage_items(spark, src, [("a", "H")] * 3 + [("a", f"d{i}") for i in range(4)])
    _run_hh_stream(spark, src, out, ck, op)  # restart on same checkpoint

    rows = spark.read.parquet(out).collect()
    latest = max(r["processed"] for r in rows)
    final = {r["item"]: r for r in rows if r["processed"] == latest}
    assert latest == 21
    assert len(final) <= 3
    h = final["H"]
    assert h["count_min"] <= 12 <= h["count_max"]
    # per-batch snapshots also respect the width bound
    from collections import Counter
    per_batch = Counter(r["processed"] for r in rows)
    assert all(v <= 3 for v in per_batch.values())


def test_streaming_heavy_hitters_batch_arm_exact_guarantee_set(spark):
    """Batch arm: the exact counts of every item with count*width > n —
    the guarantee set a reader should treat the summary as."""
    rows = [("a", "x")] * 5 + [("a", "y")] * 4 + [("a", "z")]
    df = spark.createDataFrame(rows, "src STRING, item STRING")
    out = {
        r["item"]: r
        for r in df.transform(
            t("streaming_heavy_hitters", on=["src"], value_col="item", width=3)
        ).collect()
    }
    # n=10, bar=10/3: x(5) and y(4) qualify, z(1) doesn't
    assert set(out) == {"x", "y"}
    assert out["x"]["count_min"] == out["x"]["count_max"] == 5
    assert out["x"]["processed"] == 10
    with pytest.raises(ValueError):
        t("streaming_heavy_hitters", on=["src"], value_col="item", width=0)


def test_streaming_funnel_chains_across_batches_and_restart(spark, tmp_dir):
    """Stage times ratchet in as the chain completes across micro-batches
    (click before view doesn't count; a later view then click does);
    state survives a restart; batch arm equals the funnel operator."""
    import datetime as dt
    import os

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t("streaming_funnel", on=["user_id"], stage_col="event_type",
           stages=["view", "click", "purchase"])

    # batch 1: click (ignored: no view yet) then view
    _stage_events(spark, src, [(1, at(0), 1, "click"), (1, at(1), 2, "view")])
    # batch 2: click qualifies now
    _stage_events(spark, src, [(1, at(2), 3, "click")])
    _run_pattern_stream(spark, src, out, ck, op)
    # restart: purchase completes the funnel
    _stage_events(spark, src, [(1, at(3), 4, "purchase")])
    _run_pattern_stream(spark, src, out, ck, op)

    rows = sorted(
        spark.read.parquet(out).collect(),
        key=lambda r: (r["stage1_ts"] is None, r["stage2_ts"] is None,
                       r["stage3_ts"] is None),
    )
    snap1 = [r for r in rows if r["stage2_ts"] is None][0]
    assert snap1["stage1_ts"] == at(1) and snap1["stage3_ts"] is None
    final = [r for r in rows if r["stage3_ts"] is not None][0]
    assert (final["stage1_ts"], final["stage2_ts"], final["stage3_ts"]) == (
        at(1), at(2), at(3)
    )

    # batch arm == funnel operator
    df = spark.createDataFrame(
        [(1, at(0), 1, "click"), (1, at(1), 2, "view"),
         (1, at(2), 3, "click"), (1, at(3), 4, "purchase")],
        "user_id INT, ts TIMESTAMP_NTZ, event_id INT, event_type STRING",
    )
    got = df.transform(op).first()
    ref = df.transform(
        t("funnel", on=["user_id"], stage_col="event_type",
          stages=["view", "click", "purchase"])
    ).first()
    assert (got["stage1_ts"], got["stage2_ts"], got["stage3_ts"]) == (
        ref["stage1_ts"], ref["stage2_ts"], ref["stage3_ts"]
    )
    with pytest.raises(ValueError):
        t("streaming_funnel", on=["user_id"], stage_col="event_type", stages=[])


def test_streaming_session_stats_native_session_window(spark, tmp_dir):
    """Native session_window + watermark: events within the gap chain
    into one session; a session emits once the watermark (advanced by
    much-later events) passes it; batch arm replays the lag-gap split;
    a stream without a watermark is rejected."""
    import datetime as dt
    import os

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    src = os.path.join(tmp_dir, "src")
    out = os.path.join(tmp_dir, "out")
    ck = os.path.join(tmp_dir, "ck")
    op = t("streaming_session_stats", on=["user_id"], ts_col="ts",
           gap="30 minutes", watermark="10 minutes")

    # one session of 3 events (gaps < 30m), then a far-future event that
    # pushes the watermark past it
    _stage_events(spark, src, [(1, at(0), 1, "view"), (1, at(10), 2, "click"),
                               (1, at(35), 3, "view")])
    _stage_events(spark, src, [(1, at(600), 4, "view")])
    _run_pattern_stream(spark, src, out, ck, op)
    rows = spark.read.parquet(out).collect()
    closed = [r for r in rows if r["n_events"] == 3]
    assert len(closed) == 1
    assert closed[0]["session_start"] == at(0)
    assert closed[0]["session_last"] == at(35)

    # batch arm: same events, same sessions (plus the singleton)
    df = spark.createDataFrame(
        [(1, at(0), 1, "v"), (1, at(10), 2, "v"), (1, at(35), 3, "v"),
         (1, at(600), 4, "v")],
        "user_id INT, ts TIMESTAMP_NTZ, event_id INT, event_type STRING",
    )
    got = sorted(
        (r["session_start"], r["session_last"], r["n_events"])
        for r in df.transform(
            t("streaming_session_stats", on=["user_id"], gap="30 minutes")
        ).collect()
    )
    assert got == [(at(0), at(35), 3), (at(600), at(600), 1)]

    # stream without watermark -> rejected at plan time
    stream = (
        spark.readStream.schema(
            "user_id INT, ts TIMESTAMP_NTZ, event_id INT, event_type STRING"
        )
        .parquet(src)
    )
    with pytest.raises(ValueError):
        stream.transform(
            t("streaming_session_stats", on=["user_id"], gap="30 minutes")
        )
    with pytest.raises(ValueError):
        t("streaming_session_stats", on=[])


def test_streaming_event_pattern_finalize_span_merges_boundary_growth(spark, tmp_dir):
    """finalize='span' defers counting until max_span symbols pass the
    match start, so a quantified match growing across a batch boundary
    counts ONCE like the batch arm; 'eager' counts the boundary pieces
    separately (the documented latency/merge trade)."""
    import datetime as dt
    import os

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    def events(path_suffix, mode):
        src = os.path.join(tmp_dir, f"src_{path_suffix}")
        out = os.path.join(tmp_dir, f"out_{path_suffix}")
        ck = os.path.join(tmp_dir, f"ck_{path_suffix}")
        op = t("streaming_event_pattern", on=["user_id"],
               symbols={"error": "e", "fix": "f"},
               pattern="(ef)+", max_span=6, finalize=mode)
        _stage_events(spark, src, [(1, at(0), 1, "error"), (1, at(1), 2, "fix")])
        _stage_events(spark, src, [(1, at(2), 3, "error"), (1, at(3), 4, "fix")])
        # pad far past max_span so pending matches finalize
        _stage_events(spark, src, [(1, at(10 + i), 10 + i, "error")
                                   for i in range(8)])
        _run_pattern_stream(spark, src, out, ck, op)
        rows = spark.read.parquet(out).collect()
        latest = max(r["seq_len"] for r in rows)
        return [r for r in rows if r["seq_len"] == latest][0]

    span = events("span", "span")
    assert span["n_matches"] == 1 and span["first_match"] == "efef"
    eager = events("eager", "eager")
    assert eager["n_matches"] == 2 and eager["first_match"] == "ef"


def test_streaming_event_pattern_watermark_arm_out_of_order(spark, tmp_dir):
    """The watermark arm equals the batch arm under SHUFFLED cross-batch
    delivery: events arrive out of event-time order across micro-batches,
    are buffered in state, and are consumed only once the watermark
    passes them — in event-time order. A far-future unmapped event
    advances the watermark so the availableNow drain flushes everything."""
    import datetime as dt
    import os

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    src = os.path.join(tmp_dir, "src_wm")
    out = os.path.join(tmp_dir, "out_wm")
    ck = os.path.join(tmp_dir, "ck_wm")
    op = t(
        "streaming_event_pattern",
        on=["user_id"],
        symbols={"error": "e", "fix": "f"},
        pattern="(ef)+",
        max_span=6,
        finalize="span",
        tiebreak_col="event_id",
        watermark_delay="10 minutes",  # covers the fixture's 3-min disorder
    )
    # true event-time order is e f e f e f (ts 0..5); delivery is shuffled
    # ACROSS batches — the ordered arm would weave "feefex..." and miss
    _stage_events(spark, src, [(1, at(3), 4, "fix"), (1, at(0), 1, "error")])
    _stage_events(spark, src, [(1, at(4), 5, "error"), (1, at(1), 2, "fix")])
    _stage_events(
        spark,
        src,
        [(1, at(2), 3, "error"), (1, at(5), 6, "fix"),
         (1, at(10000), 7, "flush")],  # unmapped: advances watermark only
    )
    _run_pattern_stream(spark, src, out, ck, op)
    # second drain: data arrives for a DIFFERENT key while key 1 gets
    # nothing — key 1's buffered events must flush via the EVENT-TIME
    # TIMEOUT (the watermark, advanced by the flush tick, passed them)
    _stage_events(spark, src, [(2, at(10001), 99, "error")])
    _run_pattern_stream(spark, src, out, ck, op)
    rows = [r for r in spark.read.parquet(out).collect() if r["user_id"] == 1]
    latest = max(r["seq_len"] for r in rows)
    final = [r for r in rows if r["seq_len"] == latest][0]
    # batch arm on the ordered fixture: one greedy match "efefef"
    assert final["seq_len"] == 6
    assert final["n_matches"] == 1
    assert final["first_match"] == "efefef"
    # snapshots are monotone: n_matches never decreases as seq_len grows
    by_len = sorted(rows, key=lambda r: r["seq_len"])
    ms = [r["n_matches"] for r in by_len]
    assert ms == sorted(ms)


def test_streaming_event_pattern_watermark_drops_late_beyond_delay(spark, tmp_dir):
    """An event arriving LATER than the declared delay (its ts is already
    below the advanced watermark) is dropped — the streaming-aggregation
    contract — instead of being spliced behind already-consumed symbols."""
    import datetime as dt
    import os

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    src = os.path.join(tmp_dir, "src_late")
    out = os.path.join(tmp_dir, "out_late")
    ck = os.path.join(tmp_dir, "ck_late")
    op = t(
        "streaming_event_pattern",
        on=["user_id"],
        symbols={"error": "e", "fix": "f"},
        pattern="ef",
        max_span=4,
        finalize="eager",
        tiebreak_col="event_id",
        watermark_delay="1 minute",
    )
    # batch 1 pushes the watermark to at(99): an at(0) 'fix' arriving in
    # batch 2 is >1min late -> dropped; the at(100) fix pairs with e2
    _stage_events(spark, src, [(1, at(0), 1, "error"), (1, at(100), 2, "error")])
    _stage_events(spark, src, [(1, at(0), 3, "fix"), (1, at(100), 4, "fix"),
                               (1, at(10000), 9, "flush")])
    _run_pattern_stream(spark, src, out, ck, op)
    _stage_events(spark, src, [(2, at(10001), 99, "error")])  # timeout tick
    _run_pattern_stream(spark, src, out, ck, op)
    rows = [r for r in spark.read.parquet(out).collect() if r["user_id"] == 1]
    latest = max(r["seq_len"] for r in rows)
    final = [r for r in rows if r["seq_len"] == latest][0]
    # consumed sequence is e,e,f (the late at(0) fix never spliced in
    # as 'e f e f' would have) -> exactly ONE 'ef' match
    assert final["seq_len"] == 3
    assert final["n_matches"] == 1


def _stage_scored(spark, path, rows):
    spark.createDataFrame(
        rows, "src STRING, id BIGINT, v DOUBLE"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_topk_stream(spark, src, out, ck, op):
    q = (
        spark.readStream.schema("src STRING, id BIGINT, v DOUBLE")
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


def test_streaming_topk_score_converges_and_best_score_wins(spark, tmp_dir):
    """The maintained top-k is a pure function of the (id -> best score)
    map: any batch split (including a restart) converges to the batch
    arm; a re-delivered id keeps its BEST score (late re-scores only
    promote); NULL ids/scores are excluded; k/on validation."""
    import os

    src = os.path.join(tmp_dir, "tk_src")
    out = os.path.join(tmp_dir, "tk_out")
    ck = os.path.join(tmp_dir, "tk_ck")
    op = t(
        "streaming_topk_score", on=["src"], id_col="id", score_col="v", k=3
    )
    rows = (
        [("a", i, float(i % 7)) for i in range(1, 11)]
        + [("a", 3, 100.0)]          # re-score promotes id 3 to the top
        + [("a", 4, -1.0)]           # re-score DOWN is ignored (best wins)
        + [("a", None, 50.0), ("a", 99, None)]  # excluded
    )
    batch_df = spark.createDataFrame(rows, "src STRING, id BIGINT, v DOUBLE")
    expected = sorted(
        (r["id"], r["score"], r["rank"])
        for r in batch_df.transform(op).collect()
    )
    assert (3, 100.0, 1) in expected       # promoted re-score
    _stage_scored(spark, src, rows[:4])
    _stage_scored(spark, src, rows[4:9])
    _run_topk_stream(spark, src, out, ck, op)
    _stage_scored(spark, src, rows[9:])    # rest after a restart
    _run_topk_stream(spark, src, out, ck, op)
    got = spark.read.parquet(out).collect()
    latest = max(r["total_seen"] for r in got)
    final = sorted(
        (r["id"], r["score"], r["rank"])
        for r in got
        if r["total_seen"] == latest
    )
    assert final == expected
    assert latest == 12                    # null id/score rows not counted
    with pytest.raises(ValueError):
        t("streaming_topk_score", on=["src"], id_col="id", score_col="v", k=0)
    with pytest.raises(ValueError):
        t("streaming_topk_score", on=[], id_col="id", score_col="v", k=1)


def test_streaming_quality_buckets_converges_and_restarts(spark, tmp_dir):
    """The emitted tier table is a pure function of the cumulative
    (group -> score histogram): any batch split (including a restart)
    converges to the batch arm; NULL/NaN scores are excluded on both
    arms; the bounded-grid contract raises loudly when breached."""
    src = os.path.join(tmp_dir, "qb_src")
    out = os.path.join(tmp_dir, "qb_out")
    ck = os.path.join(tmp_dir, "qb_ck")
    op = t(
        "streaming_quality_buckets",
        on=["src"],
        score_col="v",
        buckets={"head": 3, "middle": 3, "tail": 4},
    )
    # gridded scores with repeats across two groups + excluded rows
    rows = (
        [("a", i, float(i % 5)) for i in range(1, 21)]
        + [("b", i, float(i % 3)) for i in range(1, 8)]
        + [("a", 99, None), ("b", 98, float("nan"))]  # excluded both arms
    )
    batch_df = spark.createDataFrame(rows, "src STRING, id BIGINT, v DOUBLE")
    expected = sorted(
        (r["src"], r["score"], r["bucket"], r["score_count"],
         r["cum_count"], r["total_seen"])
        for r in batch_df.transform(op).collect()
    )
    # head/middle/tail all populated for group a (20 rows, 5 values of 4)
    a_tiers = {e[2] for e in expected if e[0] == "a"}
    assert a_tiers == {"head", "middle", "tail"}
    assert all(e[5] == 20 for e in expected if e[0] == "a")
    _stage_scored(spark, src, rows[:9])
    _stage_scored(spark, src, rows[9:23])
    _run_topk_stream(spark, src, out, ck, op)
    _stage_scored(spark, src, rows[23:])   # rest after a restart
    _run_topk_stream(spark, src, out, ck, op)
    got = spark.read.parquet(out).collect()
    final = []
    for g in ("a", "b"):
        grows = [r for r in got if r["src"] == g]
        latest = max(r["total_seen"] for r in grows)
        final += [
            (r["src"], r["score"], r["bucket"], r["score_count"],
             r["cum_count"], r["total_seen"])
            for r in grows
            if r["total_seen"] == latest
        ]
    assert sorted(final) == expected
    with pytest.raises(ValueError):
        t("streaming_quality_buckets", on=[], score_col="v",
          buckets={"h": 1, "t": 1})
    with pytest.raises(ValueError):
        t("streaming_quality_buckets", on=["src"], score_col="v",
          buckets={"h": 1})
    with pytest.raises(ValueError):
        t("streaming_quality_buckets", on=["src"], score_col="v",
          buckets={"h": 1, "t": 0})
    # bounded-grid breach fails the stream LOUDLY (state would grow
    # with data volume otherwise)
    tight = t(
        "streaming_quality_buckets", on=["src"], score_col="v",
        buckets={"h": 1, "t": 1}, max_distinct=2,
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="max_distinct"):
        _run_topk_stream(
            spark, src, os.path.join(tmp_dir, "qb_out2"),
            os.path.join(tmp_dir, "qb_ck2"), tight,
        )


def test_streaming_bottomk_sample_null_ids_excluded(spark, tmp_dir):
    """NULL ids are filtered on BOTH arms before priorities exist:
    md5(NULL) would otherwise rank first in the batch window, and a None
    priority is unorderable in the streaming state's sorted()."""
    import os

    rows = [("a", None), ("a", None)] + [("a", i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "src STRING, id BIGINT")
    op = t("streaming_bottomk_sample", on=["src"], id_col="id", k=3)
    out = df.transform(op).collect()
    assert all(r["id"] is not None for r in out)
    assert len(out) == 3
    assert all(r["total_seen"] == 5 for r in out)  # NULL rows not counted

    # streaming arm: must not raise (None priority in sorted()) and must
    # converge to the same NULL-free sample
    src = os.path.join(tmp_dir, "src_null")
    sink = os.path.join(tmp_dir, "out_null")
    ck = os.path.join(tmp_dir, "ck_null")
    spark.createDataFrame(rows[:4], "src STRING, id BIGINT").coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame(rows[4:], "src STRING, id BIGINT").coalesce(
        1
    ).write.mode("append").parquet(src)
    _run_bottomk_stream(spark, src, sink, ck, op)
    got = spark.read.parquet(sink).collect()
    latest = max(r["total_seen"] for r in got)
    assert latest == 5
    final = sorted(r["id"] for r in got if r["total_seen"] == latest)
    assert final == sorted(r["id"] for r in out)


def test_streaming_bottomk_batch_arm_dedups_duplicate_ids(spark):
    """Duplicate-id rows count toward total_seen but can't crowd a
    distinct id out of the sample — batch arm matches the stream's
    state dedup."""
    rows = [("a", 7), ("a", 7), ("a", 7)] + [("a", i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "src STRING, id BIGINT")
    out = df.transform(
        t("streaming_bottomk_sample", on=["src"], id_col="id", k=3)
    ).collect()
    ids = sorted(r["id"] for r in out)
    assert len(ids) == len(set(ids)) == 3       # three DISTINCT ids
    assert all(r["total_seen"] == 8 for r in out)  # raw rows counted


def test_r13_review_arm_parity_fixes(spark):
    """Regression pins for the round-13 review findings: the batch arms
    must agree with the documented streaming semantics on direction,
    NULL keys, NULL ids, and all-NULL values."""
    # (1) topk with higher_is_better=False keeps each id's MIN score
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 1, 1.0), ("a", 2, 3.0), (None, 3, 2.0)],
        "src STRING, id BIGINT, v DOUBLE",
    )
    low = df.transform(
        t("streaming_topk_score", on=["src"], id_col="id",
          score_col="v", k=2, higher_is_better=False)
    ).collect()
    a1 = [r for r in low if r["src"] == "a" and r["id"] == 1][0]
    assert a1["score"] == 1.0 and a1["rank"] == 1  # min, not max
    # (2) the NULL-key group survives the batch arm's join
    assert any(r["src"] is None for r in low)
    # (3) bottomk: NULL-key group survives too
    bk = df.transform(
        t("streaming_bottomk_sample", on=["src"], id_col="id", k=2)
    ).collect()
    assert any(r["src"] is None for r in bk)
    # (4) running totals: all-NULL group reads 0.0/False, never NULL
    rt = spark.createDataFrame(
        [("k", None), ("k", None)], "g STRING, v DOUBLE"
    ).transform(t("streaming_running_totals", on=["g"], value_col="v",
                  budget=10.0)).collect()[0]
    assert rt["batch_value"] == 0.0 and rt["budget_exceeded"] is False
    # (5) reservoir quantiles: NULL ids are excluded on the batch arm
    rq = spark.createDataFrame(
        [("g", None, 100.0)] + [("g", i, float(i)) for i in range(1, 9)],
        "g STRING, id BIGINT, v DOUBLE",
    ).transform(
        t("streaming_reservoir_quantiles", on=["g"], id_col="id",
          value_col="v", k=4)
    ).collect()[0]
    assert rq["n_seen"] == 8          # the null-id row never counted
    # (6) ewma: NULL event times are excluded on both arms
    ew = spark.createDataFrame(
        [("k", None, 100.0), ("k", 1, 1.0), ("k", 2, 2.0)],
        "g STRING, ts BIGINT, v DOUBLE",
    ).transform(
        t("streaming_ewma_anomaly", on=["g"], value_col="v", ts_col="ts")
    ).collect()
    assert len(ew) == 2 and all(r["ts"] is not None for r in ew)
    # (7) empty-on validation now uniform across the older ops
    for name, kw in (
        ("streaming_running_totals", dict(value_col="v")),
        ("streaming_ewma_anomaly", dict(value_col="v")),
        ("streaming_approx_distinct", dict(value_col="v")),
        ("streaming_reservoir_quantiles", dict(id_col="id", value_col="v")),
    ):
        with pytest.raises(ValueError, match="non-empty"):
            t(name, on=[], **kw)
    # (8) approx_distinct fast path: NULL-key group estimates normally
    ad = spark.createDataFrame(
        [(None, i) for i in range(50)] + [("x", 1)],
        "g STRING, v INT",
    ).transform(
        t("streaming_approx_distinct", on=["g"], value_col="v")
    ).collect()
    nullg = [r for r in ad if r["g"] is None][0]
    assert nullg["approx_distinct"] > 30  # not the empty-register 0


def test_streaming_quantile_prune_converges_and_restarts(spark, tmp_dir):
    """streaming_quantile_prune: the emitted keep-table is a pure
    function of the cumulative (group -> score histogram) — any batch
    split incl. a restart converges to the batch arm; the threshold
    keeps ties (count may exceed the budget, the batch op's documented
    contract); NULL/NaN excluded both arms; degenerate params raise."""
    src = os.path.join(tmp_dir, "qp_src")
    out = os.path.join(tmp_dir, "qp_out")
    ck = os.path.join(tmp_dir, "qp_ck")
    op = t(
        "streaming_quantile_prune", on=["src"], score_col="v",
        keep_frac=0.3,
    )
    rows = (
        [("a", i, float(i % 5)) for i in range(1, 21)]
        + [("b", i, float(i % 3)) for i in range(1, 8)]
        + [("a", 99, None), ("b", 98, float("nan"))]
    )
    batch_df = spark.createDataFrame(rows, "src STRING, id BIGINT, v DOUBLE")
    expected = sorted(
        (r["src"], r["score"], r["keep"], r["score_count"],
         r["cum_count"], r["total_seen"])
        for r in batch_df.transform(op).collect()
    )
    # group a: 20 rows of 5 values x4; budget=ceil(6)=6 -> keep 4.0,3.0
    # (8 rows kept: tie overflow past the budget, the documented rule)
    a_kept = {e[1] for e in expected if e[0] == "a" and e[2]}
    assert a_kept == {4.0, 3.0}
    assert all(e[5] == 20 for e in expected if e[0] == "a")
    # lower_is_better flips the kept tail
    low = batch_df.transform(
        t("streaming_quantile_prune", on=["src"], score_col="v",
          keep_frac=0.3, higher_is_better=False)
    ).collect()
    assert {r["score"] for r in low if r["src"] == "a" and r["keep"]} \
        == {0.0, 1.0}
    _stage_scored(spark, src, rows[:9])
    _stage_scored(spark, src, rows[9:23])
    _run_topk_stream(spark, src, out, ck, op)
    _stage_scored(spark, src, rows[23:])   # rest after a restart
    _run_topk_stream(spark, src, out, ck, op)
    got = spark.read.parquet(out).collect()
    final = []
    for g in ("a", "b"):
        grows = [r for r in got if r["src"] == g]
        latest = max(r["total_seen"] for r in grows)
        final += [
            (r["src"], r["score"], r["keep"], r["score_count"],
             r["cum_count"], r["total_seen"])
            for r in grows if r["total_seen"] == latest
        ]
    assert sorted(final) == expected
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            t("streaming_quantile_prune", on=["src"], score_col="v",
              keep_frac=bad)
    with pytest.raises(ValueError):
        t("streaming_quantile_prune", on=[], score_col="v", keep_frac=0.5)


def test_streaming_winsorize_converges_and_restarts(spark, tmp_dir):
    """streaming_winsorize: grid-exact empirical bounds from the
    cumulative histogram (value at rank max(1, ceil(q*N))), clip =
    least(greatest(v, lo), hi); batch/stream parity across splits and a
    restart; lower=0/upper=1 clip nothing; degenerate params raise."""
    src = os.path.join(tmp_dir, "wz_src")
    out = os.path.join(tmp_dir, "wz_out")
    ck = os.path.join(tmp_dir, "wz_ck")
    op = t(
        "streaming_winsorize", on=["src"], score_col="v",
        lower=0.1, upper=0.9,
    )
    rows = (
        [("a", i, float(i)) for i in range(1, 21)]
        + [("b", i, float(i % 3)) for i in range(1, 8)]
        + [("a", 99, None), ("b", 98, float("nan"))]
    )
    batch_df = spark.createDataFrame(rows, "src STRING, id BIGINT, v DOUBLE")
    expected = sorted(
        (r["src"], r["score"], r["clipped"], r["lo"], r["hi"],
         r["score_count"], r["cum_count"], r["total_seen"])
        for r in batch_df.transform(op).collect()
    )
    # group a: 1..20, lo = value at rank ceil(2)=2 -> 2.0, hi at rank 18
    a = [e for e in expected if e[0] == "a"]
    assert all(e[3] == 2.0 and e[4] == 18.0 for e in a)
    assert [e[2] for e in a if e[1] == 1.0] == [2.0]   # clipped up
    assert [e[2] for e in a if e[1] == 20.0] == [18.0]  # clipped down
    assert [e[2] for e in a if e[1] == 10.0] == [10.0]  # untouched
    # identity bounds clip nothing
    ident = batch_df.filter("v IS NOT NULL AND NOT isnan(v)").transform(
        t("streaming_winsorize", on=["src"], score_col="v",
          lower=0.0, upper=1.0)
    ).collect()
    assert all(r["clipped"] == r["score"] for r in ident)
    _stage_scored(spark, src, rows[:9])
    _stage_scored(spark, src, rows[9:23])
    _run_topk_stream(spark, src, out, ck, op)
    _stage_scored(spark, src, rows[23:])   # rest after a restart
    _run_topk_stream(spark, src, out, ck, op)
    got = spark.read.parquet(out).collect()
    final = []
    for g in ("a", "b"):
        grows = [r for r in got if r["src"] == g]
        latest = max(r["total_seen"] for r in grows)
        final += [
            (r["src"], r["score"], r["clipped"], r["lo"], r["hi"],
             r["score_count"], r["cum_count"], r["total_seen"])
            for r in grows if r["total_seen"] == latest
        ]
    assert sorted(final) == expected
    with pytest.raises(ValueError):
        t("streaming_winsorize", on=["src"], score_col="v",
          lower=0.9, upper=0.1)
    with pytest.raises(ValueError):
        t("streaming_winsorize", on=[], score_col="v")

"""Dataset profiling — per-column statistics in ONE aggregation pass.

Training-data pipelines gate ingestion on dataset health (null rates,
cardinality explosions, value drift). This profiler computes, for every
requested column, null counts, approximate distinct counts (HLL++ via
``approx_count_distinct`` — mergeable, constant memory), min/max, and for
numeric columns mean plus approximate quantiles (Greenwald-Khanna via
``percentile_approx`` — also one-pass).

Scale design: the whole profile is a single ``df.agg(...)`` — one map-side
combined aggregation job regardless of column count, no per-column scans
(contrast with naive ``df.describe()`` loops). Output is long-form
(one row per column) so downstream checks join on ``column``.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


@register("profile_columns")
def profile_columns(
    cols: Optional[List[str]] = None,
    quantiles: Optional[List[float]] = None,
    rsd: float = 0.05,
) -> TransformerFn:
    """Long-form profile: one output row per column with
    ``n_rows, n_nulls, null_pct, approx_distinct, min_str, max_str,
    mean, p50, ...`` (numeric-only stats NULL for non-numeric columns)."""
    qs = quantiles or [0.5]

    def _qname(q: float) -> str:
        # 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9 — the quantile_summary
        # naming rule: int(q*100) both truncated through float error
        # (0.57 -> p56) and COLLIDED for close quantiles (0.99/0.999 ->
        # two p99 columns -> createDataFrame length mismatch; r14 review)
        s = f"{q * 100:.4f}".rstrip("0").rstrip(".").replace(".", "_")
        return f"p{s}"

    def _profile(df: DataFrame) -> DataFrame:
        targets = cols or df.columns
        dtypes = dict(df.dtypes)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in targets:
            is_num = dtypes[c].startswith(_NUMERIC)
            aggs += [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}"),
                F.approx_count_distinct(c, rsd).alias(f"__dis_{c}"),
                # TYPED extrema stringified afterwards: min/max OVER
                # the string cast is lexicographic ({2,10} -> min_str
                # '10'; r14 review finding)
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
            if is_num:
                aggs.append(F.avg(F.col(c).cast("double")).alias(f"__avg_{c}"))
                aggs.append(
                    F.percentile_approx(
                        F.col(c).cast("double"), F.array(*[F.lit(q) for q in qs])
                    ).alias(f"__q_{c}")
                )
        row = df.agg(*aggs).first()
        n = row["__n"]
        out = []
        for c in targets:
            is_num = dtypes[c].startswith(_NUMERIC)
            rec = {
                "column": c,
                "dtype": dtypes[c],
                "n_rows": n,
                # sum()/approx_count_distinct over ZERO rows come back
                # NULL/None — an empty corpus must profile as all-zeros,
                # not crash on int(None)
                "n_nulls": int(row[f"__nul_{c}"] or 0),
                "null_pct": round(row[f"__nul_{c}"] / n * 100.0, 4) if n else 0.0,
                "approx_distinct": int(row[f"__dis_{c}"] or 0),
                "min_str": row[f"__min_{c}"],
                "max_str": row[f"__max_{c}"],
                "mean": float(row[f"__avg_{c}"]) if is_num and row[f"__avg_{c}"] is not None else None,
            }
            for i, q in enumerate(qs):
                rec[_qname(q)] = (
                    float(row[f"__q_{c}"][i]) if is_num and row[f"__q_{c}"] else None
                )
            out.append(rec)
        # tiny (one row per column) — driver-side materialization is
        # correct. Schema is EXPLICIT: on an empty corpus every stat is
        # None and inference would fail with CANNOT_DETERMINE_TYPE.
        qfields = ", ".join(f"{_qname(q)} DOUBLE" for q in qs)
        schema = (
            "column STRING, dtype STRING, n_rows LONG, n_nulls LONG, "
            "null_pct DOUBLE, approx_distinct LONG, min_str STRING, "
            f"max_str STRING, mean DOUBLE, {qfields}"
        )
        return df.sparkSession.createDataFrame(
            [tuple(r.values()) for r in out], schema
        )

    return _profile


@register("curation_report")
def curation_report(
    flag_cols: List[str],
    group_col: Optional[str] = None,
) -> TransformerFn:
    """Curation-funnel report: for each boolean flag column (quality gate,
    contamination flag, dedup mark…) emit ``(flag, n_rows, n_flagged,
    pct_flagged)`` — the monitoring table every corpus pipeline wants next
    to its output. With ``group_col``, one row per (group, flag).

    One map-side-combined aggregation pass computes every flag's sum at
    once; the long-form explode happens on the tiny aggregate. The pct is
    a raw double division (identical in any engine — no rounding step to
    disagree on).
    """
    if not flag_cols:
        raise ValueError("curation_report: flag_cols must be non-empty")

    def _report(df: DataFrame) -> DataFrame:
        sums = [
            F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long").alias(f"__f{i}")
            for i, c in enumerate(flag_cols)
        ]
        keys = [F.col(group_col).alias("__g")] if group_col else []
        agg = (
            df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"), *sums)
            if keys
            else df.agg(F.count(F.lit(1)).alias("__n"), *sums)
        )
        rows = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("flag"), F.col(f"__f{i}").alias("__f")
                    )
                    for i, c in enumerate(flag_cols)
                ]
            )
        ).alias("__x")
        out = agg.select(*([F.col("__g")] if group_col else []), "__n", rows)
        cols = ([F.col("__g").alias(group_col)] if group_col else []) + [
            F.col("__x.flag").alias("flag"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col("__x.__f").alias("n_flagged"),
            (F.col("__x.__f").cast("double") / F.col("__n")).alias("pct_flagged"),
        ]
        return out.select(*cols)

    return _report


@register("histogram")
def histogram(
    value_col: str,
    bins: int = 10,
    min_val: Optional[float] = None,
    max_val: Optional[float] = None,
    group_cols: Optional[List[str]] = None,
) -> TransformerFn:
    """Fixed-bin histogram of ``value_col`` (optionally per group): one row
    per non-empty bucket with ``bucket, lo, hi, n`` — the distribution
    profile for threshold/skew decisions. With explicit ``min_val``/
    ``max_val`` it is a single map-side-combined aggregation; without,
    one tiny global min/max pass runs first (collected — two scalars) and
    the bounds are folded into the same projection. Values outside the
    range clamp into the edge buckets (so streaming-ish appends beyond
    the probed range still count). NULLs are dropped. The bucket formula
    ``floor((v-min)/(max-min)*bins)`` runs identically in any engine, so
    the oracle replays it exactly.
    """
    if bins < 1:
        raise ValueError(f"histogram: bins must be >= 1, got {bins}")
    if (min_val is None) != (max_val is None):
        raise ValueError("histogram: pass both min_val and max_val or neither")

    keys = list(group_cols or [])

    def _hist(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("double")
        if min_val is not None:
            lo, hi = float(min_val), float(max_val)
        else:
            row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
            lo = float(row["lo"]) if row["lo"] is not None else 0.0
            hi = float(row["hi"]) if row["hi"] is not None else 1.0
        if not hi > lo:
            hi = lo + 1.0
        width = (hi - lo) / bins
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(hi - lo) * bins)),
        ).cast("long")
        return (
            df.filter(v.isNotNull())
            .groupBy(*keys, bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(
                *keys,
                "bucket",
                (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
                (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
                "n",
            )
        )

    return _hist


@register("profile_skew")
def profile_skew(
    key_cols: List[str],
    top_k: int = 20,
) -> TransformerFn:
    """Key-skew diagnostics for shuffle planning: per distinct key the row
    count and its share of the table, plus the running cumulative share —
    the table you read before deciding whether a join/aggregate on these
    keys needs salting (``salted_join`` / ``salt_partitions``), a
    broadcast, or nothing. Emits the ``top_k`` heaviest keys ordered by
    count (deterministic tie-break on the key).

    One map-side-combined groupBy over the keys, then a TakeOrdered top-k
    (per-partition top-k merged on the driver — no global sort of the
    distinct-key table) and a single tiny window over the k survivors.
    The total row count rides the same aggregate via a grand-total sum
    over the k-row frame's broadcast stats attach.
    """
    if not key_cols:
        raise ValueError("profile_skew: key_cols must be non-empty")
    if top_k < 1:
        raise ValueError("profile_skew: top_k must be >= 1")

    def _skew(df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        counts = df.groupBy(*key_cols).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        totals = counts.agg(
            F.sum("n_rows").alias("__total"),
            F.count(F.lit(1)).alias("__n_keys"),
        )
        top = (
            counts.orderBy(
                F.desc("n_rows"), *[F.asc(c) for c in key_cols]
            )
            .limit(top_k)
            .crossJoin(F.broadcast(totals))
        )
        w = Window.orderBy(F.desc("n_rows"), *[F.asc(c) for c in key_cols])
        return top.select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.sum("n_rows").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("__total"),
                6,
            ).alias("cum_share"),
            F.col("__total").alias("total_rows"),
            F.col("__n_keys").alias("n_distinct_keys"),
        )

    return _skew

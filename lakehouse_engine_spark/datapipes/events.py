"""Event/behavior analytics: ordered-stage funnels and cohort retention.

The product-analytics pair every event lakehouse ends up hand-rolling in
SQL. Both are expressed as compositions of built-in DataFrame ops so
Catalyst keeps them in whole-stage codegen, and both are ANSI-SQL
replayable for the correctness oracle.

Scale design:

* ``funnel`` — per-key ordered stage-reach times as k chained
  whole-partition window minima over ONE hash partitioning: stage i's
  time is ``min(ts where stage_i AND ts >= stage_{i-1} time)``. Catalyst
  stacks the Window operators on a single exchange of the key; no
  self-joins, no per-stage shuffles. (A k-way join formulation shuffles
  k times; a collect-sort-fold UDF buffers whole users in Python —
  both strictly worse.)
* ``cohort_retention`` — first-seen bucket per key (one map-side-combined
  agg), equi-join back on the key (co-partitioned with the distinct that
  follows — AQE coalesces the exchanges), then one count-distinct agg.
  All shuffles are on the entity key; skew handling is the generic
  groupBy story.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]


@register("funnel")
def funnel(
    on: List[str],
    stage_col: str,
    stages: List[str],
    ts_col: str = "ts",
) -> TransformerFn:
    """Ordered conversion funnel: for each key, the earliest time each
    stage was reached AFTER the previous stage (``>=``, so a same-instant
    next stage counts). Output: one row per key with
    ``stage1_ts..stageK_ts`` (NULL once the chain breaks) — feed it to an
    aggregation for conversion rates, or keep per-key for path debugging.
    """
    if not stages:
        raise ValueError("funnel: stages must be non-empty")

    def _funnel(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*on)
        out = df
        prev: Optional[str] = None
        names = []
        for i, s in enumerate(stages):
            cond = F.col(stage_col) == s
            if prev is not None:
                # NULL prev => condition NULL => when() skips: chain breaks
                cond = cond & (F.col(ts_col) >= F.col(prev))
            name = f"stage{i + 1}_ts"
            out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
            prev = name
            names.append(name)
        return out.select(*on, *names).distinct()

    return _funnel


@register("cohort_retention")
def cohort_retention(
    on: List[str],
    ts_col: str = "ts",
    bucket: str = "week",
) -> TransformerFn:
    """Cohort retention: keys bucketed by first-seen period, counted in
    every period they return. Output: ``(cohort, period_offset,
    n_active)`` with offset in WHOLE BUCKETS (0 = the cohort's first
    period). ``bucket``: day, week, month, quarter, or year — each unit
    gets its own offset arithmetic (the old code measured every
    non-day/week unit in MONTHS, so quarter cohorts got offsets 0,3,6…
    and year cohorts 0,12,24…; sub-day units are rejected because the
    period grid is a DATE; r14 review finding).
    """
    if bucket not in ("day", "week", "month", "quarter", "year"):
        raise ValueError(
            f"cohort_retention: bucket must be day|week|month|quarter|"
            f"year, got {bucket!r} (sub-day units would collapse on the "
            "date grid)"
        )
    days = {"day": 1, "week": 7}.get(bucket)

    def _cohort(df: DataFrame) -> DataFrame:
        key_bucket = F.date_trunc(bucket, F.col(ts_col)).cast("date")
        first = df.groupBy(*on).agg(F.min(key_bucket).alias("cohort"))
        active = df.select(*on, key_bucket.alias("period")).distinct()
        joined = active.join(first, on=on)
        if days is not None:
            offset = (F.datediff("period", "cohort") / days).cast("long")
        elif bucket == "quarter":
            offset = (F.months_between("period", "cohort") / 3).cast("long")
        elif bucket == "year":
            offset = (F.months_between("period", "cohort") / 12).cast("long")
        else:  # month cohorts: calendar months, not fixed-width days
            offset = F.months_between("period", "cohort").cast("long")
        return (
            joined.withColumn("period_offset", offset)
            .groupBy("cohort", "period_offset")
            .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        )

    return _cohort


@register("pivot_agg")
def pivot_agg(
    on: List[str],
    pivot_col: str,
    values: List[str],
    aggs: Dict[str, str],
) -> TransformerFn:
    """Long→wide pivot with EXPLICIT pivot values: one output row per key,
    one ``<value>_<alias>`` column per (pivot value × aggregate) — the
    feature-widening step that turns an event log into a per-entity
    feature vector. ``aggs`` maps alias → SQL aggregate expression
    (e.g. ``{"n": "count(1)", "rev": "sum(value)"}``).

    Requiring ``values`` up front is the 100 TB design: Spark's
    ``pivot(col)`` without values runs a driver-side DISTINCT job over the
    whole corpus just to learn the column set (and caps it at
    ``spark.sql.pivotMaxValues``). With the list given there is no
    discovery scan or collect: the plan is two map-side-combined hash
    aggregations — ``(key, pivot)`` cells first, then ``pivotfirst`` on
    the key — and the first combine shrinks each partition to its distinct
    cell count before anything shuffles. Empty count cells surface as NULL
    (SQL conditional-aggregate semantics; ``coalesce`` downstream if 0 is
    wanted).
    """
    if not values:
        raise ValueError("pivot_agg: values must be non-empty (explicit "
                         "pivot values keep the plan single-pass)")
    if not aggs:
        raise ValueError("pivot_agg: aggs must be non-empty")

    def _pivot(df: DataFrame) -> DataFrame:
        grouped = df.groupBy(*on).pivot(pivot_col, values)
        out = grouped.agg(
            *[F.expr(expr).alias(alias) for alias, expr in aggs.items()]
        )
        # Spark drops the agg alias when there is exactly one aggregate
        # (columns named just `<value>`); normalize to `<value>_<alias>`
        # so the output schema doesn't depend on len(aggs).
        if len(aggs) == 1:
            alias = next(iter(aggs))
            for v in values:
                out = out.withColumnRenamed(str(v), f"{v}_{alias}")
        return out

    return _pivot


@register("event_transitions")
def event_transitions(
    on: List[str],
    event_col: str,
    ts_col: str = "ts",
    normalize: bool = False,
) -> TransformerFn:
    """First-order transition matrix over per-key event sequences: counts
    of ``from_event → to_event`` across consecutive events of each key —
    the Markov-chain features behind next-action models and bot/anomaly
    heuristics. ``normalize=True`` adds ``p``, each row's share of its
    ``from_event`` group (transition probability).

    One lag() over the key window (single hash exchange) then a map-side-
    combined pair count — no self-join of the event log against itself
    shifted, which shuffles twice and breaks on duplicate timestamps.
    Rows must be unique per (key, ts): pre-aggregate ties (the lag order
    would otherwise be nondeterministic).
    """
    if not on:
        raise ValueError("event_transitions: on must be non-empty")

    def _trans(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*on).orderBy(ts_col)
        pairs = (
            df.withColumn("__prev", F.lag(event_col).over(w))
            .filter(F.col("__prev").isNotNull())
            .groupBy(
                F.col("__prev").alias("from_event"),
                F.col(event_col).alias("to_event"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        if not normalize:
            return pairs
        tot = Window.partitionBy("from_event")
        return pairs.withColumn(
            "p", F.col("n") / F.sum("n").over(tot)
        )

    return _trans


def _validate_pattern_args(on: List[str], symbols: Dict[str, str],
                           default_symbol: Optional[str]) -> None:
    """Shared arg checks for the batch and streaming pattern matchers."""
    if not on:
        raise ValueError("event pattern: 'on' keys must be non-empty")
    if not symbols:
        raise ValueError("event pattern: symbols must be non-empty")
    bad = {k: v for k, v in symbols.items() if len(v) != 1}
    if bad:
        raise ValueError(f"event pattern: symbols must be single chars: {bad}")
    if default_symbol is not None and len(default_symbol) != 1:
        raise ValueError("event pattern: default_symbol must be a single char")


def _validate_pattern_regex(pattern: str) -> None:
    """Reject patterns that can match the EMPTY string: regexp_count
    counts a zero-width match at every position (pattern 'c*' on a
    c-less sequence counts len+1 "matches") while first_match's empty
    extract reads as no-match — inconsistent columns downstream filters
    trip over (r14 review finding). Python re, Java regex, and RE2 agree
    on empty-matchability for the supported syntax."""
    import re as _re

    try:
        rx = _re.compile(pattern)
    except _re.error as e:
        raise ValueError(f"event pattern: invalid regex {pattern!r}: {e}")
    if rx.match(""):
        raise ValueError(
            f"event pattern: {pattern!r} can match the empty string — "
            "zero-width matches make n_matches and first_match "
            "inconsistent; require at least one symbol (e.g. 'c+' not "
            "'c*')"
        )


def map_symbols(stage_col: str, symbols: Dict[str, str],
                default_symbol: Optional[str]):
    """NULL-safe symbol mapping column: NULL stage is ALWAYS dropped
    (NULL is not an 'unmapped type'); unmapped non-NULL types take
    default_symbol or drop."""
    sym = None
    for k, v in symbols.items():
        cond = F.col(stage_col) == k
        sym = F.when(cond, F.lit(v)) if sym is None else sym.when(cond, F.lit(v))
    return F.when(F.col(stage_col).isNull(), F.lit(None)).otherwise(
        sym.otherwise(F.lit(default_symbol))
    )


@register("event_pattern_match")
def event_pattern_match(
    on: List[str],
    symbols: Dict[str, str],
    pattern: str,
    stage_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: Optional[str] = None,
    default_symbol: Optional[str] = None,
) -> TransformerFn:
    """MATCH_RECOGNIZE-lite: regex pattern detection over each key's
    time-ordered event-type sequence — the sequence-analytics operator SQL
    engines expose as ``MATCH_RECOGNIZE`` (abandoned-cart ``vc*$``,
    conversion ``vc*p``, error-retry loops ``(ef)+``), done the
    lakehouse way: map each event type to a single-character symbol,
    fold each key's ordered events into one symbol string, then run an
    ordinary regex over it. Output: one row per key with ``seq`` (the
    symbol string), ``n_matches`` (non-overlapping, leftmost-first — the
    shared Java/RE2 semantics), and ``first_match`` (NULL when none).

    ``symbols`` maps event types to single characters; unmapped types
    take ``default_symbol`` or (None, the default) are dropped from the
    sequence. Events with NULL ``ts_col`` are excluded. Pass a unique
    ``tiebreak_col`` (an event id) so same-timestamp orderings — and
    therefore the matched sequences — are deterministic.

    Scale design: ONE shuffle on the key; the fold is
    ``array_sort(collect_list(struct(ts, tiebreak, sym)))`` — per-key
    state is that key's event count, the same bound as any per-entity
    sequence operator (sessionize first and key on ``(user, session)``
    when single keys can exceed executor memory). The regex runs
    codegen'd on the folded string, once per key, not per event. No
    window over the raw events, no self-join, no Python.
    """
    _validate_pattern_args(on, symbols, default_symbol)
    _validate_pattern_regex(pattern)

    def _match(df: DataFrame) -> DataFrame:
        sym = map_symbols(stage_col, symbols, default_symbol)
        order = [F.col(ts_col)]
        if tiebreak_col:
            order.append(F.col(tiebreak_col))
        d = (
            df.withColumn("__sym", sym)
            .filter(F.col("__sym").isNotNull() & F.col(ts_col).isNotNull())
            .select(*on, F.struct(*order, F.col("__sym")).alias("__e"))
        )
        seq = F.concat_ws(
            "",
            F.transform(F.array_sort(F.collect_list("__e")), lambda x: x["__sym"]),
        )
        agg = d.groupBy(*on).agg(seq.alias("seq"))
        first = F.regexp_extract(F.col("seq"), pattern, 0)
        return agg.select(
            *on,
            "seq",
            F.regexp_count(F.col("seq"), F.lit(pattern)).cast("int").alias("n_matches"),
            F.when(first != "", first).alias("first_match"),
        )

    return _match

"""Data-layout operators: multi-dimensional clustering keys.

The reference reaches Z-ordering only through Delta's ``OPTIMIZE ... ZORDER
BY`` (terminators/terminator_factory.py `optimize_dataset`, mirroring
/root/reference/lakehouse_engine/terminators/dataset_optimizer.py) — an
opaque table-service call that needs delta-spark. This module implements the
clustering key itself, engine-side and format-agnostic: compute an
interleaved-bit Z-value from N columns, then ``repartitionByRange`` +
``sortWithinPartitions`` on it, so any parquet/delta write that follows lays
files out along the space-filling curve. At 100 TB that layout is what makes
multi-dimensional min/max file skipping work: a predicate on ANY of the
key's columns prunes most files, not just a predicate on the leading sort
column.

Everything is whole-stage-codegen column arithmetic (one min/max aggregation
pass + a projection + one range exchange) and every step is deterministic
and portable to ANSI SQL, so the driver's DuckDB oracle replays keys
bit-for-bit.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from lakehouse_engine_spark.datapipes.registry import register
from lakehouse_engine_spark.utils.timeutils import epoch_us

TransformerFn = Callable[[DataFrame], DataFrame]

_INTEGRALS = (ByteType, ShortType, IntegerType, LongType, BooleanType)
_TEMPORALS = (DateType, TimestampType, TimestampNTZType)
_FLOATS = (FloatType, DoubleType)


def _dimension_key(df: DataFrame, col: str) -> tuple[Column, bool]:
    """Map a column to an order-preserving sortable key.

    Returns ``(key_column, is_exact_integer)``. Integral/temporal/boolean
    columns map to exact BIGINTs; float/double/decimal stay continuous
    (bucketed by IEEE-deterministic double arithmetic); strings map to their
    first 7 UTF-8 bytes big-endian (56 bits — byte-lexicographic, which is
    Spark's and DuckDB's binary string order; shorter strings sort as if
    zero-padded, preserving prefix order).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, _INTEGRALS):
        return F.col(col).cast("long"), True
    if isinstance(dt, _TEMPORALS):
        return epoch_us(df, col), True
    if isinstance(dt, _FLOATS) or isinstance(dt, DecimalType):
        return F.col(col).cast("double"), False
    if isinstance(dt, StringType):
        # first 7 UTF-8 bytes, RIGHT-padded to 14 hex digits so shorter
        # strings compare as if zero-padded on the right (byte-lexicographic
        # order preserved); NULL propagates → bucket 0 downstream
        return (
            F.conv(
                F.rpad(F.hex(F.substring(F.col(col), 1, 7)), 14, "0"), 16, 10
            ).cast("long"),
            True,
        )
    raise ValueError(
        f"layout_zorder: unsupported dimension type {dt.simpleString()} for {col}"
    )


def _minmax_bucket_exprs(
    keys: List[tuple], cols: List[str], bits_per_col: int
) -> List[Column]:
    """Per-dimension minmax bucket expressions (the layout_zorder
    quantization rules, shared verbatim by layout_hilbert): exact-integer
    dims use overflow-safe scale-up/scale-down SQL `div`; float dims use
    the IEEE-exact power-of-two-scaled division; NULL -> bucket 0.
    Assumes ``__k_{c}``/``__min_{c}``/``__max_{c}`` columns exist.

    Bound: an exact-integer dimension whose VALUE RANGE exceeds ~2^62
    (e.g. raw xxhash64 output spanning the full int64 line) overflows
    ``__max - __min + 1``; under this engine's ANSI mode that fails
    LOUDLY with ARITHMETIC_OVERFLOW rather than interleaving garbage —
    pre-bucket such columns (e.g. ``pmod(hash, 2^32)``) before
    layouting on them (r14 review note)."""
    buckets: List[Column] = []
    scale = 1 << bits_per_col
    top = scale - 1
    for (_, exact), c in zip(keys, cols):
        if exact:
            b = F.expr(
                f"CASE WHEN (__max_{c} - __min_{c} + 1) <= 2147483648L "
                f"THEN ((__k_{c} - __min_{c}) * {scale}L) "
                f"div (__max_{c} - __min_{c} + 1) "
                f"ELSE (__k_{c} - __min_{c}) div "
                f"(((__max_{c} - __min_{c} + 1) + {scale - 1}L) div {scale}L) "
                f"END"
            )
        else:
            lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
            divisor = (hi - lo) / F.lit(float(scale))
            k = F.col(f"__k_{c}")
            b = (
                F.when(k.isNull() | ~(divisor > 0), F.lit(0))
                .otherwise(F.least(F.floor((k - lo) / divisor), F.lit(top)))
                .cast("long")
            )
        buckets.append(F.coalesce(b, F.lit(0).cast("long")))
    return buckets


@register("layout_hilbert")
def hilbert(
    cols: List[str],
    bits_per_col: int = 8,
    output_col: str = "hilbert_key",
    num_partitions: Optional[int] = None,
    sort: bool = True,
    keep_key: bool = True,
) -> TransformerFn:
    """Hilbert-curve clustering key + range layout over exactly TWO
    columns — the locality-tighter sibling of ``layout_zorder`` (modern
    table services moved from Z-order to Hilbert for exactly this:
    Morton interleaving has unbounded "seams" where consecutive keys
    jump across the space, while every step along the Hilbert curve is
    grid-adjacent, so per-file min/max boxes come out tighter and
    multi-dimensional file skipping prunes more; see the dp127 probe
    for the measured span comparison).

    Dimensions quantize to ``bits_per_col``-bit buckets with the SAME
    rules as ``layout_zorder`` (shared helper — exact-integer `div`
    arithmetic, IEEE-exact float bucketing, NULL -> 0), then the bucket
    pair maps to its distance along the order-``bits_per_col`` Hilbert
    curve via the classic xy2d bit recursion (quadrant digit + rotate /
    reflect; Wikipedia's public-domain formulation), unrolled one level
    per bit as materialized columns. All integer CASE arithmetic — the
    oracle replays it as a chain of per-level CTEs, bit for bit.

    ``bits_per_col`` is capped at 12: the per-level rotate references
    both previous-level coordinates, so Catalyst's projection collapse
    can inline the recursion into an O(2^bits) tree — 12 bits (a
    16.7M-cell grid, far finer than any file layout needs) keeps the
    plan small; beyond that use ``layout_zorder``, whose key is one
    flat expression at any width. For skew-equalized bucketing compose
    with ``layout_zorder(method='rank')``'s CDF idea by pre-ranking the
    dimension upstream.
    """
    if len(cols) != 2:
        raise ValueError(
            f"layout_hilbert: exactly 2 cols required (got {len(cols)}); "
            "the 2-D curve is the file-layout case — for more dimensions "
            "use layout_zorder"
        )
    if not 1 <= bits_per_col <= 12:
        raise ValueError(
            f"layout_hilbert: bits_per_col must be in [1, 12], got "
            f"{bits_per_col} (the unrolled rotate recursion grows the plan "
            "past 12 bits; use layout_zorder for finer grids)"
        )

    def _hilbert(df: DataFrame) -> DataFrame:
        from lakehouse_engine_spark.datapipes.parallel import ensure_parallelism

        keys = [_dimension_key(df, c) for c in cols]
        keyed = ensure_parallelism(df).withColumns(
            {f"__k_{c}": k for (k, _), c in zip(keys, cols)}
        )
        stats = keyed.agg(
            *[
                agg
                for c in cols
                for agg in (
                    F.min(f"__k_{c}").alias(f"__min_{c}"),
                    F.max(f"__k_{c}").alias(f"__max_{c}"),
                )
            ]
        )
        out = keyed.crossJoin(F.broadcast(stats))
        bx, by = _minmax_bucket_exprs(keys, cols, bits_per_col)
        out = out.withColumns(
            {"__hx": bx, "__hy": by, "__hd": F.lit(0).cast("long")}
        )
        # per-level expressions as SQL strings (colbuild rationale): the
        # Column-chain form made ~25 py4j round-trips per bit level for
        # identical operator trees; levels still materialize one
        # withColumns projection each, so no textual recursion blowup
        n_full = (1 << bits_per_col) - 1
        for i in range(bits_per_col - 1, -1, -1):
            s = 1 << i
            rx = f"(shiftright(__hx, {i}) & cast(1 as bigint))"
            ry = f"(shiftright(__hy, {i}) & cast(1 as bigint))"
            new_d = (
                f"__hd + cast({s * s} as bigint)"
                f" * ((cast(3 as bigint) * {rx}) ^ {ry})"
            )
            refl_x = (
                f"CASE WHEN {rx} = cast(1 as bigint)"
                f" THEN cast({n_full} as bigint) - __hx ELSE __hx END"
            )
            refl_y = (
                f"CASE WHEN {rx} = cast(1 as bigint)"
                f" THEN cast({n_full} as bigint) - __hy ELSE __hy END"
            )
            # rot: when ry == 0, (optionally reflect by rx) then swap x/y
            new_x = (
                f"CASE WHEN {ry} = cast(0 as bigint)"
                f" THEN {refl_y} ELSE __hx END"
            )
            new_y = (
                f"CASE WHEN {ry} = cast(0 as bigint)"
                f" THEN {refl_x} ELSE __hy END"
            )
            out = out.withColumns(
                {
                    "__hx": F.expr(new_x),
                    "__hy": F.expr(new_y),
                    "__hd": F.expr(new_d),
                }
            )
        out = out.withColumn(output_col, F.col("__hd")).drop(
            "__hx",
            "__hy",
            "__hd",
            *[f"__k_{c}" for c in cols],
            *[n for c in cols for n in (f"__min_{c}", f"__max_{c}")],
        )
        if num_partitions:
            out = out.repartitionByRange(num_partitions, F.col(output_col))
        if sort:
            out = out.sortWithinPartitions(output_col)
        if not keep_key:
            out = out.drop(output_col)
        return out

    return _hilbert


@register("layout_zorder")
def zorder(
    cols: List[str],
    bits_per_col: int = 16,
    output_col: str = "zorder_key",
    num_partitions: Optional[int] = None,
    sort: bool = True,
    keep_key: bool = True,
    method: str = "minmax",  # minmax | rank
    rank_max_distinct: int = 2_000_000,
) -> TransformerFn:
    """Z-order (Morton) clustering key + range layout over ``cols``.

    Per dimension: one global min/max pass (a single broadcast stats row —
    the established 1-row crossJoin pattern), then each value quantizes to a
    ``bits_per_col``-bit bucket:

    * exact-integer dimensions (ints, dates/timestamps as epoch, bools,
      string 7-byte prefixes) use pure integer arithmetic — scale-up
      ``((v-min)*2^bits) div range`` for ranges ≤ 2^31 (overflow-safe),
      scale-down ``(v-min) div ceil(range/2^bits)`` for wider — so every
      dimension fills its full bit budget (a narrow dimension left
      unscaled would surrender the curve to the widest one) and the same
      key is computed by any engine, no float rounding anywhere;
    * float dimensions use ``floor((v - min) / ((max - min)/2^bits))``
      clamped to the top bucket; the divisor is a power-of-two scaling of
      ``max - min`` so the division is IEEE-exact and portable.

    NULL values take bucket 0 (sort first, like NULLS FIRST). Buckets then
    interleave bit-by-bit into one BIGINT (dimension c contributes bit j to
    position ``j*ncols + c``) — ``len(cols) * bits_per_col`` must stay ≤ 62
    so the key never touches the sign bit.

    With ``num_partitions`` the frame is ``repartitionByRange`` on the key
    (Spark samples the key to build balanced range bounds — the write-side
    layout step) and ``sort=True`` adds ``sortWithinPartitions``, yielding
    files whose per-column min/max ranges are tight on EVERY key dimension.

    ``method="rank"`` replaces min/max scaling with an exact distinct-value
    CDF per dimension — ``bucket(v) = (rows_before(v) * 2^bits) div N`` —
    so buckets equalize ROW MASS, not value range. That is what a skewed
    dimension needs (under a power law, min/max scaling parks most rows in
    a handful of buckets and the dimension's upper bits go constant; Delta's
    own ZORDER uses range-partition ids for the same reason). Cost: per
    dimension one distinct-value aggregate, one cumulative window over the
    DISTINCT values (single-partition — bounded by ``rank_max_distinct``,
    enforced by an in-row fail-fast inside the window itself, costing no
    extra pass; beyond the cap use ``minmax``, whose cost is flat), and
    one broadcast join back. Equal values share a bucket, so the key
    stays deterministic and the oracle replays it exactly.
    """
    if method not in ("minmax", "rank"):
        raise ValueError(f"layout_zorder: unknown method {method!r}")
    if not cols:
        raise ValueError("layout_zorder: cols must be non-empty")
    if bits_per_col < 1:
        # bits_per_col=0 passed the <= 62 check and produced a
        # constant-zero key: repartitionByRange on a constant collapses
        # the whole write into one unsorted blob with no error (r14
        # review finding; layout_hilbert already validates)
        raise ValueError(
            f"layout_zorder: bits_per_col must be >= 1, got {bits_per_col}"
        )
    nbits = len(cols) * bits_per_col
    if nbits > 62:
        raise ValueError(
            f"layout_zorder: {len(cols)} cols × {bits_per_col} bits = {nbits} "
            "interleaved bits; must be ≤ 62 — lower bits_per_col"
        )

    def _interleave_and_layout(
        out: DataFrame, buckets: List[Column], extra_drop: tuple = ()
    ) -> DataFrame:
        z = F.lit(0).cast("long")
        for j in range(bits_per_col):
            for ci, b in enumerate(buckets):
                z = z + F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1).cast("long")),
                    j * len(buckets) + ci,
                )
        # drop every helper column BEFORE the range exchange so the shuffle
        # carries only real data + the key
        out = out.withColumn(output_col, z).drop(
            *[f"__k_{c}" for c in cols], *extra_drop
        )
        if num_partitions:
            out = out.repartitionByRange(num_partitions, F.col(output_col))
        if sort:
            out = out.sortWithinPartitions(output_col)
        if not keep_key:
            out = out.drop(output_col)
        return out

    def _zorder_rank(keyed: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        scale = 1 << bits_per_col
        out = keyed
        for c in cols:
            kc = f"__k_{c}"
            vals = (
                keyed.where(F.col(kc).isNotNull())
                .groupBy(kc)
                .agg(F.count(F.lit(1)).alias("__n"))
            )
            w = Window.orderBy(kc)
            # cardinality guard rides the CDF window itself (in-row
            # raise_error past the cap — the gap_fill fail-fast pattern)
            # instead of a separate count_distinct pass over the data
            cdf = vals.select(
                F.col(kc),
                F.when(
                    F.row_number().over(w) > rank_max_distinct,
                    F.expr(
                        "raise_error(concat("
                        f"'layout_zorder: dimension {c} exceeds "
                        f"rank_max_distinct={rank_max_distinct} distinct "
                        "values; the rank CDF window would not fit one "
                        "task — use method=minmax for this cardinality'))"
                    ).cast("long"),
                )
                .otherwise(
                    F.coalesce(
                        F.sum("__n").over(
                            w.rowsBetween(Window.unboundedPreceding, -1)
                        ),
                        F.lit(0).cast("long"),
                    )
                )
                .alias("__cb"),
                F.sum("__n")
                .over(
                    w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
                )
                .alias("__N"),
            ).select(
                F.col(kc),
                F.expr(f"(__cb * {scale}L) div __N").alias(f"__b_{c}"),
            )
            out = out.join(F.broadcast(cdf), on=kc, how="left")
        buckets = [
            F.coalesce(F.col(f"__b_{c}"), F.lit(0).cast("long")) for c in cols
        ]
        return _interleave_and_layout(
            out, buckets, extra_drop=tuple(f"__b_{c}" for c in cols)
        )

    def _zorder(df: DataFrame) -> DataFrame:
        from lakehouse_engine_spark.datapipes.parallel import ensure_parallelism

        keys = [_dimension_key(df, c) for c in cols]
        # materialize per-dimension sortable keys under stable names so the
        # exact-integer bucket arithmetic can use SQL `div` (the Column
        # API's `/` is double division — a precision leak for wide ranges)
        keyed = ensure_parallelism(df).withColumns(
            {f"__k_{c}": k for (k, _), c in zip(keys, cols)}
        )

        if method == "rank":
            return _zorder_rank(keyed)

        stats = keyed.agg(
            *[
                agg
                for c in cols
                for agg in (
                    F.min(f"__k_{c}").alias(f"__min_{c}"),
                    F.max(f"__k_{c}").alias(f"__max_{c}"),
                )
            ]
        )
        out = keyed.crossJoin(F.broadcast(stats))

        # Two exact-integer regimes inside the shared helper, both filling
        # the full bucket range — a NARROW dimension must still use all its
        # bits or the interleaved curve degenerates to a sort on the widest
        # dimension (the classic z-order pitfall):
        #   range1 ≤ 2^31: scale UP — ((k-lo)*2^bits) div range1
        #     (product < 2^47, overflow-safe; max bucket = 2^bits-1)
        #   wider: scale DOWN — (k-lo) div ceil(range1/2^bits)
        # Floats: IEEE-exact power-of-two-scaled division; NULLs explicit
        # (F.least SKIPS nulls — a bare least(NULL, top) would put missing
        # values in the TOP bucket).
        buckets = _minmax_bucket_exprs(keys, cols, bits_per_col)

        return _interleave_and_layout(
            out,
            buckets,
            extra_drop=tuple(
                n for c in cols for n in (f"__min_{c}", f"__max_{c}")
            ),
        )

    return _zorder

"""Embedding-column vector operators: L2 normalization and int8
quantization — the storage/serving prep steps of an embedding pipeline
(normalize before cosine ANN so dot == cosine; quantize 4× for the
vector store).

Both are pure row-space projections over ``array<float>`` built from
higher-order functions (``aggregate`` / ``transform``) — zero shuffle,
whole-stage codegen, no Python. Numeric determinism: every fold runs in
array-index order on IEEE doubles, so Spark and the DuckDB oracle
(``list_reduce`` folds in the same order) produce bit-identical results;
quantization uses ``floor(x + 0.5)`` (not engine-specific rounding) so
the int codes match exactly cross-engine.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]


def l2_norm(col: Column) -> Column:
    """sqrt of the index-order fold of squared components (exact-order fp)."""
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )


@register("embedding_normalize")
def embedding_normalize(
    input_col: str = "embedding",
    output_col: str = "embedding_unit",
    norm_col: str = "l2_norm",
    min_norm: float = 1e-12,
) -> TransformerFn:
    """Unit-normalize embeddings: ``v / ||v||₂`` (components as double),
    emitting the norm alongside. Zero-norm vectors (``||v|| < min_norm``)
    pass through as all-zero rather than NaN — degenerate embeddings are a
    data-quality signal to filter on ``norm_col``, not a crash.

    After this, cosine similarity is a plain dot product, which is what the
    ANN operators (``knn_*``, ``dedup_embedding_cosine``) exploit.
    """

    def _norm(df: DataFrame) -> DataFrame:
        c = F.col(input_col)
        n = l2_norm(c)
        unit = F.when(
            n >= min_norm,
            F.transform(c, lambda x: x.cast("double") / n),
        ).otherwise(F.transform(c, lambda x: F.lit(0.0)))
        return df.withColumns({norm_col: n, output_col: unit})

    return _norm


@register("embedding_quantize_int8")
def embedding_quantize_int8(
    input_col: str = "embedding",
    output_col: str = "embedding_q8",
    scale_col: str = "q8_scale",
) -> TransformerFn:
    """Symmetric per-vector int8 quantization: ``q_i = floor(v_i·127/amax
    + 0.5)`` with ``amax = max |v_i|``, codes in [-127, 127], plus the
    dequant scale ``amax/127``. 4× smaller than float32 at ~0.3% cosine
    error for typical embedding distributions; the per-VECTOR scale (vs
    per-tensor) keeps outlier vectors from crushing everyone's resolution.

    All-zero vectors quantize to all-zero codes with scale 0. ``floor(x +
    0.5)`` is used instead of engine ``round`` so negative half-way codes
    resolve identically in Spark and the DuckDB oracle.
    """

    def _quant(df: DataFrame) -> DataFrame:
        c = F.col(input_col)
        amax = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
        q = F.when(
            amax > 0.0,
            F.transform(
                c,
                lambda x: F.floor(x.cast("double") * 127.0 / amax + 0.5).cast("int"),
            ),
        ).otherwise(F.transform(c, lambda x: F.lit(0)))
        return df.withColumns(
            {
                output_col: q,
                scale_col: F.when(amax > 0.0, amax / 127.0).otherwise(F.lit(0.0)),
            }
        )

    return _quant


@register("embedding_mean_pool")
def embedding_mean_pool(
    group_col: str = "label",
    input_col: str = "embedding",
    output_col: str = "embedding_mean",
    scale: int = 1_000_000,
) -> TransformerFn:
    """Mean-pool embeddings per group — chunk→document pooling, per-class
    centroids, per-domain "topic vectors". Returns one row per group:
    ``group_col``, ``n_vectors``, the pooled ``output_col`` array, and
    ``pool_sums`` (the exact scaled integer sums the mean derives from).

    Numeric design: float sums over rows are accumulation-order-dependent
    (shuffle partitioning changes the result run to run), so components
    snap to a 1/``scale`` grid as BIGINTs — ``floor(v·scale + 0.5)`` — and
    sum EXACTLY; the mean is one double division per component. Identical
    output for any partitioning, and bit-reproducible by the SQL oracle.

    Scale design: posexplode → ONE map-side-combined groupBy on
    (group, component) — shuffled volume is groups × dim, not rows × dim,
    after partial aggregation — then a groups-keyed rebuild of the array
    via sorted collect_list (bounded: dim entries per group).
    """

    def _pool(df: DataFrame) -> DataFrame:
        comp = (
            df.select(
                F.col(group_col).alias("__g"),
                F.posexplode(F.col(input_col)).alias("__p", "__v"),
            )
            .withColumn(
                "__ci",
                F.floor(F.col("__v").cast("double") * scale + 0.5).cast("long"),
            )
            .groupBy("__g", "__p")
            .agg(F.sum("__ci").alias("__s"), F.count(F.lit(1)).alias("__n"))
        )
        pooled = (
            comp.groupBy("__g")
            .agg(
                F.max("__n").alias("n_vectors"),
                F.array_sort(F.collect_list(F.struct("__p", "__s"))).alias("__ps"),
            )
            .select(
                F.col("__g").alias(group_col),
                F.col("n_vectors").cast("long").alias("n_vectors"),
                F.transform("__ps", lambda x: x["__s"]).alias("pool_sums"),
                F.transform(
                    "__ps",
                    lambda x: x["__s"].cast("double") / F.col("n_vectors") / scale,
                ).alias(output_col),
            )
        )
        return pooled

    return _pool


@register("embedding_random_projection")
def embedding_random_projection(
    out_dim: int,
    input_col: str = "embedding",
    output_col: str = "embedding_rp",
    seed: str = "rp",
) -> TransformerFn:
    """Johnson-Lindenstrauss random projection: map ``array<float>``
    vectors to ``out_dim`` dimensions with a seeded Rademacher (±1)
    matrix, scaled by 1/sqrt(out_dim) — pairwise distances are preserved
    within (1±ε) w.h.p., so ANN/LSH/dedup downstream run on vectors 4–8×
    smaller. The standard cheap pre-step before brute/LSH search when the
    raw embedding dimension is large.

    Determinism: the ±1 weights derive from md5 of ``seed:i:j`` on the
    DRIVER (a k×d literal — at most a few thousand ints), and each output
    component is an UNROLLED index-order sum of ±x[j] — every engine
    folds the same additions in the same order on IEEE doubles, so the
    oracle reproduces projected vectors BIT-FOR-BIT (same convention as
    the embedding family's other folds). Pure projection: no shuffle, no
    Python, whole-stage codegen.

    The unrolled form is capped at ``out_dim * d_in <= 65,536`` terms —
    beyond that the generated expression approaches Janino method limits
    and planner memory (e.g. 768 -> 128 is ~100k terms). A wider
    projection should go through two chained projections (768 -> 256 ->
    128 stays under the cap) or a coarser target dimension.
    """
    if out_dim < 1:
        raise ValueError("embedding_random_projection: out_dim must be >= 1")
    max_terms = 65_536

    def _sign(i: int, j: int) -> int:
        import hashlib

        h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
        return 1 if int(h[0], 16) < 8 else -1

    def _project(df: DataFrame) -> DataFrame:
        from pyspark.sql.types import ArrayType

        dt = df.schema[input_col].dataType
        if not isinstance(dt, ArrayType):
            raise ValueError(
                f"embedding_random_projection: {input_col} must be an array"
            )
        # embedding width from the data: one aggregate probe over
        # non-null embeddings (a null first row must not zero the width)
        first = df.select(F.max(F.size(input_col)).alias("d")).first()
        d_in = int(first["d"]) if first and first["d"] is not None else 0
        if d_in < 1:
            return df.withColumn(
                output_col,
                F.lit(None).cast("array<double>"),
            )
        if out_dim * d_in > max_terms:
            raise ValueError(
                f"embedding_random_projection: out_dim * input width = "
                f"{out_dim}*{d_in} exceeds {max_terms} unrolled terms; "
                "chain two smaller projections instead"
            )
        scale = 1.0 / (out_dim**0.5)
        quoted = "`" + input_col.replace("`", "``") + "`"
        comps = []
        for i in range(out_dim):
            terms = " ".join(
                ("+" if _sign(i, j) > 0 else "-")
                + f" cast(element_at({quoted}, {j + 1}) as double)"
                for j in range(d_in)
            ).lstrip("+ ")
            comps.append(F.expr(f"({terms}) * {scale!r}"))
        return df.withColumn(output_col, F.array(*comps))

    return _project

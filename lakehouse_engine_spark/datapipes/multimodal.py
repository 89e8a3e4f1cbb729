"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side machinery is real and tested — schema contracts, Arrow-batched
``mapInPandas`` UDF signatures, partition sizing — while the actual media
decoding is stubbed (no image/audio libraries in this container): decode
functions either raise ``NotImplementedError`` (strict mode) or produce a
deterministic fake derived from the payload bytes (test mode), so the
pipeline shape can be validated end-to-end.

At 100 TB: binary payloads dominate partition size, so operators here
repartition by byte budget (``target_partition_mb``) before the UDF stage and
keep metadata-only projections separate from payload scans (column pruning
drops the binary column when only metadata is referenced).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_engine_spark.datapipes.registry import register

TransformerFn = Callable[[DataFrame], DataFrame]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


@register("multimodal_pack")
def pack_binary(
    payload_col: str,
    id_col: str,
    media_type: str = "application/octet-stream",
    output_col: str = "payload",
) -> TransformerFn:
    """Wrap a column as an opaque binary payload + metadata struct.

    (With real media the payload comes from the source as binary already;
    packing from text keeps the column contract exercisable here.)
    """

    def _pack(df: DataFrame) -> DataFrame:
        return df.withColumns(
            {
                output_col: F.col(payload_col).cast("binary"),
                "media_meta": F.struct(
                    F.lit(media_type).alias("media_type"),
                    F.lit(None).cast("int").alias("width"),
                    F.lit(None).cast("int").alias("height"),
                    F.lit(None).cast("long").alias("duration_ms"),
                    F.lit(None).cast("string").alias("codec"),
                ),
            }
        )

    return _pack


@register("multimodal_feature_extract")
def feature_extract(
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    mode: str = "fake",  # fake | strict
    target_partition_mb: int = 128,
) -> TransformerFn:
    """Decode/feature-extract binary payloads via Arrow-batched mapInPandas.

    ``strict`` raises NotImplementedError where a real decoder (PIL/ffmpeg/…)
    would plug in; ``fake`` emits deterministic features from the bytes so the
    distributed plumbing (schema, batching, partition sizing) is testable.
    """

    def _extract(df: DataFrame) -> DataFrame:
        # size partitions by payload bytes, not row count
        stats = df.select(
            F.sum(F.length(payload_col)).alias("total"), F.count(F.lit(1)).alias("n")
        ).first()
        total_mb = (stats["total"] or 0) / (1024 * 1024)
        parts = max(int(total_mb / target_partition_mb) + 1, 1)
        src = df.select(F.col(id_col).alias("id"), F.col(payload_col)).repartition(parts)

        def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if mode == "strict":
                    raise NotImplementedError(
                        "media decode requires an image/audio library; "
                        "install one and replace this stub"
                    )
                payload = pdf[payload_col]
                n_bytes = payload.map(lambda b: len(b) if b is not None else 0)
                checksum = payload.map(
                    lambda b: int(sum(b[:1024])) if b else 0
                )
                feats = [
                    [float(((c + d) % 251)) / 251.0 for d in range(feature_dim)]
                    for c in checksum
                ]
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "n_bytes": n_bytes.astype("int64"),
                        "byte_checksum": checksum,
                        "feature": feats,
                    }
                )

        return src.mapInPandas(_batches, FEATURE_SCHEMA)

    return _extract


@register("multimodal_frame_sample")
def frame_sample(
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 256,
    max_frames: int = 16,
    mode: str = "fake",
) -> TransformerFn:
    """Frame sampling contract (video → frames): one output row per sampled
    frame with (id, frame_idx, frame_bytes). Fake mode slices the payload at
    fixed offsets; a real implementation decodes with ffmpeg at this exact
    UDF boundary."""

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def _sample(df: DataFrame) -> DataFrame:
        src = df.select(F.col(id_col).alias("id"), F.col(payload_col))

        def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if mode == "strict":
                    raise NotImplementedError("video decode stub — plug in ffmpeg here")
                rows = {"id": [], "frame_idx": [], "frame_bytes": []}
                for _, r in pdf.iterrows():
                    b = r[payload_col] or b""
                    for i in range(min(max(len(b) // every_n_bytes, 1), max_frames)):
                        rows["id"].append(r["id"])
                        rows["frame_idx"].append(i)
                        rows["frame_bytes"].append(
                            bytes(b[i * every_n_bytes : (i + 1) * every_n_bytes])
                        )
                yield pd.DataFrame(rows)

        return src.mapInPandas(_batches, schema)

    return _sample

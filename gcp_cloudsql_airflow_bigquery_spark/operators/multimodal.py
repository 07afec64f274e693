"""Multimodal column plumbing (SURVEY.md north star "multimodal
columns"): image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio libraries, so the *decode* step is
stubbed: ``decode_backend="fake"`` produces deterministic features from
the bytes (real Spark plumbing — schema, batching, partitioning — with a
fake kernel), and ``decode_backend="pil"``/... raise
``NotImplementedError`` unless the library imports.  Swapping in a real
decoder changes only the per-batch kernel, nothing in the plan.

Scale notes: media bytes dominate row size — keep
``spark.sql.files.maxPartitionBytes`` modest so a partition of blobs
fits executor memory, and let ``mapInPandas`` stream Arrow batches
(bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``) instead of
materializing a partition at once.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic opaque binary column from an id column —
    the stand-in for real stored media bytes."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("media:"), F.col(id_col).cast("string")), 256)
    return df.select(
        F.col(id_col).alias("media_id"),
        kinds.alias("kind"),
        F.to_binary(F.repeat(payload, 4), F.lit("hex")).alias("content"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col(id_col) % 10000).cast("int").alias("duration_ms"),
    )


def _fake_features(content: bytes) -> list[float]:
    """Deterministic pseudo-feature vector from the raw bytes (digest
    expansion) — stands in for a CNN/fbank feature extractor."""
    out: list[float] = []
    seed = content or b""
    i = 0
    while len(out) < FEATURE_DIM:
        d = hashlib.sha256(seed + i.to_bytes(2, "big")).digest()
        for j in range(0, 32, 4):
            if len(out) >= FEATURE_DIM:
                break
            out.append(int.from_bytes(d[j : j + 4], "big") / 2**32)
        i += 1
    return out


def extract_features(
    media: DataFrame, decode_backend: str = "fake"
) -> DataFrame:
    """``mapInPandas`` feature extraction over media blobs.

    Arrow-batched: each pandas batch holds a bounded slice of a
    partition, so blob size never blows executor memory.
    """
    if decode_backend == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decode_backend='pil' requires Pillow, not present in this "
                "container; use decode_backend='fake' for plumbing tests"
            ) from e
    elif decode_backend != "fake":
        raise NotImplementedError(f"unknown decode backend {decode_backend!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "checksum": content.map(
                        lambda b: zlib.crc32(b) if b is not None else 0
                    ),
                    "feature": content.map(_fake_features),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_backend: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: one output row per
    sampled frame offset.  The decode is fake (offset list derived from
    duration metadata); a real backend would demux the container."""
    if decode_backend != "fake":
        raise NotImplementedError(
            "real video demuxing is not available in this container"
        )
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames.withColumn(
        "frame_key", F.concat_ws(":", "media_id", "frame_ms")
    )


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` variant of the feature plumbing: the kernel sees
    raw Arrow ``RecordBatch``es, so fixed-width stats over the binary
    column (``binary_length``) run as vectorized Arrow compute with NO
    pandas object boxing — at 100 TB of blobs that's the difference
    between a zero-copy scan and materializing every payload as a
    Python ``bytes``.  Only the genuinely scalar step (crc32) touches
    Python objects."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            content = batch.column(batch.schema.get_field_index("content"))
            n_bytes = pc.coalesce(pc.binary_length(content), pa.scalar(0))
            checksum = pa.array(
                [0 if b is None else zlib.crc32(b.as_py()) for b in content],
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    batch.column(batch.schema.get_field_index("kind")),
                    n_bytes.cast(pa.int64()),
                    checksum,
                ],
                names=["media_id", "kind", "n_bytes", "checksum"],
            )

    return media.mapInArrow(
        kernel, schema="media_id long, kind string, n_bytes long, checksum long"
    )

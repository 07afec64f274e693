"""Multimodal column plumbing (SURVEY.md north star "multimodal
columns"): image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

Decode backends:

- ``"pure"`` — a REAL end-to-end decode path with no third-party
  dependency: binary PPM (P6) images and RIFF/WAVE PCM16 audio are
  parsed byte-for-byte by the pure-Python codecs below
  (``decode_ppm``/``decode_wav_pcm16``) and reduced to real signal
  features (channel means, luma stats / RMS, zero-crossing rate).
- ``"fake"`` — deterministic features from the raw bytes (digest
  expansion) for blobs in formats this container can't decode.
- ``"pil"``/``"ffmpeg"`` — gated on the real libraries, which aren't in
  this container: ``NotImplementedError`` unless importable.

Swapping backends changes only the per-batch kernel, nothing in the
plan — schema, Arrow batching and partitioning are identical.

Scale notes: media bytes dominate row size — keep
``spark.sql.files.maxPartitionBytes`` modest so a partition of blobs
fits executor memory, and let ``mapInPandas`` stream Arrow batches
(bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``) instead of
materializing a partition at once.
"""

from __future__ import annotations

import hashlib
import math
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


# --- pure-Python codecs (the de-stubbed decode path) -----------------------

def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6): ASCII header + raw interleaved RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb payload must be width*height*3 bytes")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def decode_ppm(b: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) image: returns (width, height, rgb).
    Accepts the whitespace/comment grammar of the format; raises
    ``ValueError`` on anything malformed — a real parser, not a stub."""
    if not b or not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    rgb = b[pos : pos + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM payload")
    return width, height, rgb


def encode_wav_pcm16(samples: list[int], rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE container around little-endian PCM16 mono."""
    import struct

    data = b"".join(struct.pack("<h", max(-32768, min(32767, s))) for s in samples)
    byte_rate = rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(b: bytes) -> tuple[int, list[int]]:
    """Parse a RIFF/WAVE file: returns (sample_rate, samples).  Walks
    the chunk list (so extra chunks before ``data`` are fine); PCM16
    mono only."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise ValueError(f"unsupported WAV format code {fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if channels != 1 or bits != 16:
        raise ValueError("only PCM16 mono supported")
    n = len(data) // 2
    return rate, list(struct.unpack(f"<{n}h", data[: n * 2]))


def _image_features(width: int, height: int, rgb: bytes) -> list[float]:
    """Real image features from decoded pixels: dimensions, per-channel
    means, luma statistics, and a coarse 8-bin luma histogram."""
    n = width * height
    r = rgb[0::3]
    g = rgb[1::3]
    bch = rgb[2::3]
    luma = [
        0.299 * r[i] + 0.587 * g[i] + 0.114 * bch[i] for i in range(n)
    ]
    mean_l = sum(luma) / n
    var_l = sum((x - mean_l) ** 2 for x in luma) / n
    hist = [0.0] * 8
    for x in luma:
        hist[min(7, int(x) >> 5)] += 1.0
    out = [
        width / 4096.0,
        height / 4096.0,
        sum(r) / n / 255.0,
        sum(g) / n / 255.0,
        sum(bch) / n / 255.0,
        mean_l / 255.0,
        var_l**0.5 / 255.0,
        min(luma) / 255.0,
    ] + [h / n for h in hist]
    return out[:FEATURE_DIM]


def _audio_features(rate: int, samples: list[int]) -> list[float]:
    """Real audio features from decoded PCM: rate, length, RMS, peak,
    zero-crossing rate, mean, and a coarse 8-bin amplitude histogram."""
    n = max(len(samples), 1)
    rms = (sum(s * s for s in samples) / n) ** 0.5
    zc = sum(
        1 for i in range(1, len(samples)) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    hist = [0.0] * 8
    for s in samples:
        hist[min(7, abs(s) >> 12)] += 1.0
    out = [
        rate / 48000.0,
        len(samples) / 1e6,
        rms / 32768.0,
        max((abs(s) for s in samples), default=0) / 32768.0,
        zc / n,
        (sum(samples) / n) / 32768.0,
        min(samples, default=0) / 32768.0,
        max(samples, default=0) / 32768.0,
    ] + [h / n for h in hist]
    return out[:FEATURE_DIM]


def attach_codec_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-format media blobs from an id column: PPM
    images and WAV PCM16 audio synthesized and *encoded* per row (video
    keeps an opaque payload — no pure-Python container format to
    honestly encode).  Runs as an Arrow-batched ``mapInPandas`` so blob
    construction is distributed, exactly like a real ingest."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 3 == 0:  # 8×8 PPM with an id-dependent gradient
                    w = h = 8
                    rgb = bytes(
                        (x * 31 + y * 17 + mid * c + mid) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    )
                    rows.append(
                        (mid, "image", encode_ppm(w, h, rgb), "image/x-portable-pixmap",
                         w, h, None)
                    )
                elif mid % 3 == 1:  # 64-sample PCM16 WAV, id-seeded wave
                    samples = [
                        ((mid * 2654435761 + i * 40503) % 65536) - 32768
                        for i in range(64)
                    ]
                    rows.append(
                        (mid, "audio", encode_wav_pcm16(samples, 16000),
                         "audio/wav", None, None, 4)
                    )
                else:
                    payload = hashlib.sha256(f"video:{mid}".encode()).digest()
                    rows.append(
                        (mid, "video", payload * 4, "video/x-fake", None, None,
                         mid % 10000)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "content", "mime", "width", "height",
                    "duration_ms",
                ],
            )

    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _pure_decode_features(kind: str, content: bytes) -> list[float]:
    if kind == "image":
        return _image_features(*decode_ppm(content))
    if kind == "audio":
        return _audio_features(*decode_wav_pcm16(content))
    return _fake_features(content)  # no honest pure-Python video codec


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
                "container; use decode_backend='pure' (real PPM/WAV codecs) "
                "or 'fake' instead"
            ) from e
    elif decode_backend not in ("fake", "pure"):
        raise NotImplementedError(f"unknown decode backend {decode_backend!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            if decode_backend == "pure":
                feature = [
                    _pure_decode_features(k, b)
                    for k, b in zip(pdf["kind"], content)
                ]
            else:
                feature = content.map(_fake_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "checksum": content.map(
                        lambda b: zlib.crc32(b) if b is not None else 0
                    ),
                    "feature": feature,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_ppm_nearest(b: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a P6 PPM image — a REAL resize over
    the pure codec path (decode → index-sampled RGB grid → re-encode),
    no imaging library needed.  Raises on malformed input like
    :func:`decode_ppm`."""
    import numpy as np

    w, h, rgb = decode_ppm(b)
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dims must be positive")
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = np.arange(out_h) * h // out_h
    xs = np.arange(out_w) * w // out_w
    return encode_ppm(out_w, out_h, a[ys][:, xs].tobytes())


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_media(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    decode_backend: str = "pure",
) -> DataFrame:
    """Distributed image resize (the standard normalize-before-embed
    step of a multimodal ingest): image blobs are decoded, resized to
    ``out_w × out_h`` with nearest-neighbor sampling, and re-encoded —
    per Arrow batch via ``mapInPandas``, so blob work is distributed
    and batch-bounded exactly like :func:`extract_features`.  Only the
    ``pure`` backend (real PPM codec) is available in this container;
    ``pil`` is gated like the other decode paths.  Non-image rows are
    dropped (resize is an image op; audio/video have their own
    kernels)."""
    if decode_backend == "pil":
        raise NotImplementedError(
            "decode_backend='pil' requires Pillow, not present in this "
            "container; use decode_backend='pure'"
        )
    if decode_backend != "pure":
        raise NotImplementedError(f"unknown decode backend {decode_backend!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["kind"] == "image"
            pdf = pdf[mask]
            resized = [
                resize_ppm_nearest(b, out_w, out_h) for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": out_w,
                    "height": out_h,
                    "content": resized,
                }
            )

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)


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


def image_ahash(media: DataFrame) -> DataFrame:
    """64-bit average hash (aHash) per IMAGE row: decode the PPM,
    nearest-sample the pixel grid to 8×8, and set bit (y, x) when the
    cell's channel sum exceeds the grid mean — the classic cheap
    perceptual fingerprint for image near-dup detection.

    INTEGER semantics on purpose: the per-cell statistic is the raw
    ``r+g+b`` channel sum and the threshold test is
    ``sum3 * 64 > total`` (both exact integers < 2^25), so the hash is
    bit-identical in ANY reimplementation — no float grayscale, no
    mean rounding.  That is what makes the media family's first
    ORACLE-PAIRED query possible (the synthetic blobs are integer
    arithmetic a SQL engine can replay; see
    plans/llmdata.media_image_ahash).

    Output: ``media_id``, 16-hex-char ``ahash_hex`` (MSB-first,
    row-major), and the four 16-bit bands ``b0..b3`` (two rows each)
    used for pigeonhole blocking in :func:`ahash_near_dup_pairs`.
    Arrow-batched ``mapInPandas`` like every media kernel; non-image
    rows are dropped."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "image":
                    continue
                w, h, rgb = decode_ppm(bytes(content))
                s3 = []
                for gy in range(8):
                    for gx in range(8):
                        x, y = gx * w // 8, gy * h // 8
                        o = (y * w + x) * 3
                        s3.append(rgb[o] + rgb[o + 1] + rgb[o + 2])
                total = sum(s3)
                bits = [1 if v * 64 > total else 0 for v in s3]
                by = bytearray()
                for row in range(8):
                    b = 0
                    for col in range(8):
                        b = (b << 1) | bits[row * 8 + col]
                    by.append(b)
                hexs = by.hex()
                bands = [int(hexs[i * 4 : (i + 1) * 4], 16) for i in range(4)]
                out.append((int(mid), hexs, *bands))
            yield pd.DataFrame(
                out,
                columns=["media_id", "ahash_hex", "b0", "b1", "b2", "b3"],
            ).astype(
                {
                    "media_id": "int64",
                    "ahash_hex": "object",
                    "b0": "int32",
                    "b1": "int32",
                    "b2": "int32",
                    "b3": "int32",
                }
            )

    return media.mapInPandas(
        kernel,
        schema="media_id long, ahash_hex string, b0 int, b1 int, b2 int, b3 int",
    )


def ahash_near_dup_pairs(
    hashed: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Image near-dup pairs from aHash: pigeonhole banding (4 × 16-bit
    bands — two hashes within Hamming distance ≤ 3 MUST agree on at
    least one band, since 3 flips cannot touch 4 bands) generates
    candidates via an equi-join on (band index, band value); the exact
    Hamming distance then verifies each candidate as
    ``Σ bit_count(b_i XOR b'_i)`` — integer XOR + popcount per 16-bit
    band, no 64-bit sign pitfalls.  The LSH-shaped candidate/verify
    split every dedup family in this repo uses, applied to images.

    Scale shape: the only shuffle is the band equi-join (each hash
    explodes into exactly 4 band rows); candidates within a bucket
    pair quadratically, which is the standard banding trade-off —
    uniform hashes keep buckets tiny, and a hot bucket means the
    images really are near-identical.

    ``max_hamming`` is hard-capped at 3: with 4 bands the pigeonhole
    argument only guarantees candidate completeness for distance ≤ 3
    (4 flips can hit all 4 bands), so a larger threshold would
    silently return incomplete recall (ADVICE r8)."""
    if max_hamming > 3:
        raise ValueError(
            "ahash_near_dup_pairs: max_hamming > 3 breaks the 4-band "
            "pigeonhole completeness guarantee (got "
            f"{max_hamming}); re-band with more/narrower bands for "
            "larger radii"
        )
    bands = hashed.select(
        "media_id",
        "ahash_hex",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("i"), F.col("b0").alias("v")),
                F.struct(F.lit(1).alias("i"), F.col("b1").alias("v")),
                F.struct(F.lit(2).alias("i"), F.col("b2").alias("v")),
                F.struct(F.lit(3).alias("i"), F.col("b3").alias("v")),
            )
        ).alias("band"),
    ).select("media_id", "b0", "b1", "b2", "b3", "band.i", "band.v")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            (
                F.bit_count(
                    F.col("a.b0").bitwiseXOR(F.col("b.b0"))
                )
                + F.bit_count(F.col("a.b1").bitwiseXOR(F.col("b.b1")))
                + F.bit_count(F.col("a.b2").bitwiseXOR(F.col("b.b2")))
                + F.bit_count(F.col("a.b3").bitwiseXOR(F.col("b.b3")))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def audio_pcm_stats(media: DataFrame) -> DataFrame:
    """Per-AUDIO-row PCM16 signal statistics through the real RIFF
    decode path (:func:`decode_wav_pcm16`): sample count, sample sum,
    sum of squares, peak amplitude, zero-crossing count, min/max
    sample, plus the one derived float — RMS, computed as
    ``sqrt(sum_sq / n)``: the division is exact (n a power of two in
    the fixture) and IEEE sqrt is correctly rounded in every engine,
    so the double is bit-identical cross-engine WITHOUT rounding.

    INTEGER semantics on purpose (the ``image_ahash`` convention):
    every emitted statistic except ``rms`` is an exact 64-bit integer
    over the decoded samples, so any reimplementation — including a
    SQL engine replaying the synthetic id-seeded waveform — produces
    identical rows.  That makes the WAV path's first ORACLE-PAIRED
    query possible (plans/llmdata.media_audio_stats), moving the
    codec family beyond rows-only checks.

    Arrow-batched ``mapInPandas`` like every media kernel; non-audio
    rows are dropped.  Scale shape: one decode pass per blob, no
    shuffle — statistics are per-row, downstream aggregation is the
    caller's choice."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "audio":
                    continue
                rate, xs = decode_wav_pcm16(bytes(content))
                n = len(xs)
                zc = sum(
                    1
                    for i in range(1, n)
                    if (xs[i - 1] < 0) != (xs[i] < 0)
                )
                sum_sq = sum(x * x for x in xs)
                out.append(
                    (
                        int(mid),
                        rate,
                        n,
                        sum(xs),
                        sum_sq,
                        max((abs(x) for x in xs), default=0),
                        zc,
                        min(xs, default=0),
                        max(xs, default=0),
                        math.sqrt(sum_sq / n) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "rate", "n_samples", "sum_samples",
                    "sum_sq", "peak", "zero_crossings", "smin", "smax",
                    "rms",
                ],
            ).astype(
                {
                    "media_id": "int64", "rate": "int64",
                    "n_samples": "int64", "sum_samples": "int64",
                    "sum_sq": "int64", "peak": "int64",
                    "zero_crossings": "int64", "smin": "int64",
                    "smax": "int64", "rms": "float64",
                }
            )

    return media.mapInPandas(
        kernel,
        schema=(
            "media_id long, rate long, n_samples long, sum_samples long,"
            " sum_sq long, peak long, zero_crossings long, smin long,"
            " smax long, rms double"
        ),
    )


def image_channel_stats(media: DataFrame) -> DataFrame:
    """Per-channel pixel statistics per IMAGE row: decode the PPM and
    emit one row per (media_id, channel) with the exact integer sum /
    min / max and the mean — the decode-path check that exercises
    CHANNEL SEPARATION, where :func:`image_ahash` only sees the r+g+b
    sum.  Integer semantics throughout (sums < 2^25), so a SQL engine
    can replay the whole decode arithmetically for the synthetic blobs
    (plans/llmdata.media_image_channel_stats) — the media family's
    fourth oracle pair.

    Arrow-batched ``mapInPandas`` like every media kernel; non-image
    rows are dropped.  At 100 TB the kernel is embarrassingly parallel
    per blob; nothing shuffles until the (media_id, channel) frame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "image":
                    continue
                w, h, rgb = decode_ppm(bytes(content))
                for ci, cname in enumerate(("r", "g", "b")):
                    vals = [
                        rgb[(y * w + x) * 3 + ci]
                        for y in range(h)
                        for x in range(w)
                    ]
                    out.append(
                        (
                            int(mid),
                            cname,
                            sum(vals),
                            min(vals),
                            max(vals),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "channel", "c_sum", "c_min", "c_max"],
            ).astype(
                {
                    "media_id": "int64",
                    "channel": "object",
                    "c_sum": "int64",
                    "c_min": "int64",
                    "c_max": "int64",
                }
            )

    return media.mapInPandas(
        kernel,
        schema=(
            "media_id long, channel string, c_sum long, c_min long,"
            " c_max long"
        ),
    )

"""Multimodal (image/audio/video) column plumbing (engine extension).

Design: media content is an opaque ``binary`` column + a typed metadata
struct — exactly how the reference carries geometry it never decodes
(SURVEY.md §1: opaque WKB, copied but not computed on). The Spark-side
plumbing (schemas, batch iteration, partitioning) is real and tested; the
actual codec step is STUBBED because media libraries are not available in
this environment — ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic fake decoder so the
pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def to_media_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped table from any corpus: bytes = UTF-8 content
    (stand-in for real image/audio payloads), metadata populated for real."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': digest bytes -> unit-range features.
    Stands in for PIL/libav decode, which is unavailable here."""
    h = hashlib.sha256(content or b"").digest()
    return [h[i % 32] / 255.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize media content via mapInPandas (Arrow batches).

    Real decoders (PIL, torchaudio, pyav) are NOT present in this container:
    with ``fake=False`` this raises NotImplementedError at execution time.
    The Spark plumbing — schema contract, Arrow batch iteration, partition
    parallelism — is the real implementation a codec would drop into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; pass fake=True"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.sha256(bytes(b) if b is not None else b"").hexdigest()
                    ),
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["content"].map(lambda b: _fake_decode(bytes(b or b""), dim)),
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to ``n_frames``
    frame rows via mapInPandas (the cardinality-changing shape a real
    pyav/ffmpeg sampler needs). The fake 'decoder' slices the content bytes
    into n equal spans — deterministic, so an SQL oracle can verify the
    fan-out, boundaries, and hashes exactly.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable in this environment; pass fake=True"
                )
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                length = len(data)
                for i in range(n_frames):
                    lo = (i * length) // n_frames
                    hi = ((i + 1) * length) // n_frames
                    frame = data[lo:hi]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_hash": hashlib.sha256(frame).hexdigest(),
                            "n_bytes": len(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_image(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image resize plumbing: content passes through a Pandas-batched
    transform; metadata records the new dimensions. With ``fake=False`` the
    codec step raises (PIL absent); with ``fake=True`` content is passed
    through untouched so the schema/batching contract is exercised."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; pass fake=True"
                )
            out = pdf[["media_id", "content"]].copy()
            out["mime"] = "application/octet-stream"
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = pdf["content"].map(lambda b: len(b) if b is not None else 0)
            yield out

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    out = media.mapInPandas(batches, schema=flat)
    return out.select(
        "media_id",
        "content",
        F.struct("mime", "width", "height", "n_bytes").alias("meta"),
    )


# ---------------------------------------------------------------------------
# Audio: typed metadata + chunk manifests (no codec required)
# ---------------------------------------------------------------------------

def to_audio_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Audio-shaped table with typed metadata synthesized deterministically
    (the fixture has no real audio): bytes = UTF-8 content stand-in,
    sample_rate/n_samples derived from content length. The metadata layout
    (mime, sample_rate, n_samples, n_bytes) is the real contract a loader
    fills from file headers."""
    content = F.encode(F.col(text_col), "UTF-8")
    n_chars = F.length(F.col(text_col)).cast("bigint")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("audio/pcm").alias("mime"),
            F.when(F.col(id_col) % 4 == 0, 44100).otherwise(16000).alias("sample_rate"),
            (n_chars * 400 + 37).alias("n_samples"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def audio_chunk_manifest(
    audio: DataFrame, chunk_seconds: int = 10, bytes_per_sample: int = 2
) -> DataFrame:
    """Fixed-duration chunk manifest over audio metadata: one row per
    (media_id, chunk_idx) with exact sample and byte ranges — the fan-out a
    distributed loader executes BEFORE any decode touches bytes, so a 100 TB
    audio corpus schedules chunk reads from metadata alone (range requests,
    no full-file pulls). Pure integer arithmetic (ceil via `(n + c - 1) div
    c`), no UDF, narrow map + generate.

    Returns (media_id, chunk_idx, start_sample, chunk_samples, start_byte,
    chunk_bytes); the final chunk is short when duration doesn't divide
    evenly. Zero-sample rows yield no chunks.
    """
    rate = F.col("meta.sample_rate").cast("bigint")
    n = F.col("meta.n_samples")
    spc = rate * chunk_seconds
    n_chunks = F.expr(
        f"(meta.n_samples + CAST(meta.sample_rate AS BIGINT) * {chunk_seconds} - 1) "
        f"div (CAST(meta.sample_rate AS BIGINT) * {chunk_seconds})"
    )
    staged = audio.select(
        "media_id", n.alias("_n"), spc.alias("_spc"), n_chunks.alias("_nc")
    ).filter(F.col("_nc") > 0)
    exploded = staged.select(
        "media_id",
        "_n",
        "_spc",
        F.posexplode(F.expr("sequence(0, _nc - 1)")).alias("chunk_idx", "_k"),
    )
    start = F.col("_k") * F.col("_spc")
    csamp = F.least(F.col("_spc"), F.col("_n") - start)
    return exploded.select(
        "media_id",
        F.col("chunk_idx"),
        start.alias("start_sample"),
        csamp.alias("chunk_samples"),
        (start * bytes_per_sample).alias("start_byte"),
        (csamp * bytes_per_sample).alias("chunk_bytes"),
    )

"""Multimodal column operators (BASELINE.json north-star).

Images/audio/video are opaque BINARY columns plus typed metadata; the
Spark-side plumbing — schema, Arrow batch shape, partition sizing — is
real and tested, while the codec step is stubbed (no media libraries in
this container) behind a deterministic fake keyed by content hash, with
the real-library call site marked.

Scale posture: media decode is the canonical mapInPandas workload — CPU
per row is large, so parallelism = partitions; `repartition(n)` before the
decode to saturate executors, and keep batch memory bounded via
spark.sql.execution.arrow.maxRecordsPerBatch when rows are megabytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (blob, media metadata) — the storage contract for multimodal rows.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 8

_DECODE_SCHEMA = (
    "media_id BIGINT, media_type STRING, n_bytes INT, content_sha STRING, "
    f"features ARRAY<DOUBLE>"
)


def _fake_decode(blob: bytes) -> list[float]:
    """Deterministic stand-in for a real codec: FEATURE_DIM doubles derived
    from the content hash. REAL IMPLEMENTATION SITE: replace with e.g.
    PIL.Image.open(io.BytesIO(blob)) / librosa / av frame sampling — the
    surrounding batch plumbing does not change.
    """
    h = hashlib.sha256(blob).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode/feature-extract each blob via Arrow-batched mapInPandas.

    Output: (media_id, media_type, n_bytes, content_sha, features).
    """
    df = media.repartition(partitions) if partitions else media

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "content_sha": blobs.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "features": blobs.map(_fake_decode),
                }
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        run, schema=_DECODE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (explode over the sampling grid). The decode of each frame is
    the stubbed step; the fan-out, schema, and partitioning are the real
    shape of the operator.
    """
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: metadata transforms JVM-side; the pixel
    operation itself raises until a codec library is wired in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires a codec library (PIL/opencv) not present "
            "in this container; wire it into this mapInPandas body"
        )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=media.schema
    )


def sniff_media_format(media: DataFrame,
                       content_col: str = "content") -> DataFrame:
    """Content-format detection from MAGIC BYTES — entirely JVM codegen
    (substring over BINARY + hex prefix tests), no Python, no codec
    library: the validation/routing step that must run before any decode
    at 100 TB, because the DECLARED media type lies (mislabeled uploads,
    renamed extensions) while magic bytes do not.

    Detects: png (89504E470D0A1A0A), jpeg (FFD8FF), gif (GIF87a/GIF89a),
    wav (RIFF....WAVE), avi (RIFF....AVI ), mp4 (ftyp at offset 4);
    everything else -> 'unknown'. Output adds `sniffed_format` and
    `type_consistent` (sniffed format belongs to the declared media_type
    family). Zero exchanges — composes into whatever scan/filter
    surrounds it, and at scale the inconsistent rows route to quarantine
    via an ordinary filter.
    """
    head = F.hex(F.substring(F.col(content_col), 1, 12))
    riff = head.startswith("52494646")  # 'RIFF'
    # container subtype at bytes 9-12 -> hex chars 17-24
    sub = F.substring(head, 17, 8)
    sniffed = (
        F.when(head.startswith("89504E470D0A1A0A"), F.lit("png"))
        .when(head.startswith("FFD8FF"), F.lit("jpeg"))
        .when(
            head.startswith("474946383761")
            | head.startswith("474946383961"),
            F.lit("gif"),
        )
        .when(riff & (sub == "57415645"), F.lit("wav"))    # 'WAVE'
        .when(riff & (sub == "41564920"), F.lit("avi"))    # 'AVI '
        .when(F.substring(head, 9, 8) == "66747970", F.lit("mp4"))  # 'ftyp'
        .otherwise(F.lit("unknown"))
    )
    families = F.create_map(
        F.lit("png"), F.lit("image"), F.lit("jpeg"), F.lit("image"),
        F.lit("gif"), F.lit("image"), F.lit("wav"), F.lit("audio"),
        F.lit("avi"), F.lit("video"), F.lit("mp4"), F.lit("video"),
    )
    return media.withColumn("sniffed_format", sniffed).withColumn(
        "type_consistent",
        families[F.col("sniffed_format")] == F.col("media_type"),
    )

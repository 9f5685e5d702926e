"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, and Arrow-batched decode / feature-extract plumbing.

Extension surface (north-star mandate). The Spark-side design is real
and tested — schema, partitioning, mapInPandas batch shape, feature
extraction — while the actual media codecs are STUBBED: the container
has no image/audio libraries, so ``decode_image`` / ``resample_audio`` /
``sample_frames`` raise NotImplementedError with a clear message, and
the feature extractor uses a deterministic byte-level fake in their
place. Swapping in Pillow/librosa/pyav changes only the inner function,
not the Spark plumbing.

Scale notes: binary payloads stay opaque to the JVM (no codegen over
blob contents); mapInPandas streams Arrow record batches so one task
never materializes more than spark.sql.execution.arrow.maxRecordsPerBatch
rows of payload; feature rows are tiny, so the expensive stage is
map-only with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id BIGINT, kind STRING, n_bytes BIGINT, byte_mean DOUBLE, byte_entropy_proxy BIGINT"
)


def decode_image(data: bytes) -> object:
    """Real image decode (Pillow/torchvision) — unavailable here."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "plug Pillow/torchvision into extract_features' inner loop"
    )


def resample_audio(data: bytes, rate: int = 16_000) -> object:
    raise NotImplementedError(
        "audio codecs are not installed in this environment; plug librosa/torchaudio here"
    )


def sample_frames(data: bytes, every_n: int = 30) -> object:
    raise NotImplementedError(
        "video codecs are not installed in this environment; plug pyav here"
    )


def documents_as_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Fixture adapter: wrap document text bytes as an opaque media
    payload with typed metadata — the storage shape a real multimodal
    table uses (binary column + metadata struct, partitionable by
    metadata without touching payloads)."""
    data = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        data.alias("data"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(F.col("text")).cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The inner per-payload function is where a real decoder goes
    (decode_image -> pixel stats); the deterministic byte-level fake
    keeps the full pipeline testable: byte_mean is the mean payload
    byte value, byte_entropy_proxy the count of distinct byte values.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["data"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["media_meta"]],
                    "n_bytes": payloads.map(len),
                    "byte_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_entropy_proxy": payloads.map(lambda b: len(set(b))),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id BIGINT, kind STRING, frame_stride INT, n_frames BIGINT, "
    "first_byte INT, last_byte INT"
)


def sample_frames_features(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing: take every `every_n`-th payload byte as
    a 'frame' and report per-document frame stats.

    The deterministic byte-stride stands in for real video frame
    extraction (``sample_frames`` above is the pyav hook); everything
    Spark-side is the production shape — Arrow-batched mapInPandas over
    the binary column, map-only, no shuffle, one output row per input
    row so the stage pipelines with the scan at any scale."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sampled = pdf["data"].map(lambda b: b[::every_n])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["media_meta"]],
                    "frame_stride": every_n,
                    "n_frames": sampled.map(len),
                    "first_byte": sampled.map(lambda s: s[0] if len(s) else None),
                    "last_byte": sampled.map(lambda s: s[-1] if len(s) else None),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id BIGINT, kind STRING, n_out BIGINT, checksum BIGINT"


def resize_features(media: DataFrame, target: int = 128) -> DataFrame:
    """Resize plumbing: map each payload to exactly `target` bytes via a
    linear index map (nearest-neighbor downsample over bytes — the
    deterministic stand-in for image resizing; ``decode_image`` is the
    Pillow hook). Emits the resized length and a positional checksum so
    tests can pin the exact byte selection. Same scale shape as the
    other media stages: Arrow-batched, map-only, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize(b: bytes) -> bytes:
            if not b:
                return b""
            return bytes(b[(i * len(b)) // target] for i in range(target))

        for pdf in it:
            resized = pdf["data"].map(resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["media_meta"]],
                    "n_out": resized.map(len),
                    "checksum": resized.map(
                        lambda r: sum((i + 1) * v for i, v in enumerate(r))
                    ),
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def audio_chunks(media: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Fixed-size chunking of an opaque audio payload into frame rows —
    the 1->N shape of PCM framing / VAD windowing (the real frame
    boundary computation would come from resample_audio's codec; the
    byte-window stand-in keeps the plumbing exact).

    Deliberately NO Python: chunk indices come from sequence() +
    explode and lengths from least(), all inside whole-stage codegen —
    the payload bytes themselves are never copied per chunk, only
    offsets/lengths are computed, so the exploded side stays narrow
    until a downstream consumer slices the blob it needs."""
    n_bytes = F.length(F.col("data"))
    n_chunks = F.ceil(n_bytes / F.lit(chunk_bytes)).cast("int")
    return (
        media.select(
            "doc_id",
            F.col("media_meta.kind").alias("kind"),
            n_bytes.alias("n_bytes"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_c"),
        )
        .select(
            "doc_id",
            "kind",
            "chunk_idx",
            (F.col("chunk_idx") * chunk_bytes).alias("offset"),
            F.least(
                F.lit(chunk_bytes), F.col("n_bytes") - F.col("chunk_idx") * chunk_bytes
            ).cast("int").alias("chunk_len"),
        )
    )

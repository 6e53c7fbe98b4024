"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (image/audio libraries are not
available in this container): ``decode_image_batch`` raises
``NotImplementedError`` unless handed a ``decoder``; tests inject the
deterministic ``fake_image_decoder``. Everything Spark-side — schema,
batch shape, partition sizing, UDF signatures — is real and tested.

Scale notes: binary payloads ride in Arrow record batches;
``spark.sql.files.maxPartitionBytes`` (and for very large blobs, a
pre-``repartition`` by size) keeps per-task memory bounded. Metadata-only
operations (filtering by width/height/duration) never touch the payload
column thanks to Parquet column pruning — the plan should show only the
metadata columns in ReadSchema.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata schema carried alongside each opaque payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def fake_image_decoder(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decoder: derives
    (width, height, mean_luma) from the payload bytes. Replace with PIL /
    cv2 in production."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    luma = (sum(payload[:256]) / max(1, min(n, 256))) / 255.0 if n else 0.0
    return width, height, luma


def attach_media_meta(df: DataFrame, payload_col: str, media_type: str) -> DataFrame:
    """Wrap a binary column with its typed metadata struct (JVM-side)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.octet_length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        ),
    )


def decode_image_batch(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
) -> DataFrame:
    """Decode image payloads into feature rows via ``mapInPandas``.

    ``decoder`` maps raw bytes -> (width, height, mean_luma). Without one
    this raises NotImplementedError at execution time (container has no
    image libraries) — inject ``fake_image_decoder`` in tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder is None:
            raise NotImplementedError(
                "no image decoder available in this environment; "
                "inject decoder= (e.g. PIL-based) or fake_image_decoder"
            )
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, luma = decoder(bytes(payload) if payload is not None else b"")
                rows.append((int(doc_id), w, h, luma))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_luma"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def fake_image_resizer(
    payload: bytes, width: int, height: int
) -> bytes:
    """Deterministic stand-in for a real resize kernel: emits a payload
    whose size is proportional to the target area. Replace with
    PIL.Image.resize / cv2.resize in production."""
    target = max(1, (width * height) // 64)
    reps = (target // max(1, len(payload))) + 1
    return (payload * reps)[:target]


def resize_image_batch(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` (binary in -> binary
    out). Without a ``resizer`` kernel this raises NotImplementedError at
    execution time — inject ``fake_image_resizer`` in tests.

    Scale note: output rows carry the new payload; write them straight
    back to parquet partitioned by ingest date rather than collecting —
    the resize pass is embarrassingly parallel and shuffle-free.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if resizer is None:
            raise NotImplementedError(
                "no image resize kernel available in this environment; "
                "inject resizer= (e.g. PIL-based) or fake_image_resizer"
            )
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out = resizer(
                    bytes(payload) if payload is not None else b"", width, height
                )
                rows.append((int(doc_id), out, width, height))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "width", "height"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_IMAGE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def fake_audio_decoder(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an audio decoder: derives
    (sample_rate, duration_ms, rms) from the payload bytes. Replace with
    soundfile/librosa in production."""
    n = len(payload)
    sample_rate = 8_000 if n % 2 else 16_000
    duration_ms = n  # pretend 1 byte ~ 1 ms
    rms = (
        (sum(b * b for b in payload[:256]) / max(1, min(n, 256))) ** 0.5 / 255.0
        if n
        else 0.0
    )
    return sample_rate, duration_ms, rms


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
) -> DataFrame:
    """Audio feature extraction via ``mapInPandas`` — same plumbing
    contract as :func:`decode_image_batch` (inject the kernel; the
    Spark-side schema/batching is real)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder is None:
            raise NotImplementedError(
                "no audio decoder available in this environment; "
                "inject decoder= (e.g. soundfile-based) or fake_audio_decoder"
            )
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                sr, dur, rms = decoder(
                    bytes(payload) if payload is not None else b""
                )
                rows.append((int(doc_id), sr, dur, rms))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "duration_ms", "rms"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame-index
    rows (JVM-side sequence over duration metadata) to be decoded by a
    downstream ``mapInPandas`` kernel (which re-joins the payload by
    doc_id — the heavy binary column must NOT ride the fan-out).
    Demonstrates the scale pattern: the expansion happens before the
    shuffle so decode work distributes evenly across executors even when
    a few videos are huge.

    Frame timestamps cover [0, duration_ms): ``ceil(duration/every)``
    frames — a sequence bounded by ``duration/every`` emitted an
    out-of-range seek at ts == duration for every exact-multiple
    duration (and one frame for a zero-length video)."""
    n_frames = F.ceil(
        F.col("duration_ms") / F.lit(float(every_ms))
    ).cast("bigint")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col("media_meta.duration_ms").alias("duration_ms"),
        )
        .filter(F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1)
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )

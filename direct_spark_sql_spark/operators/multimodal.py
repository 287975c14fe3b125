"""Multimodal column handling: opaque binary payloads + typed metadata.

Media bytes (image/audio/video) travel as a ``binary`` column next to a
metadata struct; decode / feature-extraction / frame-sampling run as
Arrow-batched ``mapInPandas`` operators so each task processes whole
record batches without per-row Python overhead.  The Spark-side plumbing
(schemas, batch iteration, partition behavior) is real and tested; the
actual codec calls are STUBBED — this container has no image/audio
libraries — behind ``_decode_image_bytes``, which raises
``NotImplementedError`` unless ``fake=True`` selects the deterministic
byte-statistics fake used by the tests.

Scale: mapInPandas preserves partitioning (no shuffle); batch size follows
``spark.sql.execution.arrow.maxRecordsPerBatch``.  For 100 TB of media the
binary column should be read from parquet with
``spark.sql.parquet.enableVectorizedReader`` left on and partitions sized
so one batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

#: Metadata carried with every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_binary(df: DataFrame, payload_col: str, mime: str, source_col: str) -> DataFrame:
    """Wrap an existing column's bytes as (media binary, metadata struct)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        "*",
        payload.alias("media"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("media_meta"),
    )


def _decode_image_bytes(payload: bytes, fake: bool) -> tuple[int, int, int, int, int]:
    """STUB decode step.  Real implementation would hand ``payload`` to an
    image codec (PIL / libvips / ffmpeg for video) and return pixel stats +
    dimensions.  The ``fake`` path computes deterministic byte statistics so
    the surrounding Spark plumbing is fully testable without codecs."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic byte-stats fake"
        )
    n = len(payload)
    if n == 0:
        return 0, 0, 0, 0, 0
    byte_sum = sum(payload)
    # fake "dimensions": a deterministic function of the payload length
    width = int(n**0.5) or 1
    height = (n + width - 1) // width
    return byte_sum, min(payload), max(payload), width, height


def extract_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", fake: bool = True
) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                payload = bytes(payload) if payload is not None else b""
                byte_sum, bmin, bmax, width, height = _decode_image_bytes(payload, fake)
                rows.append(
                    (int(doc_id), len(payload), byte_sum, bmin, bmax, width, height)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return df.select(id_col, media_col).mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    n_frames: int = 4,
) -> DataFrame:
    """Frame sampling stub: split each payload into ``n_frames`` contiguous
    chunks (stand-in for video keyframe extraction).  One row per frame;
    flatMap-shaped output through mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                payload = bytes(payload) if payload is not None else b""
                if not payload:
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    rows.append((int(doc_id), i, payload[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(run, FRAME_SCHEMA)

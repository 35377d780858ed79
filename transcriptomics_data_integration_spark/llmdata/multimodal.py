"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The decode kernels themselves are STUBS (this container has no
image/audio libraries — see the clearly-marked seams below); the
Spark-side contract is real and tested: schema, batch iteration,
partitioning, and the deterministic fake featurizer used by the
correctness gate.

At scale: mapInPandas streams Arrow batches — constant memory per
task; binary payloads should be stored in their own parquet column so
column pruning skips them unless the decode stage runs.  Partition by
content id before feature extraction so downstream joins are
co-located.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, n_bytes int, media_type string, "
    "width int, height int, checksum bigint"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload with typed
    metadata — the shape a real image/audio table would have."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: a real implementation would call PIL/opencv here.

    Deterministic fake: derive (width, height) from payload length so
    the pipeline is testable without image libraries.
    """
    n = len(payload)
    return (n % 1024) + 1, (n % 768) + 1
    # real path (library not in container):
    # raise NotImplementedError("image decode requires PIL/opencv")


def featurize_media(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches in, Arrow batches out; one output row per media row
    (width/height from the stub decoder, checksum = sum of bytes mod
    2^31 — deterministic and oracle-checkable).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "media_type": pdf["media_type"],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "checksum": pdf["payload"].map(lambda b: sum(b) % 2147483647),
                }
            )

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit n_frames
    (frame_no, offset) rows per media row — the explode pattern a real
    video pipeline uses, with byte offsets standing in for timestamps."""
    return df.select(
        F.col(id_col),
        F.col("n_bytes"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no"),
    ).withColumn(
        "byte_offset",
        (F.col("frame_no") * F.col("n_bytes") / n_frames).cast("int"),
    )


def _resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB: a real implementation decodes with PIL/opencv, resamples,
    and re-encodes.  Deterministic fake: truncate/tile the payload to a
    size proportional to the target pixel count so batch shapes and
    byte budgets behave like a real resize.
    """
    n_out = max(1, (target_w * target_h) // 256)
    reps = (n_out // max(len(payload), 1)) + 1
    return (payload * reps)[:n_out]
    # real path (library not in container):
    # raise NotImplementedError("image resize requires PIL/opencv")


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """mapInPandas resize over binary payloads — the
    preprocess-to-model-resolution step of an image pipeline, with the
    decode/resample stubbed (`_resize_stub`) and the Spark plumbing
    (Arrow batching, binary-in/binary-out schema, per-row metadata)
    real.

    Output keeps the payload column name so downstream featurize/frame
    ops compose unchanged.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: _resize_stub(b, target_w, target_h))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.mapInPandas(
        op,
        schema=(
            "media_id long, payload binary, n_bytes long, "
            "media_type string, width int, height int"
        ),
    )

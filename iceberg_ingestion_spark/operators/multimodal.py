"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with metadata structs; heavy
per-item work (decode, resize, feature extraction, frame sampling) runs as
Arrow-batched Pandas functions via ``mapInPandas`` — the Spark-side plumbing
(schema contract, batch iteration, partition parallelism) is real and tested;
the actual codec step is stubbed because no image/audio libraries ship in this
environment (clearly marked below).

At 100 TB: binary columns dominate scan size — keep them in their own parquet
column (column pruning skips them unless projected), repartition by size
before decode so batches are balanced, and never collect payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, fake_width int, fake_height int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: UTF-8 bytes of the text column as an opaque ``binary``
    column (stands in for image/audio bytes; real pipelines read these from
    object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Extract per-item metadata from binary payloads with mapInPandas.

    The md5/byte-count path is real (and oracle-checked); width/height are a
    deterministic fake standing in for an image decode. Arrow moves the binary
    batches; pandas processes them vectorized per partition.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                    # deterministic fake decode (see real_decode for the gate)
                    "fake_width": payload.map(lambda b: 1 + b[0] if len(b) else 0).astype("int32"),
                    "fake_height": payload.map(lambda b: 1 + b[-1] if len(b) else 0).astype(
                        "int32"
                    ),
                }
            )
            yield out

    return df.select(id_col, "payload").mapInPandas(_decode, DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_index int, frame_bytes binary, frame_md5 string"


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_size: int = 32,
    every_n: int = 4,
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size block of the payload as a 'frame'
    — the one-row-to-many-rows shape of real video frame sampling, with the
    codec stubbed to byte-block slicing (deterministic; a real pipeline swaps
    the slicer for a decord/ffmpeg call, the Spark plumbing is unchanged).

    Output partitioning follows the input — frames of one item stay together,
    so a downstream per-frame model UDF batches well."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, md5s = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_size)
                for fi in range(0, n_frames, every_n):
                    chunk = bytes(payload[fi * frame_size : (fi + 1) * frame_size])
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(chunk)
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame_bytes": frames,
                    "frame_md5": md5s,
                }
            )

    return df.select(id_col, "payload").mapInPandas(_sample, FRAME_SCHEMA)


def resize_plan(
    decoded: DataFrame,
    max_side: int = 128,
    width_col: str = "fake_width",
    height_col: str = "fake_height",
) -> DataFrame:
    """Aspect-preserving resize targets from decoded dimensions — the metadata
    half of a resize stage (the pixel op itself belongs in the decode kernel).
    Pure JVM arithmetic: integer floor scaling, never upscales."""
    w, h = F.col(width_col), F.col(height_col)
    long_side = F.greatest(w, h)
    scale = F.when(long_side > max_side, F.lit(max_side) / long_side).otherwise(F.lit(1.0))
    return (
        decoded.withColumn("target_width", F.floor(w * scale).cast("int"))
        .withColumn("target_height", F.floor(h * scale).cast("int"))
        .withColumn("resized", long_side > max_side)
    )


def real_decode(payload: bytes) -> dict:
    """Actual image decode — STUB: the container has no image/audio libraries.

    Wire PIL/torchaudio/decord here in a real deployment; the mapInPandas
    plumbing above is the part that matters for Spark.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires PIL/pillow, not available in this environment"
        ) from exc
    raise NotImplementedError("plug real decoder here")  # pragma: no cover

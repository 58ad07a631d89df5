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


AHASH_SCHEMA = "doc_id long, phash long"


def ahash64(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """64-bit average-hash (aHash) per binary payload — the perceptual-hash
    half of an image near-dup pipeline. A real deployment decodes the image
    and downscales to an 8x8 luma grid; here the grid is a DETERMINISTIC,
    LOCALITY-PRESERVING stand-in (mean byte value of each of 64 contiguous
    payload blocks), so payloads differing in a few bytes — the binary
    analogue of re-encoded/lightly-edited images — land within small hamming
    distance, which is the property the downstream banding join needs. Swap
    ``grid()`` for the real decode; every bit of the Spark plumbing and the
    pairing math is unchanged.

    Integer-exact: block luma is an integer floor-mean, and bit i is set iff
    ``luma_i * 64 > sum(lumas)`` (cross-multiplied mean threshold — no float
    anywhere), so hashes are bit-identical across engines and partitionings.
    Empty payloads hash to 0.
    """

    def grid(b: bytes) -> list[int]:
        n = len(b)
        if n == 0:
            return [0] * 64
        out = []
        for j in range(64):
            lo = (j * n) // 64
            hi = max(lo + 1, ((j + 1) * n) // 64)  # short payloads: 1+ byte/block
            block = b[lo:hi]
            out.append(sum(block) // len(block))
        return out

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b in pdf[payload_col]:
                g = grid(bytes(b))
                total = sum(g)
                h = 0
                for i, v in enumerate(g):
                    if v * 64 > total:
                        h |= 1 << i
                # two's-complement into a signed 64-bit long for Spark
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"doc_id": pdf[id_col], "phash": pd.array(hashes, dtype="int64")})

    return df.select(id_col, payload_col).mapInPandas(_hash, AHASH_SCHEMA)


def phash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
) -> DataFrame:
    """Image near-dup pairs by perceptual hash: aHash each payload, then the
    SAME pigeonhole banding machinery the text pipeline uses — in the
    DUPLICATE-ROBUST grouped form (:func:`dedup.simhash_pairs_grouped` with
    ``bits=64``): the banding join runs over DISTINCT hash values, so a
    million exact-duplicate images (one shared aHash — routine in real image
    corpora: logos, flat frames, re-posts) cost ONE row in the join instead
    of a quadratic band-bucket blow-up; equal-hash cliques re-enter as
    hamming-0 pairs by expansion. Candidates from a (band, value) equi-join,
    exact ``bit_count(xor)`` verify, zero false negatives within the radius
    (pigeonhole + lossless grouping, pytest-pinned pair-identical to the
    per-item join). One hash pass + one distinct-hash banding join: the
    at-scale shape for billion-image dedup (no pairwise scan anywhere)."""
    from iceberg_ingestion_spark.operators import dedup

    sigs = ahash64(df, id_col, payload_col).withColumnRenamed("phash", "simhash")
    return dedup.simhash_pairs_grouped(sigs, id_col, max_hamming=max_hamming, bits=64)

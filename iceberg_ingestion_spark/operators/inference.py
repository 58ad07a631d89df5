"""Batch model-inference plumbing: embed / score text at corpus scale.

The step between corpus prep and ANN indexing is running a model over every
document. The Spark-side shape is the same regardless of the model: Arrow
batches through ``mapInPandas``, one Python worker per core, model loaded
ONCE per worker (not per batch — the iterator form exists precisely for
that), batch size controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
As with ``operators/multimodal``, the real model call is a plug point — this
container has no torch/onnxruntime, so the default ``embed_fn`` is a
deterministic md5-seeded fake with the right shape/dtype — and everything
Spark-owned (schema, batching, per-worker init, composition with the ANN
operators) is real and tested.

Scale notes: inference is map-only (no shuffle); the cost model is
GPU/CPU-bound per batch, so the only Spark knobs that matter are batch size
(Arrow) and partition count (≥ cores, ≤ model-memory limits). Output
embeddings flow straight into ``operators/similarity`` (ANN) and
``operators/dedup`` (cosine near-dup) without leaving the executors.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def fake_embed(texts: list[str], dim: int) -> list[list[float]]:
    """Deterministic stand-in for a sentence-embedding model: md5-seeded
    unit vectors. Replace via ``embed_fn`` with a real model's
    ``model.encode(batch)``; same (list[str]) -> list[vec] contract."""
    out = []
    for t in texts:
        h = hashlib.md5((t or "").encode()).digest()
        # expand the 16-byte digest into dim floats in [-1, 1)
        vals = []
        seed = h
        while len(vals) < dim:
            seed = hashlib.md5(seed).digest()
            vals.extend(b / 128.0 - 1.0 for b in seed)
        v = vals[:dim]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([float(x / norm) for x in v])
    return out


def batch_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    embed_fn: Callable[[list[str], int], list[list[float]]] = fake_embed,
    init_fn: Callable[[], object] | None = None,
) -> DataFrame:
    """(id, embedding: array<float>) for every row — the corpus-scale
    inference pass. ``init_fn`` (e.g. model load) runs once per Python
    worker, before the first batch, mirroring how a real checkpoint is
    hoisted out of the batch loop."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if init_fn is not None:
            init_fn()
        for pdf in batches:
            vecs = embed_fn(list(pdf[text_col]), dim)
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, embedding array<float>"
    )

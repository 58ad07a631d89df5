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


#: Fixed stub-classifier parameters (VERDICT r7 #5): a logistic quality
#: classifier with DYADIC weights over INTEGER token stats. Every feature is
#: an exact integer count and every weight a power-of-two multiple, so the
#: log-odds z = bias + Σ w_i·f_i is EXACT in IEEE doubles regardless of
#: accumulation order — bit-equal between the Arrow-batched Python kernel
#: and the DuckDB oracle with no quantization step. The gate uses z >= 0
#: (sigmoid(z) >= 0.5 — monotone, so thresholding the logit IS the
#: logistic gate, with exp() and its 1-ulp cross-engine hazard never
#: evaluated). Swap in a real classifier via ``score_fn``/``init_fn``.
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in")
QUALITY_BIAS = -2.0
QUALITY_W_TOKENS = 0.03125    # 2**-5 per whitespace token
QUALITY_W_STOP = 0.25         # 2**-2 per stopword hit
QUALITY_W_DIGIT = -0.0625     # -2**-4 per digit char
QUALITY_W_PUNCT = -0.03125    # -2**-5 per [.,!?;:] char


def quality_logit(texts: list[str]) -> list[float]:
    """Deterministic stub classifier: the fixed-weight logistic log-odds
    over token stats. Feature conventions mirror the oracle SQL exactly:
    regex whitespace split of lower(trim(coalesce(text,''))) — note
    ``re.split(r'\\s+', '')`` gives ``['']`` like DuckDB/Spark's split,
    NOT Python ``str.split``'s ``[]`` — digit/punct counts over the raw
    coalesced text. The pre-split strip is ``strip(' ')`` (SPACES only),
    matching SQL ``trim``: bare ``str.strip()`` strips tabs/newlines too,
    which on tab/newline-padded text drops the empty edge token the SQL
    side keeps (ADVICE r8) — the bit-equal contract must hold on ALL
    inputs, not just the fixture corpus."""
    import re

    out = []
    for t in texts:
        t = t or ""
        toks = re.split(r"\s+", t.strip(" ").lower())
        z = (
            QUALITY_BIAS
            + QUALITY_W_TOKENS * len(toks)
            + QUALITY_W_STOP * sum(tok in QUALITY_STOPWORDS for tok in toks)
            + QUALITY_W_DIGIT * len(re.findall(r"[0-9]", t))
            + QUALITY_W_PUNCT * len(re.findall(r"[.,!?;:]", t))
        )
        out.append(float(z))
    return out


def quality_logit_sql(text_expr: str = "coalesce(text, '')") -> str:
    """The classifier's score arithmetic as a DuckDB SQL expression built
    from the SAME constants — the oracle recomputes the score exactly
    (integer features × dyadic weights: bit-equal doubles, no tolerance)."""
    toks = f"regexp_split_to_array(lower(trim({text_expr})), '\\s+')"
    stops = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop = f"len(list_filter({toks}, _t -> _t IN ({stops})))"
    n_digit = f"len(regexp_extract_all({text_expr}, '[0-9]'))"
    n_punct = f"len(regexp_extract_all({text_expr}, '[.,!?;:]'))"
    return (
        f"({QUALITY_BIAS!r} + {QUALITY_W_TOKENS!r} * len({toks})"
        f" + {QUALITY_W_STOP!r} * {n_stop}"
        f" + ({QUALITY_W_DIGIT!r}) * {n_digit}"
        f" + ({QUALITY_W_PUNCT!r}) * {n_punct})"
    )


def batch_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_fn: Callable[[list[str]], list[float]] = quality_logit,
    init_fn: Callable[[], object] | None = None,
) -> DataFrame:
    """(id, score: double) for every row — the model-scored quality-filter
    pass (VERDICT r7 #5), same seam shape as :func:`batch_embed`: Arrow
    batches through ``mapInPandas``, ``init_fn`` (model load) once per
    Python worker before the first batch, ``score_fn`` over each batch's
    text list. Compose with a threshold filter to gate the corpus; at
    scale this is map-only (no shuffle), the classifier-filter step every
    pretraining pipeline runs between crawl and training."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if init_fn is not None:
            init_fn()
        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "score": score_fn(list(pdf[text_col]))}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, score double"
    )


#: Dyadic weights for the stub PAIR scorer (cross-encoder stand-in): integer
#: overlap features × power-of-two weights keep the score exact in doubles
#: in any accumulation order — the same cross-engine-exactness trick as the
#: quality classifier.
RERANK_W_DISTINCT = 0.5     # 2**-1 per distinct query term present in the doc
RERANK_W_TOTAL = 0.03125    # 2**-5 per query-term occurrence in the doc


def pair_overlap_logit(lefts: list[str], rights: list[str]) -> list[float]:
    """Deterministic stand-in for a cross-encoder's ``model(query, doc)``
    relevance score: ``lefts`` are space-joined query terms, ``rights``
    raw document texts; score = 2⁻¹·|distinct query terms in doc| +
    2⁻⁵·(total query-term occurrences). Doc tokenization is the family
    convention (whitespace split of lower + strip-spaces); exact integer
    features × dyadic weights → bit-equal to the SQL recomputation."""
    import re
    from collections import Counter

    out = []
    for q, d in zip(lefts, rights):
        qset = set((q or "").split(" ")) - {""}
        c = Counter(re.split(r"\s+", (d or "").strip(" ").lower()))
        od = sum(1 for t in qset if c[t] > 0)
        ot = sum(c[t] for t in qset)
        out.append(float(RERANK_W_DISTINCT * od + RERANK_W_TOTAL * ot))
    return out


def pair_overlap_logit_sql(q_expr: str, d_expr: str) -> str:
    """The pair scorer as a DuckDB expression over (space-joined query
    terms, raw doc text) — same constants, exact integers, bit-equal."""
    qt = f"list_distinct(list_filter(string_split({q_expr}, ' '), _q -> _q <> ''))"
    dt = f"regexp_split_to_array(lower(trim({d_expr})), '\\s+')"
    od = f"len(list_filter({qt}, _t -> list_contains({dt}, _t)))"
    ot = f"list_sum(list_transform({qt}, _t -> len(list_filter({dt}, _x -> _x = _t))))"
    return (
        f"({RERANK_W_DISTINCT!r} * {od}"
        f" + {RERANK_W_TOTAL!r} * coalesce({ot}, 0))"
    )


def batch_score_pairs(
    df: DataFrame,
    id_cols: tuple[str, str] = ("query_id", "doc_id"),
    left_col: str = "query_text",
    right_col: str = "text",
    score_fn: Callable[[list[str], list[str]], list[float]] = pair_overlap_logit,
    init_fn: Callable[[], object] | None = None,
) -> DataFrame:
    """(id_cols..., score: double) for every PAIR row — the cross-encoder
    reranking seam, the fourth rider on this module's plumbing: a
    retrieve-then-rerank pipeline scores (query, candidate) PAIRS with a
    model too expensive for the full corpus but affordable on the
    candidate set. Arrow batches through ``mapInPandas``, ``init_fn``
    (checkpoint load) once per Python worker, ``score_fn(lefts, rights)``
    per batch. Map-only over the candidate relation — at scale the cost is
    |queries|·k model calls, never corpus-shaped."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if init_fn is not None:
            init_fn()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_cols[0]: pdf[id_cols[0]],
                    id_cols[1]: pdf[id_cols[1]],
                    "score": score_fn(list(pdf[left_col]), list(pdf[right_col])),
                }
            )

    dtypes = dict(df.dtypes)
    schema = (
        f"{id_cols[0]} {dtypes[id_cols[0]]}, "
        f"{id_cols[1]} {dtypes[id_cols[1]]}, score double"
    )
    return df.select(*id_cols, left_col, right_col).mapInPandas(run, schema=schema)


#: Stub-BPE granularity: ~4 chars per subtoken is the classic BPE rule of
#: thumb; the count is exact integer arithmetic so any engine recomputes it.
BPE_CHARS_PER_TOKEN = 4


def stub_bpe_count(texts: list[str]) -> list[int]:
    """Deterministic stand-in for a real tokenizer's ``len(encode(text))``
    (VERDICT r8 #7): whitespace words of lower(trim-spaces(text)), each
    contributing ``ceil(len(word)/4)`` subtokens — the BPE-shaped property
    that long words cost MORE than one token (whitespace counting, which
    the r1-r8 packing entries used, treats 'a' and
    'antidisestablishmentarianism' identically). Same whitespace class as
    :func:`quality_logit` (strip SPACES only — SQL ``trim``); the empty
    edge token costs 0. Swap in a real tokenizer via ``count_fn`` on
    :func:`batch_tokenize`."""
    import re

    out = []
    for t in texts:
        toks = re.split(r"\s+", (t or "").strip(" ").lower())
        out.append(
            sum(
                (len(w) + BPE_CHARS_PER_TOKEN - 1) // BPE_CHARS_PER_TOKEN
                for w in toks
            )
        )
    return out


def stub_bpe_count_sql(text_expr: str = "coalesce(text, '')") -> str:
    """The stub-BPE count as a DuckDB expression from the SAME constant —
    pure integer arithmetic, so the oracle recomputation is exact."""
    toks = f"regexp_split_to_array(lower(trim({text_expr})), '\\s+')"
    per = f"(len(w) + {BPE_CHARS_PER_TOKEN - 1}) // {BPE_CHARS_PER_TOKEN}"
    return f"CAST(list_sum(list_transform({toks}, w -> {per})) AS BIGINT)"


def batch_tokenize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_fn: Callable[[list[str]], list[int]] = stub_bpe_count,
    init_fn: Callable[[], object] | None = None,
) -> DataFrame:
    """(id, n_tokens: bigint) for every row — the tokenizer seam
    (VERDICT r8 #7), the third rider on the :func:`batch_score` /
    :func:`batch_embed` plumbing: Arrow batches through ``mapInPandas``,
    ``init_fn`` (tokenizer load — e.g. a BPE merges file) once per Python
    worker, ``count_fn`` over each batch's text list. Token counts drive
    packing budgets and quantile gates; at scale this is map-only, and the
    counts relation joins back to the corpus on the (uniform) id."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if init_fn is not None:
            init_fn()
        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_tokens": count_fn(list(pdf[text_col]))}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, n_tokens bigint"
    )


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

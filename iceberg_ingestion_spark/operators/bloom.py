"""Bloom-filter pruning for corpus-scale membership joins.

``corpus.contamination_counts`` broadcasts the *raw* benchmark n-gram set —
right when the eval suite is MBs. When the "benchmark" is itself large (a
held-out split, a blocklist of 10^8 URLs/n-grams: GBs of strings), the raw
broadcast stops fitting but a Bloom filter of it still does: m bits at ~10
bits/element is ~10x smaller than the strings, tunable. The pattern here is
the classic two-step:

1. **prune** the corpus side map-side against the Bloom filter of the
   benchmark keys (no false negatives — every true match survives; false
   positives pass at rate ~(1-e^{-kn/m})^k);
2. **confirm** the tiny surviving candidate set with an exact equi-join
   against the benchmark keys. The result is EXACT — the filter only
   reduces how many corpus rows reach the shuffle.

This is what Spark's runtime row-group filtering / bloom join does inside
the JVM for equi-joins it can see; expressing it explicitly makes it
available where the optimizer can't infer it (the key is a derived n-gram,
the build side is reused across many queries, or the filter is persisted
once and shipped to later jobs).

Engineering choices (all JVM-side — no Python in the hot path):

- The filter is kept RELATIONALLY, as the distinct set of set bit positions
  (``pos: long``) — at most ``m_bits`` rows regardless of benchmark size.
  Probing is ``k`` broadcast LEFT SEMI joins on the position columns:
  Catalyst turns each into a map-side broadcast-hash probe, so the corpus
  never shuffles. (A bit-packed array literal would be marginally smaller
  but leaves whole-stage codegen; the position set broadcasts once and is
  shared by all ``k`` probes.)
- Positions come from double hashing (Kirsch-Mitzenmacher): two 32-bit
  halves of ``md5(key)``, ``pos_i = (h1 + i*h2) mod m`` with ``h2`` forced
  odd — k independent-enough probes from one md5, and DuckDB/any engine can
  reproduce them bit-for-bit (pure md5 + integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POS_COL = "pos"


def _hash_pair(col: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from one md5: (h1, h2) with h2 odd."""
    hexd = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long")
    return h1, h2 * 2 + 1


def bloom_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """The ``k`` Bloom bit positions of ``col`` (long columns in [0, m_bits))."""
    h1, h2 = _hash_pair(col)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """The Bloom filter of ``df[col]`` as a relation of distinct set bit
    positions — bounded by ``m_bits`` rows however large ``df`` is. One
    distributed distinct; persist/reuse across queries as any DataFrame."""
    pos = bloom_positions(F.col(col), m_bits, k)
    return (
        df.select(F.explode(F.array(*pos)).alias(POS_COL))
        .distinct()
    )


def bloom_prune(df: DataFrame, col: str, bits: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Keep only rows of ``df`` whose ``col`` the Bloom filter MIGHT contain
    (all ``k`` positions set). No false negatives; map-side only — ``k``
    broadcast left-semi probes against the (≤ m_bits row) position set."""
    # materialize the k positions as columns first so the md5/conv pair is
    # evaluated once per row, not re-evaluated inside every join condition
    pos_cols = {f"_bp_pos{i}": p for i, p in enumerate(bloom_positions(F.col(col), m_bits, k))}
    out = df.withColumns(pos_cols)
    for i, name in enumerate(pos_cols):
        probe = bits.select(F.col(POS_COL).alias(f"_bp{i}"))
        out = out.join(
            F.broadcast(probe), on=F.col(name) == F.col(f"_bp{i}"), how="left_semi"
        )
    return out.drop(*pos_cols)


def contamination_counts_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Exactly ``corpus.contamination_counts`` (per-doc count of distinct word
    n-grams shared with the benchmark) for benchmarks too large to broadcast
    raw: Bloom-prune the corpus n-grams map-side, then confirm the survivors
    with an exact equi-join against the benchmark n-gram set.

    Plan: the only relation that shuffles on the corpus side is the pruned
    candidate set (true hits + ~FPR x non-hits); the benchmark n-grams
    shuffle once for the confirm join. Exact by the no-false-negative
    property + the confirm join."""
    from iceberg_ingestion_spark.operators.corpus import ngram_table

    corpus_grams = ngram_table(corpus, id_col, text_col, n)
    bench_grams = ngram_table(benchmark, id_col, text_col, n).select("ngram").distinct()
    bits = bloom_build(bench_grams, "ngram", m_bits, k)
    candidates = bloom_prune(corpus_grams, "ngram", bits, m_bits, k)
    return (
        candidates.join(bench_grams, "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )

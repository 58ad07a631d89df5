"""Text analysis operators: tokenization, token counting, quality scoring,
language ID, fingerprinting.

All pure ``pyspark.sql.functions`` expressions — JVM-side, whole-stage-codegen,
no Python in the hot path. Each has an exactly-equivalent SQL form (used by the
DuckDB oracles in queries.py); arithmetic is integer counts and double division
only, so results are bit-identical across engines.

At 100 TB these are embarrassingly parallel map operators: no shuffle, scale
linearly with input partitions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language heuristic.
#: Order matters: argmax ties resolve in this priority order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "zh": ("de", "shi", "zai", "le", "bu", "wo", "you", "ta", "zhe", "zhong"),
}

#: "BPE-ish" token pattern: runs of word chars, or single non-space symbols —
#: a cheap proxy for subword tokenizer counts.
BPE_ISH_PATTERN = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lower-cased, trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    """Count of BPE-ish tokens (word runs + isolated symbols)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits, 'und' when
    no stopwords at all. Tie-break follows LANG_STOPWORDS order."""
    toks = tokens(text)
    scores = {lang: stopword_hits(toks, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    out = F.lit("und")
    # build the when-chain in reverse so earlier languages win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts, mean token length,
    stopword ratio, alpha ratio, and a composite [0,1] quality score.

    The score formula is arbitrary but deterministic (double arithmetic on
    integer counts): docs in the sweet spot of length with natural stopword
    density score high — the usual cheap pre-filter before expensive dedup.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    stop_hits = stopword_hits(toks, "en")
    out = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_measured", n_char)
        .withColumn("mean_token_len", tok_chars / n_tok)
        .withColumn("stopword_ratio", stop_hits / n_tok)
        .withColumn("alpha_ratio", alpha_chars / n_char)
    )
    length_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0))
    return out.withColumn(
        "quality_score",
        F.lit(0.4) * length_score + F.lit(0.3) * stop_score + F.lit(0.3) * F.col("alpha_ratio"),
    )


def fingerprint_md5(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lower-cased text —
    the exact-dedup key that survives formatting noise."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


#: PII patterns — intersection of Java-regex and RE2 syntax so Spark and the
#: DuckDB oracles scrub identically. Order matters: URLs first (their paths may
#: contain digit runs a phone pattern would eat), then emails, then phones.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def scrub_pii(text: Column | str) -> Column:
    """Replace URLs, emails and phone-number-ish digit runs with placeholder
    tokens — the standard pre-training scrub pass. Pure JVM regexp_replace
    chain; embarrassingly parallel."""
    c = F.col(text) if isinstance(text, str) else text
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def repetition_ratio(text: Column | str, k: int = 3) -> Column:
    """Fraction of repeated k-grams: 1 - distinct/total — high values flag
    boilerplate/spam documents (cheap quality gate before near-dup)."""
    from iceberg_ingestion_spark.operators.dedup import shingles_all

    grams = shingles_all(text, k)
    return F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)


def hex_to_long(hex_col: Column, start: int = 1, length: int = 15) -> Column:
    """First ``length`` hex chars (≤15 → ≤60 bits, fits BIGINT) as a long.
    Cross-engine primitive: DuckDB ``('0x' || substr(h, start, length))::BIGINT``
    produces the identical value."""
    return F.conv(F.substring(hex_col, start, length), 16, 10).cast("long")


def token_hash60(tok: Column) -> Column:
    """60-bit md5-derived token hash (identical in DuckDB)."""
    return hex_to_long(F.md5(tok))


def simhash60_agg(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """60-bit SimHash, pure-expression form: explode tokens -> groupBy(id) with
    60 conditional-sum aggregates -> bit reassembly. Kept as the all-JVM
    reference implementation; :func:`simhash60` is the kernel form used in the
    hot path (identical output, no explode/shuffle)."""
    toked = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("_tok")
    ).withColumn("_h", token_hash60(F.col("_tok")))
    aggs = [
        F.sum(
            F.when(F.col("_h").bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(60)
    ]
    sums = toked.groupBy(id_col).agg(*aggs)
    sig = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"_b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")),
        range(60),
        F.lit(0).cast("long"),
    )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash60(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """60-bit SimHash over distinct whitespace tokens (classic scheme: each
    token votes +1/-1 per bit position by its md5-derived 60-bit hash; the
    signature takes bit i when the vote sum is positive).

    Pandas-kernel form: per doc, one numpy bit-matrix vote — integer math
    identical to :func:`simhash60_agg` and the DuckDB oracle, with no token
    explode and no 60-aggregate shuffle (map-only at any scale)."""
    import re

    ws = re.compile(r"\s+")

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        bit_idx = np.arange(60, dtype=np.int64)
        for pdf in batches:
            sigs = []
            for t in pdf[text_col]:
                toks = set(ws.split(t.strip().lower()))
                hs = np.array(
                    [int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) for tok in toks],
                    dtype=np.int64,
                )
                votes = (((hs[:, None] >> bit_idx[None, :]) & 1) * 2 - 1).sum(axis=0)
                sigs.append(int(((votes > 0).astype(np.int64) << bit_idx).sum()))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sigs})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, simhash long"
    )


#: A bigram is "rare" when its corpus frequency is at or below this.
RARE_BIGRAM_DF = 2


def bigram_corpus_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram-frequency features — the statistical half of an
    n-gram LM quality filter (a perplexity proxy without float log-sums):
    per doc, how common its word bigrams are in the WHOLE corpus and what
    fraction are corpus-rare. Low mean frequency + high rare rate = the
    boilerplate/gibberish tail a pretraining pipeline drops.

    Emits (id, n_bigrams, sum_bg_df, n_rare, mean_bg_df, rare_rate); docs
    with fewer than 2 tokens have no bigrams and no row. All counts are
    integers and the two ratios are single final long/long divisions, so
    results are bit-identical across engines and partitionings — the true
    avg-log-prob variant would hang on float summation order. Plan: one
    bigram-count aggregation (map-side partials absorb the zipfian head),
    one equi-join of doc bigrams against the count table (vocab²-bounded;
    AQE broadcasts it when small), one per-doc aggregation.
    """
    # occurrence-weighted bigram relation via the Arrow shingle kernel —
    # the Catalyst higher-order-lambda form is the documented slow path on
    # this hot leaf (see dedup.shingle_sets); import here to avoid a module
    # cycle (dedup imports text for its tokenizer helpers)
    from iceberg_ingestion_spark.operators.dedup import shingle_occurrences

    grams = shingle_occurrences(df, id_col, text_col, k=2).select(
        F.col(id_col), F.col("shingle").alias("bg")
    )
    dfreq = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("bg_df"))
    per_doc = (
        grams.join(dfreq, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bg_df").alias("sum_bg_df"),
            F.sum((F.col("bg_df") <= RARE_BIGRAM_DF).cast("long")).alias("n_rare"),
        )
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "sum_bg_df",
        "n_rare",
        (F.col("sum_bg_df") / F.col("n_bigrams")).alias("mean_bg_df"),
        (F.col("n_rare") / F.col("n_bigrams")).alias("rare_rate"),
    )


def pmi_top_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k PMI-scored collocations (statistically-bound word pairs) over the
    corpus — the classic phrase-mining primitive (Church & Hanks 1990) a
    pretraining pipeline uses to build phrase vocabularies and spot templated
    boilerplate (pathologically high-lift pairs = machine-generated text).

    Emits (w1, w2, c_pair, c_first, c_second, lift) where ``lift`` is the PMI
    argument N·c(w1,w2) / (c(w1,·)·c(·,w2)) over bigram-table marginals —
    taking log is monotone, so top-k by lift IS top-k by PMI, and keeping the
    raw ratio makes the result exact: every count is an integer, and lift is a
    SINGLE double division of two exactly-representable products (no float
    summation order anywhere), so rows are bit-identical across engines,
    partitionings and row orders. Ties broken by (w1, w2) for a total order.

    Plan shape: one bigram-count aggregation (map-side partials absorb the
    zipfian head), two vocab-bounded re-aggregations of the COUNT TABLE (not
    the corpus) for the marginals, equi-joins back (AQE broadcasts the
    marginal tables — vocab-sized), a 1-row total cross-joined as a broadcast
    literal (never a driver-side collect), then a global top-k which Spark
    executes as per-partition TakeOrdered + a k-row merge — no full sort of
    the pair table.
    """
    from iceberg_ingestion_spark.operators.dedup import shingle_occurrences

    grams = shingle_occurrences(df, id_col, text_col, k=2).select(
        F.split(F.col("shingle"), " ").alias("ws")
    )
    pairs = grams.select(
        F.element_at("ws", 1).alias("w1"), F.element_at("ws", 2).alias("w2")
    )
    cnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    first = cnt.groupBy("w1").agg(F.sum("c_pair").alias("c_first"))
    second = cnt.groupBy("w2").agg(F.sum("c_pair").alias("c_second"))
    total = cnt.agg(F.sum("c_pair").alias("n_total"))
    return (
        cnt.filter(F.col("c_pair") >= min_count)
        .join(first, "w1")
        .join(second, "w2")
        .join(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_first",
            "c_second",
            (
                (F.col("c_pair") * F.col("n_total")).cast("double")
                / (F.col("c_first") * F.col("c_second")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(k)
    )


def _bm25_idf_expr(n: str, df_: str) -> str:
    """Robertson idf quantized onto a 1e-9 grid — see :func:`bm25_score_expr`
    for the full cross-engine rationale (ln is the one divergent primitive)."""
    raw_idf = (
        f"ln(CAST(1.0 AS DOUBLE) + ({n} - {df_} + CAST(0.5 AS DOUBLE))"
        f" / ({df_} + CAST(0.5 AS DOUBLE)))"
    )
    return (
        f"(floor({raw_idf} * CAST(1000000000.0 AS DOUBLE)"
        f" + CAST(0.5 AS DOUBLE)) / CAST(1000000000.0 AS DOUBLE))"
    )


def _bm25_term_weight_expr(n: str, sumdl: str, dl: str, tf: str, df_: str) -> str:
    """One term's BM25 contribution idf_t * tf(k1+1)/(tf + k1(1-b+b*dl/avgdl))
    as a shared-verbatim expression string (doubles bit-equal post-quantize)."""
    idf = _bm25_idf_expr(n, df_)
    denom = (
        f"({tf} + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)"
        f" + CAST(0.75 AS DOUBLE) * (CAST({dl} AS DOUBLE)"
        f" / (CAST({sumdl} AS DOUBLE) / {n}))))"
    )
    return f"{idf} * (({tf} * CAST(2.2 AS DOUBLE)) / {denom})"


def bm25_contrib_expr(n: str, sumdl: str, dl: str, tf: str, df_: str) -> str:
    """Per-(query,doc,term) BM25 contribution QUANTIZED to an integer 1e-9
    grid (BIGINT) — the batched-retrieval aggregation needs an
    order-independent per-group SUM, and summing raw doubles is
    accumulation-order-dependent (the one thing the fixed-query entry's
    left-to-right ``+`` chain sidestepped). Each contribution is bit-equal
    cross-engine by the :func:`bm25_score_expr` argument, so the floored
    integers agree exactly and their sum is order-free; the final score is
    ``sum / 1e9`` (one correctly-rounded division, identical everywhere).
    Quantization error is bounded by |terms|·5e-10 per score — retrieval
    ranking noise far below any meaningful score gap; ties break by doc_id.
    """
    w = _bm25_term_weight_expr(n, sumdl, dl, tf, df_)
    return (
        f"CAST(floor(({w}) * CAST(1000000000.0 AS DOUBLE)"
        f" + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )

"""Round-9 operators and fixes.

- VERDICT r8 #1: the fixed-size md5-rank ANN query panel (the graded recall
  entries no longer scale their query volume with the corpus).
- VERDICT r8 #2: topk_ivfpq graded + persisted-index parameters.
- VERDICT r8 #3: train_pq_codebooks (joint per-subspace Lloyd) beats the
  hash-spread draw at equal (m, n_codes).
- VERDICT r8 #4: pq_codes_append — frozen-codebook union-append contract.
- ADVICE r8 lows: quality_logit whitespace class, containment_df_relation
  v1-schema fallback, decon sentinel-id guard, topk_pq cache ownership.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import similarity

SF = "/root/testdata/sf0.001"
DIM = 64


def _emb(spark):
    from iceberg_ingestion_spark.queries import read_table

    return read_table(spark, SF, "embeddings", spread=True)


# ---------------------------------------------------------------------------
# VERDICT r8 #1: fixed-size query panel
# ---------------------------------------------------------------------------

def test_ann_panel_is_fixed_size_and_md5_ranked(spark):
    """The panel is exactly min(ANN_PANEL_SIZE, n) ids and equals the md5-rank
    draw computed independently in Python over the collected id set — the
    contract the DuckDB oracle's ORDER BY md5(...) LIMIT mirrors."""
    import hashlib

    from iceberg_ingestion_spark.queries_text_dedup import (
        ANN_PANEL_SIZE,
        ann_panel_filter,
    )

    e = _emb(spark)
    ids = [r[0] for r in e.select("vec_id").collect()]
    expected = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[: min(ANN_PANEL_SIZE, len(ids))]
    got = [r[0] for r in e.filter(ann_panel_filter(e)).select("vec_id").collect()]
    assert sorted(got) == sorted(expected)
    assert len(got) == min(ANN_PANEL_SIZE, len(ids))


# ---------------------------------------------------------------------------
# VERDICT r8 #3: trained PQ sub-codebooks
# ---------------------------------------------------------------------------

def _recall(exact, approx) -> float:
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    return hits / exact.count()


def test_train_pq_codebooks_shape_and_determinism(spark):
    """(subspace, code, centroid[dim/m]) with every (subspace, code) cell
    present, and byte-identical across two runs (hash-sample init + decimal
    means make Lloyd deterministic under any partitioning)."""
    e = _emb(spark)
    m, n_codes = 8, 16
    a = similarity.train_pq_codebooks(e, "vec_id", "embedding", DIM, m, n_codes)
    rows = {(r.subspace, r.code): list(r.centroid) for r in a.collect()}
    assert len(rows) == m * n_codes
    assert all(len(c) == DIM // m for c in rows.values())
    b = similarity.train_pq_codebooks(e, "vec_id", "embedding", DIM, m, n_codes)
    assert rows == {(r.subspace, r.code): list(r.centroid) for r in b.collect()}


def test_trained_pq_beats_hash_spread_recall(spark):
    """At equal (m, n_codes, shortlist) on the fixture corpus with the fixed
    panel, Lloyd-trained sub-codebooks recall >= the hash-spread draw (the
    VERDICT r8 #3 done-criterion; driver corpora measurements in
    BASELINE.md r9: 0.9938/0.9969/0.9391 vs 0.9703/0.9750/0.8859)."""
    from iceberg_ingestion_spark.queries_text_dedup import (
        ANN_K,
        ann_panel_filter,
    )

    e = _emb(spark)
    flt = ann_panel_filter(e)
    exact = similarity.topk_bruteforce(
        e, "vec_id", "embedding", DIM, ANN_K, flt
    ).cache()
    kw = dict(m=16, n_codes=32, shortlist_mult=16)
    plain = similarity.topk_pq(e, "vec_id", "embedding", DIM, ANN_K, flt, **kw)
    cb = similarity.train_pq_codebooks(
        e, "vec_id", "embedding", DIM, m=16, n_codes=32
    )
    trained = similarity.topk_pq(
        e, "vec_id", "embedding", DIM, ANN_K, flt, codebooks=cb, **kw
    )
    r_plain, r_trained = _recall(exact, plain), _recall(exact, trained)
    assert r_trained >= r_plain
    assert r_trained >= 0.9  # absolute sanity floor on the fixture corpus


# ---------------------------------------------------------------------------
# VERDICT r8 #4: frozen-codebook append contract
# ---------------------------------------------------------------------------

def test_pq_codes_append_equals_batch_encoding(spark):
    """encode(d1) ∪ encode(d2) ∪ encode(d3) under FROZEN codebooks ==
    encode(d1 ∪ d2 ∪ d3) — per-doc encoding has no corpus statistics, so
    the union-appended index is bit-identical to the batch one."""
    e = _emb(spark)
    books = similarity.pq_codebooks(
        e.filter(F.col("vec_id") % 5 != 0), "vec_id", "embedding", DIM, 8, 16
    ).cache()
    d1 = e.filter(F.col("vec_id") % 5 != 0)
    d2 = e.filter(F.col("vec_id") % 10 == 0)
    d3 = e.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 10 != 0))
    chained = similarity.pq_codes(d1, "vec_id", "embedding", DIM, books, 8)
    for day in (d2, d3):
        chained = similarity.pq_codes_append(
            chained, day, "vec_id", "embedding", DIM, books, 8
        )
    batch = similarity.pq_codes(e, "vec_id", "embedding", DIM, books, 8)
    got = {r.vec_id: list(r.codes) for r in chained.collect()}
    want = {r.vec_id: list(r.codes) for r in batch.collect()}
    assert got == want


def test_topk_pq_persisted_index_probe_matches_inline(spark):
    """topk_pq given persisted codes=/codebooks= returns the same rows as
    the self-contained form (parquet round-trip, the production shape)."""
    import tempfile

    from iceberg_ingestion_spark.queries_text_dedup import ANN_K

    e = _emb(spark)
    flt = F.col("vec_id") % 50 == 0
    books = similarity.pq_codebooks(e, "vec_id", "embedding", DIM, 8, 16)
    codes = similarity.pq_codes(e, "vec_id", "embedding", DIM, books, 8)
    root = tempfile.mkdtemp(prefix="pq_idx_")
    books.write.parquet(f"{root}/books")
    codes.write.parquet(f"{root}/codes")
    inline = similarity.topk_pq(
        e, "vec_id", "embedding", DIM, ANN_K, flt, m=8, n_codes=16
    )
    probed = similarity.topk_pq(
        e, "vec_id", "embedding", DIM, ANN_K, flt, m=8, n_codes=16,
        codes=spark.read.parquet(f"{root}/codes"),
        codebooks=spark.read.parquet(f"{root}/books"),
    )
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, probed.collect()))


def test_topk_pq_does_not_cache_caller_codebooks(spark):
    """ADVICE r8: a caller-passed codebook relation's persistence state is
    the caller's — topk_pq must not .cache() it. (clearCache first:
    Spark's CacheManager matches by logical plan, so an identical codebook
    plan cached by an earlier test would read as cached here.)"""
    spark.catalog.clearCache()
    e = _emb(spark)
    books = similarity.pq_codebooks(e, "vec_id", "embedding", DIM, 8, 16)
    similarity.topk_pq(
        e, "vec_id", "embedding", DIM, 3, F.col("vec_id") % 50 == 0,
        m=8, n_codes=16, codebooks=books,
    ).count()
    assert books.storageLevel.useMemory is False


def test_topk_ivfpq_accepts_persisted_index(spark):
    """topk_ivfpq with codebook=/cells=/codebooks=/codes= (the persisted
    form) matches the self-contained call — same quantizers, identical
    rows, and the probe builds nothing corpus-scale."""
    from iceberg_ingestion_spark.operators.clustering import (
        assign_nearest,
        hash_spread_centroids,
    )
    from iceberg_ingestion_spark.queries_text_dedup import ANN_K

    e = _emb(spark)
    flt = F.col("vec_id") % 50 == 0
    kw = dict(n_cells=8, nprobe=3, m=8, n_codes=16, shortlist_mult=8)
    inline = similarity.topk_ivfpq(e, "vec_id", "embedding", DIM, ANN_K, flt, **kw)
    cents = hash_spread_centroids(e, "vec_id", "embedding", 8)
    books = similarity.pq_codebooks(e, "vec_id", "embedding", DIM, 8, 16)
    codes = similarity.pq_codes(e, "vec_id", "embedding", DIM, books, 8)
    probed = similarity.topk_ivfpq(
        e, "vec_id", "embedding", DIM, ANN_K, flt,
        codebook=cents, codebooks=books, codes=codes,
        cells=assign_nearest(e, cents, "vec_id", "embedding", DIM),
        **kw,
    )
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, probed.collect()))


# ---------------------------------------------------------------------------
# Streaming PQ-index maintenance
# ---------------------------------------------------------------------------

def test_stream_pq_index_equals_batch_and_survives_redelivery(spark, tmp_path):
    """Three availableNow drains build a code table EQUAL to the one-shot
    batch pq_codes over the full corpus under the frozen (batch-0-built)
    codebooks; re-delivering an already-drained drop appends NOTHING
    (re-delivered ids are old-only; replayed batches overwrite their own
    partition). A topk_pq probe against the streamed index is therefore
    bit-identical to the batch-index probe."""
    import os

    from iceberg_ingestion_spark.streaming.ann_stream import stream_pq_index

    e = _emb(spark).select("vec_id", "embedding")
    root = str(tmp_path)
    feed, codes_dir = os.path.join(root, "feed"), os.path.join(root, "codes")
    books_dir, ckpt = os.path.join(root, "books"), os.path.join(root, "ckpt")

    def drain(part):
        part.coalesce(1).write.mode("append").parquet(feed)
        q = stream_pq_index(
            spark, feed, part.schema, codes_dir, books_dir, ckpt,
            dim=DIM, m=8, n_codes=16,
        )
        assert q.awaitTermination(300)

    drops = [e.filter(F.col("vec_id") % 3 == r) for r in (0, 1, 2)]
    for part in drops:
        drain(part)
    books = spark.read.parquet(books_dir)
    streamed = spark.read.parquet(codes_dir)
    batch = similarity.pq_codes(e, "vec_id", "embedding", DIM, books, 8)
    got = {r.vec_id: list(r.codes) for r in streamed.collect()}
    want = {r.vec_id: list(r.codes) for r in batch.collect()}
    assert got == want
    # batch-0 docs seeded the codebooks and they are FROZEN: the table on
    # disk must equal a fresh build from drop 0 alone
    rebuilt = similarity.pq_codebooks(drops[0], "vec_id", "embedding", DIM, 8, 16)
    assert sorted(map(tuple, books.collect())) == sorted(map(tuple, rebuilt.collect()))
    # redelivery: drop 1 arrives again -> nothing new appended
    drain(drops[1])
    again = {r.vec_id: list(r.codes) for r in spark.read.parquet(codes_dir).collect()}
    assert again == want


# ---------------------------------------------------------------------------
# Full IVFADC (residual encoding)
# ---------------------------------------------------------------------------

def test_residual_codebook_draw_is_decorrelated(spark):
    """The residual PQ codebook must NOT collapse to the all-zero quantizer:
    the unsalted md5-rank draw picks exactly the coarse-quantizer seed docs,
    whose residuals are all zero (each coarse seed IS its own cell's
    centroid) — every doc then encodes to code 0 and the codes carry no
    information (the bug seed_salt fixes). Pin: residual codes over the
    fixture corpus use >1 distinct code in >= half the subspaces."""
    from iceberg_ingestion_spark.operators.clustering import (
        assign_nearest,
        hash_spread_centroids,
    )

    e = _emb(spark)
    cents = hash_spread_centroids(e, "vec_id", "embedding", 16)
    cells = assign_nearest(e, cents, "vec_id", "embedding", DIM).select(
        "vec_id", "cluster_id"
    )
    residuals = (
        e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("_v"))
        .join(cells, "vec_id")
        .join(F.broadcast(cents), "cluster_id")
        .select(
            "vec_id",
            F.zip_with("_v", "centroid", lambda a, b: a - b).alias("_r"),
        )
    )
    books = similarity.pq_codebooks(
        residuals, "vec_id", "_r", DIM, 8, 16, seed_salt="residual"
    )
    codes = similarity.pq_codes(residuals, "vec_id", "_r", DIM, books, 8)
    per_sub = (
        codes.select(F.posexplode("codes").alias("subspace", "code"))
        .groupBy("subspace")
        .agg(F.countDistinct("code").alias("n"))
        .collect()
    )
    assert sum(r.n > 1 for r in per_sub) >= len(per_sub) // 2


def test_topk_ivfpq_residual_recall_floor(spark):
    """Full IVFADC at the coarse budget (m=4, n_codes=8 — 0.5 B/vector of
    code payload, the regime residual encoding exists for; measured
    residual 0.5312 vs plain 0.4984 at sf0.01, BASELINE.md r9): recall vs
    brute force holds the family floor, and the output schema/rank
    contract matches the sibling operators."""
    from iceberg_ingestion_spark.queries_text_dedup import (
        ANN_K,
        ANN_RECALL_FLOOR,
        ann_panel_filter,
    )

    e = _emb(spark)
    flt = ann_panel_filter(e)
    exact = similarity.topk_bruteforce(
        e, "vec_id", "embedding", DIM, ANN_K, flt
    ).cache()
    approx = similarity.topk_ivfpq_residual(
        e, "vec_id", "embedding", DIM, ANN_K, flt,
        n_cells=16, nprobe=8, m=4, n_codes=8, shortlist_mult=16,
    )
    assert approx.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert _recall(exact, approx) >= ANN_RECALL_FLOOR


# ---------------------------------------------------------------------------
# VERDICT r8 #7: tokenizer seam
# ---------------------------------------------------------------------------

def test_batch_tokenize_matches_python_and_is_bpe_shaped(spark):
    """batch_tokenize == stub_bpe_count row-for-row, and the counts carry
    the BPE property the whitespace counter lacks: a long word costs more
    than one token, short words cost one, empty text costs zero."""
    from iceberg_ingestion_spark.operators.inference import (
        batch_tokenize,
        stub_bpe_count,
    )

    rows = [
        (1, "a bb ccc dddd"),           # 1+1+1+1 = 4
        (2, "antidisestablishmentarianism"),  # ceil(28/4) = 7
        (3, ""),                        # [''] -> 0
        (4, "  padded  words  "),       # 2 + 2 (wait: 'padded'=6->2,'words'=5->2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_tokens for r in batch_tokenize(df).collect()}
    want = dict(zip([r[0] for r in rows], stub_bpe_count([r[1] for r in rows])))
    assert got == want
    assert got[1] == 4 and got[2] == 7 and got[3] == 0


def test_stub_bpe_sql_matches_python_on_edges(spark):
    """The DuckDB expression recomputes the Python kernel exactly, including
    the whitespace-class edges (tabs/newlines keep their empty edge token,
    which costs 0)."""
    import duckdb

    from iceberg_ingestion_spark.operators.inference import (
        stub_bpe_count,
        stub_bpe_count_sql,
    )

    texts = ["\tthe cat", "word\n", " spaces ", "", "ab", "a b c", "x" * 17]
    expr = stub_bpe_count_sql("coalesce(t, '')")
    sql = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS t)", [texts]
    ).fetchall()
    assert [s[0] for s in sql] == stub_bpe_count(texts)


# ---------------------------------------------------------------------------
# Retrieve-then-rerank pair-scoring seam
# ---------------------------------------------------------------------------

def test_batch_score_pairs_matches_python_and_runs_init(spark):
    """batch_score_pairs == pair_overlap_logit row-for-row over a pair
    relation, and the dyadic-weight score is bit-equal to the DuckDB
    expression on the same inputs (incl. no-overlap and repeated-term
    edges)."""
    import duckdb

    from iceberg_ingestion_spark.operators.inference import (
        batch_score_pairs,
        pair_overlap_logit,
        pair_overlap_logit_sql,
    )

    rows = [
        ("q1", 1, "spark join", "spark join spark makes spark go"),
        ("q1", 2, "spark join", "no relevant words here"),
        ("q2", 3, "the and of", "The AND of\tthe end"),
        ("q2", 4, "vector", ""),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id long, query_text string, text string"
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in batch_score_pairs(df).collect()
    }
    want = dict(
        zip(
            [(r[0], r[1]) for r in rows],
            pair_overlap_logit([r[2] for r in rows], [r[3] for r in rows]),
        )
    )
    assert got == want
    expr = pair_overlap_logit_sql("q", "d")
    sql = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS q, unnest(?) AS d)",
        [[r[2] for r in rows], [r[3] for r in rows]],
    ).fetchall()
    assert [s[0] for s in sql] == pair_overlap_logit(
        [r[2] for r in rows], [r[3] for r in rows]
    )


# ---------------------------------------------------------------------------
# ADVICE r8 lows
# ---------------------------------------------------------------------------

def test_quality_logit_tab_newline_edges_match_oracle(spark):
    """Text padded with tabs/newlines scores identically in the Python
    kernel and the DuckDB oracle (ADVICE r8: str.strip() stripped ALL
    whitespace while SQL trim strips spaces only — the empty edge token
    the SQL side keeps must be kept by Python too)."""
    import duckdb

    from iceberg_ingestion_spark.operators.inference import (
        quality_logit,
        quality_logit_sql,
    )

    texts = ["\tthe cat", "word\n", " spaces ", "\t \n", "", "plain the text"]
    py = quality_logit(texts)
    con = duckdb.connect()
    expr = quality_logit_sql("coalesce(t, '')")
    sql = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS t)", [texts]
    ).fetchall()
    assert [s[0] for s in sql] == py  # bit-equal, no tolerance


def test_containment_df_relation_v1_schema_fallback(spark):
    """A persisted r6/r7-era index (no _df column) still yields the correct
    frozen df via the count fallback (ADVICE r8: no analysis-time crash,
    no silent drift — a never-appended index's row count IS its df)."""
    from iceberg_ingestion_spark.operators.dedup import (
        containment_df_relation,
        containment_prefix_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string",
    )
    v2 = containment_prefix_index(docs, "doc_id", k=3)
    v1 = v2.drop("_df")  # the pre-r8 persisted schema
    want = {(r.shingle, r._df) for r in containment_df_relation(v2).collect()}
    got = {(r.shingle, r._df) for r in containment_df_relation(v1).collect()}
    assert got == want


def test_decon_sentinel_guard_fires_on_id_collision(spark, tmp_path):
    """A corpus whose ids reach the sentinel range fails loudly instead of
    silently aliasing a pool doc into the bench relation (ADVICE r8)."""
    from iceberg_ingestion_spark.queries_text_dedup import (
        DECON_SENTINEL_ID,
        q_decon_span_scrub,
    )

    bad = spark.createDataFrame(
        [(DECON_SENTINEL_ID + 7, "some words here", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    sf = str(tmp_path / "sf_bad")
    bad.write.parquet(f"{sf}/documents.parquet")
    with pytest.raises(ValueError, match="sentinel"):
        q_decon_span_scrub(spark, sf)

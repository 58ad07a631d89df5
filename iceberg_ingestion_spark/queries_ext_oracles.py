"""DuckDB oracles for the extension registry (split out of queries_ext.py in
round 5 — pure mechanical move; see each themed module for the Spark side)."""

from __future__ import annotations

from iceberg_ingestion_spark.queries_text_dedup import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_events_ts import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_corpus_mm import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_ext_sql import (  # noqa: F401
    _TOKS, _BPE, _NORM, _JACCARD_CTE, _SESSION_CTE, _BRUTEFORCE_TOPK_SQL, _ANN_RECALL_ORACLE, _stop_hits_sql, _lang_case_sql, _simhash_sql, _dot_sql, _cosine_sql, _sqdist_sql,
)

#: near-dup canonical-survivor labels for EVERY doc (singletons keep): the
#: exact-pair closure of the dedup_clusters oracle, left-joined to the corpus
_NEARDUP_KEEP_CTE = _JACCARD_CTE + f""",
p AS (SELECT id_1, id_2 FROM jac WHERE jaccard >= {MINHASH_THRESHOLD}),
edges AS (SELECT id_1 AS src, id_2 AS dst FROM p UNION SELECT id_2, id_1 FROM p),
reach AS (SELECT src AS id, dst AS r FROM edges UNION SELECT src AS id, src AS r FROM edges),
closure AS (
    WITH RECURSIVE walk(id, r) AS (
        SELECT id, r FROM reach
        UNION
        SELECT walk.id, edges.dst FROM walk JOIN edges ON walk.r = edges.src
    )
    SELECT id, min(r) AS component FROM walk GROUP BY id
),
canon AS (
    SELECT d.doc_id, coalesce(c.component, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN closure c ON c.id = d.doc_id
)
"""

ORACLES_EXT: dict[str, str] = {
    # funnel stages are cumulative conditional sums over ONE scan; the dedup
    # stage joins the same near-dup closure the dedup_clusters oracle uses
    "corpus_quality_funnel": _NEARDUP_KEEP_CTE + f""",
        flags AS (
            SELECT d.doc_id,
                   (d.text IS NOT NULL AND length(d.text) > 0) AS f1,
                   ((d.text IS NOT NULL AND length(d.text) > 0)
                    AND {_lang_case_sql()} <> 'und') AS f2,
                   ((d.text IS NOT NULL AND length(d.text) > 0)
                    AND {_lang_case_sql()} <> 'und'
                    AND len({_TOKS}) >= {FUNNEL_MIN_TOKENS}) AS f3
            FROM documents d
        ),
        agg AS (
            SELECT count(*) AS c0,
                   sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS c1,
                   sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS c2,
                   sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS c3,
                   sum(CASE WHEN f3 AND keep THEN 1 ELSE 0 END) AS c4
            FROM flags JOIN canon USING (doc_id)
        )
        SELECT CAST(0 AS BIGINT) AS stage_idx, 'total' AS stage, CAST(c0 AS BIGINT) AS n_surviving FROM agg
        UNION ALL SELECT CAST(1 AS BIGINT), 'nonempty', CAST(c1 AS BIGINT) FROM agg
        UNION ALL SELECT CAST(2 AS BIGINT), 'lang_known', CAST(c2 AS BIGINT) FROM agg
        UNION ALL SELECT CAST(3 AS BIGINT), 'min_tokens', CAST(c3 AS BIGINT) FROM agg
        UNION ALL SELECT CAST(4 AS BIGINT), 'neardup_canonical', CAST(c4 AS BIGINT) FROM agg
    """,
    "corpus_dedup_by_source": _NEARDUP_KEEP_CTE + """
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS drop_rate
        FROM documents d JOIN canon USING (doc_id)
        GROUP BY d.source
    """,
    "text_token_counts": f"""
        SELECT doc_id, len({_TOKS}) AS n_tokens_ws, len({_BPE}) AS n_tokens_bpe
        FROM documents
    """,
    "text_quality": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks, length(text) AS n_char,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
                   {_stop_hits_sql('en')} AS stop_hits
            FROM documents
        ), feats AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   list_sum(list_transform(toks, _t -> length(_t))) * 1.0 / len(toks) AS mean_token_len,
                   stop_hits * 1.0 / len(toks) AS stopword_ratio,
                   alpha_chars * 1.0 / n_char AS alpha_ratio
            FROM t
        )
        SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, alpha_ratio,
               0.4 * least(n_tokens / 50.0, 1.0) + 0.3 * least(stopword_ratio * 4.0, 1.0)
                   + 0.3 * alpha_ratio AS quality_score
        FROM feats
    """,
    "text_lang_id": f"SELECT doc_id, lang, {_lang_case_sql()} AS lang_pred FROM documents",
    "text_fingerprint": f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
    "text_pii_scrub": """
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           text || ' see https://ex.com/p/' || doc_id
                                || ' mail user' || doc_id || '@example.com'
                                || ' call +12 345 6789 0',
                           'https?://[^\\s]+', '<URL>', 'g'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g') AS scrubbed
        FROM documents
    """,
    "text_bigram_corpus_freq": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        ex AS (
            SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
            FROM toks WHERE len(t) >= 2
        ),
        dfreq AS (SELECT bg, count(*) AS bg_df FROM ex GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_bigrams,
               CAST(sum(bg_df) AS BIGINT) AS sum_bg_df,
               CAST(count(*) FILTER (bg_df <= 2) AS BIGINT) AS n_rare,
               CAST(sum(bg_df) AS BIGINT) / count(*) AS mean_bg_df,
               CAST(count(*) FILTER (bg_df <= 2) AS BIGINT) / count(*) AS rare_rate
        FROM ex JOIN dfreq USING (bg)
        GROUP BY doc_id
    """,
    "text_repetition": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        grams AS (
            SELECT doc_id,
                   [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)] AS g
            FROM toks
        )
        SELECT doc_id, 1.0 - len(list_distinct(g)) / len(g) AS repetition_ratio
        FROM grams
    """,
    "dedup_exact": """
        WITH doubled AS (
            SELECT text, lang FROM documents
            UNION ALL SELECT text, lang FROM documents
        )
        SELECT lang, count(*) AS n_docs FROM (SELECT DISTINCT text, lang FROM doubled)
        GROUP BY lang
    """,
    "dedup_fingerprint_groups": f"""
        WITH doubled AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents
        )
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS dedup_key,
               min(doc_id) AS keep_id, count(*) AS dup_count
        FROM doubled GROUP BY 1 HAVING count(*) >= 2
    """,
    "dedup_ngram_jaccard": _JACCARD_CTE
    + f"SELECT id_1, id_2, jaccard FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}",
    # prefix filtering is recall-lossless (prefix lemma), so the exact pair
    # set is the oracle — identical to the capped-index entry's
    "dedup_jaccard_prefix": _JACCARD_CTE
    + f"SELECT id_1, id_2, jaccard FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}",
    # cum window runs over the LIMITed top-K prefix of the (freq desc, token)
    # order — identical to Spark's window over the post-limit relation
    "text_vocab_coverage": f"""
        WITH occ AS (SELECT unnest({_TOKS}) AS token FROM documents),
        counts AS (SELECT token, count(*) AS freq FROM occ GROUP BY token),
        tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM counts),
        top AS (SELECT token, freq FROM counts ORDER BY freq DESC, token LIMIT {VOCAB_TOP_K})
        SELECT token, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
               CAST(sum(freq) OVER (ORDER BY freq DESC, token
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total AS cum_share
        FROM top CROSS JOIN tot
    """,
    # the scoring expression is the SAME string Spark parses (bm25_score_expr)
    # over identically-typed BIGINT stats, so every double is bit-equal
    "sim_bm25_topk": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        f AS (
            SELECT doc_id, len(toks) AS _dl,
                   {", ".join(f"len(list_filter(toks, x -> x = '{term}')) AS _tf{i}" for i, term in enumerate(BM25_TERMS))}
            FROM t
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS _sn,
                   CAST(sum(_dl) AS BIGINT) AS _sumdl,
                   {", ".join(f"CAST(sum(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _sdf{i}" for i in range(len(BM25_TERMS)))}
            FROM f
        ),
        scored AS (
            SELECT doc_id,
                   {bm25_score_expr("_sn", "_sumdl", "_dl", [f"_tf{i}" for i in range(len(BM25_TERMS))], [f"_sdf{i}" for i in range(len(BM25_TERMS))])} AS bm25
            FROM f CROSS JOIN s
        )
        SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id LIMIT {BM25_K}
    """,
    # batched retrieval: per-term contributions are the SAME expression
    # string Spark parses (bm25_contrib_expr), quantized to BIGINT so the
    # per-(query,doc) SUM is order-independent; DuckDB's HUGEINT sum is
    # cast back to BIGINT, and the final /1e9 is one correctly-rounded
    # division identical in both engines
    "sim_bm25_multi_query": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        occ AS (SELECT doc_id, len(toks) AS _dl, unnest(toks) AS term FROM t),
        tf AS (
            SELECT doc_id, _dl, term, CAST(count(*) AS BIGINT) AS _tf
            FROM occ GROUP BY 1, 2, 3
        ),
        q AS (
            SELECT * FROM (VALUES {", ".join(f"('{qid}', '{term}')" for qid, ts in BM25_MULTI_QUERIES.items() for term in ts)})
                AS v(query_id, term)
        ),
        qdf AS (
            SELECT term, CAST(count(*) AS BIGINT) AS _df
            FROM tf JOIN (SELECT DISTINCT term FROM q) USING (term)
            GROUP BY term
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS _sn,
                   CAST(sum(len(toks)) AS BIGINT) AS _sumdl
            FROM t
        ),
        scored AS (
            SELECT query_id, doc_id,
                   CAST(sum({bm25_contrib_expr("_sn", "_sumdl", "_dl", "_tf", "_df")}) AS BIGINT) AS _s
            FROM tf JOIN q USING (term) JOIN qdf USING (term) CROSS JOIN s
            GROUP BY 1, 2
        )
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY _s DESC, doc_id) AS BIGINT) AS rank,
               CAST(_s AS DOUBLE) / CAST(1000000000.0 AS DOUBLE) AS bm25
        FROM scored WHERE _s > 0
        QUALIFY rank <= {BM25_MULTI_K}
    """,
    # retrieve-then-rerank: stage 1 is the identical BM25 candidate CTE
    # (quantized-BIGINT contributions, top-RERANK_CAND_K), stage 2 the
    # pair scorer recomputed from the SAME dyadic constants
    # (inference.pair_overlap_logit_sql) — integer overlap features x
    # power-of-two weights, bit-equal with no tolerance
    "sim_bm25_rerank": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        occ AS (SELECT doc_id, len(toks) AS _dl, unnest(toks) AS term FROM t),
        tf AS (
            SELECT doc_id, _dl, term, CAST(count(*) AS BIGINT) AS _tf
            FROM occ GROUP BY 1, 2, 3
        ),
        q AS (
            SELECT * FROM (VALUES {", ".join(f"('{qid}', '{term}')" for qid, ts in BM25_MULTI_QUERIES.items() for term in ts)})
                AS v(query_id, term)
        ),
        qdf AS (
            SELECT term, CAST(count(*) AS BIGINT) AS _df
            FROM tf JOIN (SELECT DISTINCT term FROM q) USING (term)
            GROUP BY term
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS _sn,
                   CAST(sum(len(toks)) AS BIGINT) AS _sumdl
            FROM t
        ),
        scored AS (
            SELECT query_id, doc_id,
                   CAST(sum({bm25_contrib_expr("_sn", "_sumdl", "_dl", "_tf", "_df")}) AS BIGINT) AS _s
            FROM tf JOIN q USING (term) JOIN qdf USING (term) CROSS JOIN s
            GROUP BY 1, 2
        ),
        cand AS (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY _s DESC, doc_id) AS _r
            FROM scored WHERE _s > 0
            QUALIFY _r <= {RERANK_CAND_K}
        ),
        qtext AS (
            SELECT * FROM (VALUES {", ".join(f"('{qid}', '{' '.join(ts)}')" for qid, ts in BM25_MULTI_QUERIES.items())})
                AS v(query_id, query_text)
        ),
        reranked AS (
            SELECT c.query_id, c.doc_id,
                   {inference.pair_overlap_logit_sql("qt.query_text", "d.text")} AS score
            FROM cand c JOIN qtext qt USING (query_id)
            JOIN documents d USING (doc_id)
        )
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, doc_id) AS BIGINT) AS rerank,
               score
        FROM reranked
        QUALIFY rerank <= {RERANK_K}
    """,
    # the weight expression is the SAME string Spark parses
    # (dedup.tfidf_weight_expr); weights are BIGINT, so every dot/norm is an
    # exact integer sum — order-independent — and the only doubles are the
    # final sqrt/divide, correctly rounded identically in both engines
    "dedup_tfidf_cosine": f"""
        WITH stats AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM documents),
        toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        occ AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS s FROM toks),
        tf AS (SELECT doc_id, s, CAST(count(*) AS BIGINT) AS _tf FROM occ GROUP BY 1, 2),
        dfreq AS (SELECT s, CAST(count(*) AS BIGINT) AS _df FROM tf GROUP BY s),
        w AS (
            SELECT doc_id, s, {dedup.tfidf_weight_expr("_tf", "_df", "_n", 10_000)} AS _wt
            FROM tf JOIN dfreq USING (s) CROSS JOIN stats
            WHERE _df <= CAST(floor(CAST(0.3 AS DOUBLE) * _n) AS BIGINT)
        ),
        norms AS (SELECT doc_id, CAST(sum(_wt * _wt) AS BIGINT) AS _n2 FROM w GROUP BY doc_id),
        dots AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, CAST(sum(a._wt * b._wt) AS BIGINT) AS _dot
            FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_1, id_2,
               _dot / sqrt(CAST(na._n2 AS DOUBLE) * CAST(nb._n2 AS DOUBLE)) AS cosine
        FROM dots JOIN norms na ON na.doc_id = id_1 JOIN norms nb ON nb.doc_id = id_2
        WHERE _dot / sqrt(CAST(na._n2 AS DOUBLE) * CAST(nb._n2 AS DOUBLE)) >= {TFIDF_COS_THRESHOLD}
    """,
    # the exact DIRECTED containment pair set: candidates are lossless by the
    # one-sided prefix lemma and the verify is exact, so Spark == this SQL
    "dedup_containment": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS ss
            FROM toks
        ),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
        inter AS (
            SELECT a.doc_id AS src_id, b.doc_id AS dst_id, count(*) AS n_inter
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT src_id, dst_id, n_inter * 1.0 / la.c AS containment
        FROM inter
        JOIN (SELECT doc_id, len(ss) AS c FROM sh) la ON la.doc_id = src_id
        WHERE n_inter * 1.0 / la.c >= {CONTAINMENT_THRESHOLD}
    """,
    # the exact directed pair set restricted to pairs touching an increment
    # id (doc_id % 5 = 0): the incremental operator equals the batch one
    # under that restriction BY CONSTRUCTION (lossless prefix candidates
    # under any fixed order + exact count verify) — no banding probability
    # argument needed
    "dedup_incremental_containment": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS ss
            FROM toks
        ),
        ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
        inter AS (
            SELECT a.doc_id AS src_id, b.doc_id AS dst_id, count(*) AS n_inter
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT src_id, dst_id, n_inter * 1.0 / la.c AS containment
        FROM inter
        JOIN (SELECT doc_id, len(ss) AS c FROM sh) la ON la.doc_id = src_id
        WHERE n_inter * 1.0 / la.c >= {CONTAINMENT_THRESHOLD}
          AND (src_id % 5 = 0 OR dst_id % 5 = 0)
    """,
    # the exact FROZEN-STATS pair set: idf / max_df / corpus size computed
    # over the OLD docs (doc_id % 5 <> 0) only — the pinned incremental
    # policy — every doc weighted in that space (off-vocabulary terms df 0),
    # restricted to pairs touching an increment id. Same integer-quantized
    # weight expression as dedup_tfidf_cosine, so every dot/norm is an exact
    # BIGINT sum and equality is by construction (lossless Bayardo prefix
    # under the frozen order + exact verify), not probabilistic.
    "dedup_incremental_tfidf": f"""
        WITH stats AS (
            SELECT CAST(count(*) AS BIGINT) AS _n FROM documents WHERE doc_id % 5 <> 0
        ),
        toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        occ AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS s FROM toks),
        tf AS (SELECT doc_id, s, CAST(count(*) AS BIGINT) AS _tf FROM occ GROUP BY 1, 2),
        dfreq AS (
            SELECT s, CAST(count(*) AS BIGINT) AS _df FROM tf
            WHERE doc_id % 5 <> 0 GROUP BY s
        ),
        wd AS (
            SELECT doc_id, s, _tf, coalesce(_df, CAST(0 AS BIGINT)) AS _df
            FROM tf LEFT JOIN dfreq USING (s)
        ),
        w AS (
            SELECT doc_id, s, {dedup.tfidf_weight_expr("_tf", "_df", "_n", 10_000)} AS _wt
            FROM wd CROSS JOIN stats
            WHERE _df <= CAST(floor(CAST(0.3 AS DOUBLE) * _n) AS BIGINT)
        ),
        norms AS (SELECT doc_id, CAST(sum(_wt * _wt) AS BIGINT) AS _n2 FROM w GROUP BY doc_id),
        dots AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, CAST(sum(a._wt * b._wt) AS BIGINT) AS _dot
            FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
            WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
            GROUP BY 1, 2
        )
        SELECT id_1, id_2,
               _dot / sqrt(CAST(na._n2 AS DOUBLE) * CAST(nb._n2 AS DOUBLE)) AS cosine
        FROM dots JOIN norms na ON na.doc_id = id_1 JOIN norms nb ON nb.doc_id = id_2
        WHERE _dot / sqrt(CAST(na._n2 AS DOUBLE) * CAST(nb._n2 AS DOUBLE)) >= {TFIDF_COS_THRESHOLD}
    """,
    # the DIRECT all-pairs maximal-run computation: every pair's matching
    # token 4-grams chained along diagonals (gaps-and-islands) into maximal
    # runs, token length = run + k - 1, floor = window + k - 1. The Spark
    # side's winnowing candidate stage is lossless at the floor (winnowing
    # theorem) and its verify is this exact computation, so the sets match.
    "dedup_substring_spans": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        gs AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM toks
        ),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gs),
        m AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, a.pos AS p1, b.pos AS p2
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        ),
        r AS (
            SELECT id_1, id_2, p1, p2, p1 - p2 AS diag,
                   p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2 ORDER BY p1) AS island
            FROM m
        )
        SELECT id_1, id_2, min(p1) AS start_1, min(p2) AS start_2,
               CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS match_len
        FROM r GROUP BY id_1, id_2, diag, island
        HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
    """,
    # the direct WITHIN-DOC maximal-run computation over the identically
    # salted corpus (every 7th doc gets its first 8 tokens appended):
    # same-doc gram matches at p1 < p2 chained along diagonals (p2 - p1)
    "dedup_substring_self": f"""
        WITH salted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN
                       concat_ws(' ', text,
                           array_to_string(({_TOKS})[1:8], ' '))
                   ELSE text END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM salted
        ),
        gs AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM toks
        ),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gs),
        m AS (
            SELECT a.doc_id AS doc_id, a.pos AS p1, b.pos AS p2
            FROM g a JOIN g b
              ON a.doc_id = b.doc_id AND a.gram = b.gram AND a.pos < b.pos
        ),
        r AS (
            SELECT doc_id, p1, p2, p2 - p1 AS diag,
                   p1 - row_number() OVER (PARTITION BY doc_id, p2 - p1 ORDER BY p1) AS island
            FROM m
        )
        SELECT doc_id, min(p1) AS start_1, min(p2) AS start_2,
               CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS match_len
        FROM r GROUP BY doc_id, diag, island
        HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
    """,
    # span-level decon: the direct BIPARTITE maximal-run computation over
    # the identically salted pool/bench relations (held-out docs + the
    # sentinel item; every 13th pool doc salted), runs chained per
    # (pool doc, bench doc, diagonal), removal ranges on the pool side,
    # NOT-EXISTS rebuild with full pool coverage
    "decon_span_scrub": f"""
        WITH bench AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
            UNION ALL SELECT {DECON_SENTINEL_ID}, '{DECON_SENTINEL}'
        ),
        pool AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 1
                        THEN concat_ws(' ', text, '{DECON_SENTINEL}')
                        ELSE text END AS text
            FROM documents WHERE doc_id % 97 <> 0
        ),
        tp AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM pool),
        tb AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM bench),
        gp0 AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM tp
        ),
        gb0 AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM tb
        ),
        gp AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gp0),
        gb AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gb0),
        m AS (
            SELECT p.doc_id AS id_1, b.doc_id AS id_2, p.pos AS p1, b.pos AS p2
            FROM gp p JOIN gb b ON p.gram = b.gram
        ),
        r AS (
            SELECT id_1, id_2, p1, p2, p1 - p2 AS diag,
                   p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2 ORDER BY p1) AS island
            FROM m
        ),
        spans AS (
            SELECT id_1, min(p1) AS s,
                   CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS ml
            FROM r GROUP BY id_1, id_2, diag, island
            HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
        ),
        rem AS (SELECT DISTINCT id_1 AS doc_id, s, s + ml - 1 AS e FROM spans),
        tokpos AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'tok': t[i]}} for i in range(1, len(t) + 1)]) AS u
            FROM tp
        ),
        tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM tokpos),
        kept AS (
            SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
            WHERE NOT EXISTS (
                SELECT 1 FROM rem
                WHERE rem.doc_id = tk.doc_id AND tk.pos BETWEEN rem.s AND rem.e
            )
        )
        SELECT p.doc_id,
               coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS scrubbed_text,
               CAST(n.n - count(k.pos) AS BIGINT) AS n_removed
        FROM pool p
        JOIN (SELECT doc_id, len(t) AS n FROM tp) n USING (doc_id)
        LEFT JOIN kept k ON k.doc_id = p.doc_id
        GROUP BY p.doc_id, n.n
    """,
    # act on within-doc runs: the self-span relation's LATER occurrence
    # becomes a removal range, NOT-EXISTS rebuild over the same salted
    # corpus — salted docs provably lose exactly the appended tail
    "dedup_self_scrub": f"""
        WITH salted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN
                       concat_ws(' ', text,
                           array_to_string(({_TOKS})[1:8], ' '))
                   ELSE text END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM salted
        ),
        gs AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM toks
        ),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gs),
        m AS (
            SELECT a.doc_id AS doc_id, a.pos AS p1, b.pos AS p2
            FROM g a JOIN g b
              ON a.doc_id = b.doc_id AND a.gram = b.gram AND a.pos < b.pos
        ),
        r AS (
            SELECT doc_id, p1, p2, p2 - p1 AS diag,
                   p1 - row_number() OVER (PARTITION BY doc_id, p2 - p1 ORDER BY p1) AS island
            FROM m
        ),
        spans AS (
            SELECT doc_id, min(p2) AS s,
                   CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS ml
            FROM r GROUP BY doc_id, diag, island
            HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
        ),
        rem AS (SELECT DISTINCT doc_id, s, s + ml - 1 AS e FROM spans),
        tokpos AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'tok': t[i]}} for i in range(1, len(t) + 1)]) AS u
            FROM toks
        ),
        tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM tokpos),
        kept AS (
            SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
            WHERE NOT EXISTS (
                SELECT 1 FROM rem
                WHERE rem.doc_id = tk.doc_id AND tk.pos BETWEEN rem.s AND rem.e
            )
        )
        SELECT s.doc_id,
               coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS scrubbed_text,
               CAST(n.n - count(k.pos) AS BIGINT) AS n_removed
        FROM salted s
        JOIN (SELECT doc_id, len(t) AS n FROM toks) n USING (doc_id)
        LEFT JOIN kept k ON k.doc_id = s.doc_id
        GROUP BY s.doc_id, n.n
    """,
    # keep-first span scrub: the all-pairs maximal-run relation (same CTE as
    # dedup_substring_spans) turned into removal ranges on the id_2 (larger
    # id) side, then the corpus rebuilt token-by-token — positions NOT
    # covered by any range survive, space-rejoined in order; every doc is
    # present (LEFT JOIN), empty string when everything was duplicated
    "dedup_substring_scrub": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        gs AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM toks
        ),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gs),
        m AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, a.pos AS p1, b.pos AS p2
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        ),
        r AS (
            SELECT id_1, id_2, p1, p2, p1 - p2 AS diag,
                   p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2 ORDER BY p1) AS island
            FROM m
        ),
        spans AS (
            SELECT id_2, min(p2) AS start_2,
                   CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS match_len
            FROM r GROUP BY id_1, id_2, diag, island
            HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
        ),
        rem AS (
            SELECT DISTINCT id_2 AS doc_id, start_2 AS s,
                   start_2 + match_len - 1 AS e
            FROM spans
        ),
        tokpos AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'tok': t[i]}} for i in range(1, len(t) + 1)]) AS u
            FROM toks
        ),
        tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM tokpos),
        kept AS (
            SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
            WHERE NOT EXISTS (
                SELECT 1 FROM rem
                WHERE rem.doc_id = tk.doc_id AND tk.pos BETWEEN rem.s AND rem.e
            )
        )
        SELECT d.doc_id,
               coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS scrubbed_text,
               CAST(n.n - count(k.pos) AS BIGINT) AS n_removed
        FROM documents d
        JOIN (SELECT doc_id, len(t) AS n FROM toks) n USING (doc_id)
        LEFT JOIN kept k ON k.doc_id = d.doc_id
        GROUP BY d.doc_id, n.n
    """,
    # the same direct all-pairs maximal-run computation restricted to pairs
    # touching an increment id (doc_id % 5 = 0): winnowing selection is a
    # pure per-doc function, so the incremental operator equals the batch
    # one under that restriction EXACTLY (no frozen stats, no probability)
    "dedup_incremental_substring": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        gs AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM toks
        ),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gs),
        m AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, a.pos AS p1, b.pos AS p2
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
        ),
        r AS (
            SELECT id_1, id_2, p1, p2, p1 - p2 AS diag,
                   p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2 ORDER BY p1) AS island
            FROM m
        )
        SELECT id_1, id_2, min(p1) AS start_1, min(p2) AS start_2,
               CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS match_len
        FROM r GROUP BY id_1, id_2, diag, island
        HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
    """,
    # LSH banding at 32x4 misses a >=0.9-similar pair with prob ~1e-15 and the
    # candidates are exactly verified, so the oracle is the exact pair set.
    "dedup_minhash_lsh": _JACCARD_CTE
    + f"SELECT id_1, id_2, jaccard FROM jac WHERE jaccard >= {MINHASH_THRESHOLD}",
    # the exact pair set restricted to pairs touching an increment doc
    # (id % 5 = 0): the operator contract is exactly this restriction of the
    # full-union pair set (pytest-pinned), and banding recall at 32x4 makes
    # the exact set a valid oracle (same argument as dedup_minhash_lsh)
    "dedup_incremental_minhash": _JACCARD_CTE
    + f"""SELECT id_1, id_2, jaccard FROM jac
        WHERE jaccard >= {MINHASH_THRESHOLD}
          AND (id_1 % 5 = 0 OR id_2 % 5 = 0)""",
    # streamed union == batch pair set by the exactly-once invariant (pinned
    # in pytest incl. redelivery); the oracle is the same quadratic
    # bit_count(xor) self-join as dedup_simhash_pairs
    "dedup_stream_near_dup": f"""
        WITH sims AS ({_simhash_sql()})
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
    "dedup_simhash": _simhash_sql(),
    # exact pair set: the banded candidate join provably loses nothing
    # (pigeonhole), so the quadratic DuckDB self-join is a valid oracle.
    "dedup_simhash_pairs": f"""
        WITH sims AS ({_simhash_sql()})
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
    # transitive closure of the exact-Jaccard pair graph (identical pair set to
    # the LSH candidates at this threshold); component = min reachable id.
    "dedup_clusters": _JACCARD_CTE + f""",
        p AS (SELECT id_1, id_2 FROM jac WHERE jaccard >= {MINHASH_THRESHOLD}),
        edges AS (SELECT id_1 AS src, id_2 AS dst FROM p
                  UNION SELECT id_2, id_1 FROM p),
        reach AS (
            SELECT src AS id, dst AS r FROM edges
            UNION SELECT src AS id, src AS r FROM edges
        ),
        closure AS (
            WITH RECURSIVE walk(id, r) AS (
                SELECT id, r FROM reach
                UNION
                SELECT walk.id, edges.dst FROM walk JOIN edges ON walk.r = edges.src
            )
            SELECT id, min(r) AS component FROM walk GROUP BY id
        )
        SELECT id AS doc_id, component, id = component AS keep FROM closure
    """,
    "dedup_embedding_cosine": f"""
        SELECT a.vec_id AS id_1, b.vec_id AS id_2,
               {_cosine_sql('a.embedding', 'b.embedding')} AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_THRESHOLD}
    """,
    "sim_ann_topk_bruteforce": _BRUTEFORCE_TOPK_SQL,
    # ANN recall bound-checks: n_queries / n_exact_pairs recomputed exactly by
    # DuckDB from the brute-force top-k; recall_ok is TRUE by the pinned floor.
    "sim_ann_topk_lsh": _ANN_RECALL_ORACLE,
    "sim_ann_topk_ivf": _ANN_RECALL_ORACLE,
    "sim_ann_topk_ivf_trained": _ANN_RECALL_ORACLE,
    "sim_ann_topk_pq": _ANN_RECALL_ORACLE,
    "sim_ann_topk_pq_trained": _ANN_RECALL_ORACLE,
    "sim_ann_chained_pq": _ANN_RECALL_ORACLE,
    "sim_ann_stream_pq": _ANN_RECALL_ORACLE,
    "sim_ann_topk_ivfpq": _ANN_RECALL_ORACLE,
    "sim_ann_topk_ivfpq_residual": _ANN_RECALL_ORACLE,
    # Sketch bound-checks: the exact-side columns recomputed by DuckDB plus
    # TRUE for the in-query error-bound boolean.
    "sketch_approx_distinct": """
        SELECT l_returnflag,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
               TRUE AS within_3rsd
        FROM lineitem GROUP BY l_returnflag
    """,
    "sketch_approx_quantiles": f"""
        SELECT l_returnflag, p.probability,
               CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS within_eps
        FROM lineitem
        CROSS JOIN (
            SELECT unnest(CAST({SKETCH_PROBS} AS DOUBLE[])) AS probability
        ) p
        GROUP BY l_returnflag, p.probability
    """,
    "sim_knn_label_vote": f"""
        WITH topk AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY {_cosine_sql('q.embedding', 'c.embedding')} DESC, c.vec_id) AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            WHERE q.vec_id IN (SELECT vec_id FROM embeddings
                               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                               LIMIT {ANN_PANEL_SIZE})
            QUALIFY rank <= {ANN_K}
        ), votes AS (
            SELECT query_id, label, count(*) AS votes FROM topk GROUP BY 1, 2
        )
        SELECT query_id, label AS predicted_label FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) = 1
    """,
    "events_interval_join": """
SELECT p.user_id,
       p.event_id AS click_id,
       i.event_id AS error_id,
       epoch_us(p.ts) - epoch_us(i.ts) AS us_after_error
FROM events p
JOIN events i ON p.user_id = i.user_id
WHERE p.event_type = 'click'
  AND i.event_type = 'error'
  AND epoch_us(p.ts) >= epoch_us(i.ts)
  AND epoch_us(p.ts) < epoch_us(i.ts) + 7200000000
""",
    "events_gap_fill": f"""
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
        pb AS (
            SELECT user_id, bucket, value FROM (
                SELECT user_id, ts_us // {TS_BUCKET_US} AS bucket, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts_us // {TS_BUCKET_US}
                                          ORDER BY ts_us DESC, event_id DESC) AS rn
                FROM e
            ) WHERE rn = 1
        ),
        spans AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM pb GROUP BY 1),
        grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM spans)
        SELECT g.user_id, g.bucket,
               last_value(pb.value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
               pb.bucket IS NOT NULL AS observed
        FROM grid g LEFT JOIN pb ON g.user_id = pb.user_id AND g.bucket = pb.bucket
    """,
    "events_twap": """
        WITH e AS (
            SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
        ),
        seg AS (
            SELECT user_id, ts_us,
                   CAST(CAST(CAST(value AS DECIMAL(18,6))
                             * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT) AS HUGEINT)
                       * (lead(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id) - ts_us)
                       AS wv
            FROM e
        )
        SELECT user_id,
               count(*) AS n_obs,
               max(ts_us) - min(ts_us) AS span_us,
               -- 1e6 (a DOUBLE literal), NOT 1000000.0 (DuckDB parses that
               -- as DECIMAL and the decimal-typed divisor shifts the result)
               CAST(CAST(SUM(wv) AS VARCHAR) AS DOUBLE)
                   / (1e6 * (max(ts_us) - min(ts_us))) AS twap
        FROM seg
        GROUP BY user_id
        HAVING max(ts_us) - min(ts_us) > 0
    """,
    "events_sequence_match": f"""
        WITH coded AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   CASE event_type
                       WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                       WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                       WHEN 'signup' THEN 's' END AS c
            FROM events
        )
        SELECT user_id, count(*) AS n_events,
               string_agg(c, '' ORDER BY ts_us, event_id) AS journey,
               regexp_matches(string_agg(c, '' ORDER BY ts_us, event_id),
                              '{SEQ_PATTERN}') AS matched
        FROM coded WHERE c IS NOT NULL
        GROUP BY user_id
    """,
    "events_value_histogram": f"""
        SELECT event_type, CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT)
                    * {HIST_BIN_WIDTH} AS DOUBLE) AS bin_lo
        FROM events
        GROUP BY 1, 2
    """,
    "text_pmi_bigrams": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        pairs AS (
            SELECT unnest([t[i] for i in range(1, len(t))]) AS w1,
                   unnest([t[i+1] for i in range(1, len(t))]) AS w2
            FROM toks WHERE len(t) >= 2
        ),
        cnt AS (SELECT w1, w2, count(*) AS c_pair FROM pairs GROUP BY 1, 2),
        firsts AS (SELECT w1, CAST(sum(c_pair) AS BIGINT) AS c_first FROM cnt GROUP BY 1),
        seconds AS (SELECT w2, CAST(sum(c_pair) AS BIGINT) AS c_second FROM cnt GROUP BY 1),
        tot AS (SELECT CAST(sum(c_pair) AS BIGINT) AS n_total FROM cnt)
        SELECT w1, w2, c_pair, c_first, c_second,
               CAST(c_pair * n_total AS DOUBLE) / CAST(c_first * c_second AS DOUBLE)
                   AS lift
        FROM cnt JOIN firsts USING (w1) JOIN seconds USING (w2) CROSS JOIN tot
        WHERE c_pair >= 5
        ORDER BY lift DESC, w1, w2
        LIMIT 50
    """,
    # batch mirror of the STREAMING tumbling-window aggregation: UTC-epoch-
    # aligned 1-day buckets; value sums use the TWAP decimal*1e6 integer
    # scaling so the sum is order-independent BIGINT on both sides
    "events_stream_windowed": """
        WITH e AS (
            SELECT epoch_us(ts) AS ts_us, event_type,
                   CAST(CAST(value AS DECIMAL(18,6))
                        * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT) AS vm
            FROM events
        )
        SELECT (ts_us // 86400000000) * 86400000000 AS window_start_us,
               event_type, count(*) AS n_events,
               CAST(sum(vm) AS BIGINT) AS sum_value_micros
        FROM e GROUP BY 1, 2
    """,
    "events_anomaly_daily": f"""
        WITH counts AS (
            SELECT user_id, epoch_us(ts) // {TS_BUCKET_US} AS bucket,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, bucket, n_events,
               CAST(sum(n_events) OVER w AS DOUBLE) / count(*) OVER w AS mean_events,
               sqrt((CAST(sum(n_events * n_events) OVER w AS DOUBLE)
                     - CAST(sum(n_events) OVER w AS DOUBLE)
                       * CAST(sum(n_events) OVER w AS DOUBLE) / count(*) OVER w)
                    / count(*) OVER w) AS std_events,
               CAST(n_events AS DOUBLE) >
                   CAST(sum(n_events) OVER w AS DOUBLE) / count(*) OVER w
                   + {ANOMALY_Z} * sqrt((CAST(sum(n_events * n_events) OVER w AS DOUBLE)
                     - CAST(sum(n_events) OVER w AS DOUBLE)
                       * CAST(sum(n_events) OVER w AS DOUBLE) / count(*) OVER w)
                    / count(*) OVER w) AS is_anomaly
        FROM counts
        WINDOW w AS (PARTITION BY user_id)
    """,
    "events_rolling_7d": f"""
        WITH daily AS (
            SELECT user_id, epoch_us(ts) // {TS_BUCKET_US} AS bucket,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, bucket, n_events,
               CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY bucket
                        RANGE BETWEEN {ROLLING_DAYS - 1} PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS n_rolling
        FROM daily
    """,
    "funnel_conversion": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND ts_us >= t1 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND ts_us >= t2 GROUP BY e.user_id)
        SELECT 'view' AS stage, 1 AS stage_index, (SELECT count(*) FROM s1) AS n_users
        UNION ALL
        SELECT 'click', 2, (SELECT count(*) FROM s2)
        UNION ALL
        SELECT 'purchase', 3, (SELECT count(*) FROM s3)
    """,
    "cohort_retention": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        wk AS (SELECT user_id, ts_us // 86400000000 AS week FROM e),
        first AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
        act AS (SELECT DISTINCT user_id, week FROM wk),
        offs AS (
            SELECT DISTINCT act.user_id, cohort_week,
                   CAST(week - cohort_week AS INT) AS off
            FROM act JOIN first USING (user_id)
            WHERE week - cohort_week BETWEEN 0 AND 3
        )
        SELECT cohort_week,
               CAST(SUM(CASE WHEN off = 0 THEN 1 ELSE 0 END) AS BIGINT) AS w0,
               CAST(SUM(CASE WHEN off = 1 THEN 1 ELSE 0 END) AS BIGINT) AS w1,
               CAST(SUM(CASE WHEN off = 2 THEN 1 ELSE 0 END) AS BIGINT) AS w2,
               CAST(SUM(CASE WHEN off = 3 THEN 1 ELSE 0 END) AS BIGINT) AS w3
        FROM offs GROUP BY cohort_week
    """,
    "data_split_counts": """
        WITH b AS (
            SELECT lang,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
                       AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n_docs
        FROM b GROUP BY 1, 2
    """,
    # Bloom path is exact (no false negatives + confirm join), so its oracle
    # is the plain overlap SQL — only the benchmark predicate differs from
    # decon_benchmark_overlap.
    "decon_bloom_prefilter": f"""
        WITH words AS (
            SELECT doc_id, {{_TOKS}} AS w FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, i, i + {{DECON_NGRAM_M1}}), ' ') AS ngram
            FROM words, UNNEST(range(1, len(w) - {{DECON_NGRAM_M2}})) AS t(i)
            WHERE len(w) >= {{DECON_NGRAM}}
        ),
        bench AS (
            SELECT DISTINCT ngram FROM grams WHERE doc_id % {BLOOM_BENCH_MOD} = 0
        )
        SELECT g.doc_id, count(*) AS n_hit_ngrams
        FROM grams g JOIN bench USING (ngram)
        WHERE g.doc_id % {BLOOM_BENCH_MOD} <> 0
        GROUP BY 1
    """.replace("{_TOKS}", _TOKS)
    .replace("{DECON_NGRAM_M1}", str(DECON_NGRAM - 1))
    .replace("{DECON_NGRAM_M2}", str(DECON_NGRAM - 2))
    .replace("{DECON_NGRAM}", str(DECON_NGRAM)),
    "decon_benchmark_overlap": f"""
        WITH words AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, i, i + {DECON_NGRAM - 1}), ' ') AS ngram
            FROM words, UNNEST(range(1, len(w) - {DECON_NGRAM - 2})) AS t(i)
            WHERE len(w) >= {DECON_NGRAM}
        ),
        bench AS (
            SELECT DISTINCT ngram FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0
        )
        SELECT g.doc_id, count(*) AS n_hit_ngrams
        FROM grams g JOIN bench USING (ngram)
        WHERE g.doc_id % {DECON_BENCH_MOD} <> 0
        GROUP BY 1
    """,
    "corpus_feed_health": f"""
        WITH words AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, i, i + {DECON_NGRAM - 1}), ' ') AS ngram
            FROM words, UNNEST(range(1, len(w) - {DECON_NGRAM - 2})) AS t(i)
            WHERE len(w) >= {DECON_NGRAM}
        ),
        bench AS (
            SELECT DISTINCT ngram FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0
        ),
        hits AS (
            SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (ngram)
            WHERE g.doc_id % {DECON_BENCH_MOD} <> 0
        ),
        feed AS (
            SELECT doc_id, md5({_NORM}) AS fp FROM documents
            WHERE doc_id % {DECON_BENCH_MOD} <> 0
        )
        SELECT f.doc_id % {FEED_WINDOWS} AS window_id,
               count(*) AS n_docs,
               avg(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END) AS contamination_rate,
               (count(*) - count(DISTINCT f.fp)) / count(*) AS dup_rate
        FROM feed f LEFT JOIN hits h USING (doc_id)
        GROUP BY 1
    """,
    "mix_weighted_sample": f"""
        WITH t AS (
            SELECT lang, source,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       % 10000 AS bucket
            FROM documents
        )
        SELECT lang, source, count(*) AS n_kept FROM t
        WHERE bucket < CASE lang {" ".join(
            f"WHEN '{k}' THEN {int(round(v * 10000))}" for k, v in MIX_WEIGHTS.items()
        )} ELSE 0 END
        GROUP BY 1, 2
    """,
    "pack_token_budget": f"""
        WITH t AS (
            SELECT doc_id, lang, len({_TOKS}) AS n_tokens,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       % {PACK_SHARDS} AS shard
            FROM documents
        ),
        c AS (
            SELECT lang, shard, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS before_tokens
            FROM t
        )
        SELECT lang, shard,
               CAST(FLOOR(before_tokens / {PACK_BUDGET}) AS BIGINT) AS seq_index,
               count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM c GROUP BY 1, 2, 3
    """,
    # the tokenizer-seam packing entry: identical packing CTE to
    # pack_token_budget but with n_tokens recomputed by the stub-BPE
    # integer arithmetic (inference.stub_bpe_count_sql — same constants)
    "tokenize_pack_budget": f"""
        WITH t AS (
            SELECT doc_id, lang, {inference.stub_bpe_count_sql()} AS n_tokens,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       % {PACK_SHARDS} AS shard
            FROM documents
        ),
        c AS (
            SELECT lang, shard, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS before_tokens
            FROM t
        )
        SELECT lang, shard,
               CAST(FLOOR(before_tokens / {PACK_BUDGET}) AS BIGINT) AS seq_index,
               count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM c GROUP BY 1, 2, 3
    """,
    "dedup_exact_chunks": f"""
        WITH words AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   md5(array_to_string(
                       list_slice(w, (i - 1) * {CHUNK_WORDS} + 1, i * {CHUNK_WORDS}),
                       ' ')) AS chunk_md5
            FROM words,
                 UNNEST(range(1, 1 + CAST(FLOOR(len(w) / {CHUNK_WORDS}) AS BIGINT)))
                     AS t(i)
        )
        SELECT chunk_md5, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM chunks GROUP BY 1 HAVING count(*) > 1
    """,
    "skew_salted_agg": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
    """,
    # salting is result-invisible: the oracle is the PLAIN join + aggregate
    "skew_salted_join": """
        SELECT s_nationkey,
               count(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1
    """,
    # two-phase selection is result-invisible: the oracle is the naive
    # per-stratum window rank over the same md5 order
    "sample_fixed_per_lang": f"""
        SELECT lang, doc_id, sample_rank FROM (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                       AS sample_rank
            FROM documents
        ) WHERE sample_rank <= {SAMPLE_PER_STRATUM}
    """,
    "sessionize_stats": _SESSION_CTE + """
        SELECT user_id, session_index, count(*) AS n_events,
               strftime(make_timestamp(min(ts_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               max(ts_us) - min(ts_us) AS duration_us,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_purchases
        FROM sessioned GROUP BY user_id, session_index
    """,
    "sessionize_user_summary": _SESSION_CTE + """
        SELECT user_id, max(session_index) AS n_sessions, count(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_errors
        FROM sessioned GROUP BY user_id
    """,
    "multimodal_decode": """
        SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5,
               1 + ascii(substr(text, 1, 1)) AS fake_width,
               1 + ascii(substr(text, length(text), 1)) AS fake_height
        FROM documents
    """,
    # documents are pure ASCII (verified), so VARCHAR substr/md5 see the same
    # bytes the pandas kernel slices from the binary payload.
    "multimodal_frame_sample": """
        WITH n AS (
            SELECT doc_id, text, greatest(1, length(text) // 32) AS n_frames
            FROM documents
        ), f AS (
            SELECT doc_id, unnest(range(0, n_frames, 4)) AS fi, text FROM n
        )
        SELECT doc_id, CAST(fi AS INT) AS frame_index,
               md5(substr(text, CAST(fi * 32 + 1 AS BIGINT), 32)) AS frame_md5
        FROM f
    """,
    "multimodal_resize_plan": """
        WITH d AS (
            SELECT doc_id,
                   1 + ascii(substr(text, 1, 1)) AS fake_width,
                   1 + ascii(substr(text, length(text), 1)) AS fake_height
            FROM documents
        )
        SELECT doc_id, fake_width, fake_height,
               CAST(floor(fake_width * (CASE WHEN greatest(fake_width, fake_height) > 128
                    THEN 128 / greatest(fake_width, fake_height) ELSE 1.0 END)) AS INT)
                    AS target_width,
               CAST(floor(fake_height * (CASE WHEN greatest(fake_width, fake_height) > 128
                    THEN 128 / greatest(fake_width, fake_height) ELSE 1.0 END)) AS INT)
                    AS target_height,
               greatest(fake_width, fake_height) > 128 AS resized
        FROM d
    """,
    # Integer-exact SQL re-derivation of ahash64 (multimodal.py): 64 blocks of
    # contiguous byte positions (overlapping for short docs, hi = max(lo+1, ..)
    # exactly as the pandas kernel), floor-mean luma per block, bit i set iff
    # luma_i * 64 > sum(lumas), two's-complement into a signed BIGINT (the
    # j = 63 term adds -2^63 — identical to the kernel's h - 2^64 wrap). The
    # banded Spark join provably loses nothing within the radius (pigeonhole),
    # so the quadratic bit_count(xor) self-join is a valid oracle.
    "multimodal_phash_pairs": f"""
        WITH docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
        pos AS (
            SELECT doc_id, i, ascii(substr(text, CAST(i + 1 AS INT), 1)) AS byte
            FROM docs, unnest(range(n)) AS u(i)
        ),
        blocks AS (
            SELECT doc_id, j, (j * n) // 64 AS lo,
                   greatest((j * n) // 64 + 1, ((j + 1) * n) // 64) AS hi
            FROM docs, unnest(range(64)) AS u(j)
        ),
        lumas AS (
            SELECT b.doc_id, b.j, sum(p.byte) // count(*) AS luma
            FROM blocks b
            JOIN pos p ON p.doc_id = b.doc_id AND p.i >= b.lo AND p.i < b.hi
            GROUP BY b.doc_id, b.j
        ),
        hashes AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN luma * 64 > tot THEN
                        CASE WHEN j = 63 THEN -9223372036854775808
                             ELSE (1::BIGINT << CAST(j AS INT)) END
                        ELSE 0 END) AS BIGINT) AS phash
            FROM (SELECT doc_id, j, luma,
                         sum(luma) OVER (PARTITION BY doc_id) AS tot FROM lumas)
            GROUP BY doc_id
        )
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
    """,
    "corpus_shard_stats": f"""
        WITH sharded AS (
            SELECT *, ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                       % {SHARD_COUNT} AS shard_id
            FROM documents
        ),
        stats AS (
            SELECT shard_id,
                   count(*) AS n_docs,
                   CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
                   count(DISTINCT lang) AS n_langs
            FROM sharded GROUP BY 1
        )
        SELECT shard_id, n_docs, n_tokens, n_langs,
               abs(n_docs / t.c - 1.0 / {SHARD_COUNT}) < 0.05 AS balanced
        FROM stats CROSS JOIN (SELECT count(*) AS c FROM documents) t
    """,
    "text_boilerplate_scrub": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        ch0 AS (
            SELECT doc_id,
                   [array_to_string(t[s:s+{BOILER_CHUNK_WORDS - 1}], ' ')
                    for s in range(1, len(t) + 1, {BOILER_CHUNK_WORDS})] AS chunks
            FROM toks
        ),
        ch AS (
            SELECT doc_id,
                   CAST(generate_subscripts(chunks, 1) - 1 AS BIGINT) AS pos,
                   unnest(chunks) AS chunk
            FROM ch0
        ),
        dfq AS (SELECT chunk, count(DISTINCT doc_id) AS cdocs FROM ch GROUP BY 1),
        fl AS (
            SELECT ch.*, cdocs >= {BOILER_MIN_DOCS} AS dropf
            FROM ch JOIN dfq USING (chunk)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN dropf THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               coalesce(string_agg(CASE WHEN NOT dropf THEN chunk END,
                                   ' ' ORDER BY pos), '') AS cleaned_text
        FROM fl GROUP BY doc_id
    """,
    "sketch_count_min": f"""
        WITH seeds AS (SELECT unnest(range({CMS_DEPTH})) AS seed),
        cells AS (
            SELECT seed,
                   ('0x' || substr(md5(l_suppkey::VARCHAR),
                                   CAST(1 + 8 * seed AS INT), 8))::BIGINT
                       % {CMS_WIDTH} AS bucket
            FROM lineitem CROSS JOIN seeds
        ),
        cms AS (SELECT seed, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
        probes AS (
            SELECT DISTINCT l_suppkey FROM lineitem
            WHERE l_suppkey % {CMS_PROBE_MOD} = 0
        ),
        pc AS (
            SELECT l_suppkey, seed,
                   ('0x' || substr(md5(l_suppkey::VARCHAR),
                                   CAST(1 + 8 * seed AS INT), 8))::BIGINT
                       % {CMS_WIDTH} AS bucket
            FROM probes CROSS JOIN seeds
        ),
        est AS (
            SELECT l_suppkey::VARCHAR AS value, CAST(min(cnt) AS BIGINT) AS est_cnt
            FROM pc JOIN cms USING (seed, bucket) GROUP BY 1
        ),
        exact AS (
            SELECT l_suppkey::VARCHAR AS value, count(*) AS exact_cnt
            FROM lineitem WHERE l_suppkey % {CMS_PROBE_MOD} = 0 GROUP BY 1
        )
        SELECT value, exact_cnt, est_cnt,
               est_cnt >= exact_cnt AS never_under,
               est_cnt - exact_cnt <= {CMS_EPS!r} * t.n AS within_eps
        FROM est JOIN exact USING (value)
        CROSS JOIN (SELECT count(*) AS n FROM lineitem) t
    """,
    "text_token_quantile_filter": f"""
        WITH t AS (SELECT doc_id, lang, len({_TOKS}) AS nt FROM documents),
        tot AS (SELECT count(*) AS n FROM t),
        cum AS (
            SELECT nt, sum(count(*)) OVER (ORDER BY nt
                       ROWS UNBOUNDED PRECEDING) AS c
            FROM t GROUP BY nt
        ),
        thr AS (
            SELECT min(nt) AS threshold FROM cum CROSS JOIN tot
            WHERE c >= ceil(n * 0.5)
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN nt >= threshold THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               threshold
        FROM t CROSS JOIN thr GROUP BY lang, threshold
    """,
    "dedup_semantic_blocked": f"""
        WITH nn AS (SELECT count(*) AS n FROM embeddings),
        kk AS (
            SELECT GREATEST({KMEANS_K},
                            CAST(CEIL(n / {SEM_CELL_TARGET}.0) AS BIGINT)) AS k
            FROM nn
        ),
        cents AS (
            SELECT vec_id AS cluster_id, embedding AS c
            FROM embeddings CROSS JOIN kk
            QUALIFY ROW_NUMBER()
                OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) <= k
        ),
        pairs AS (
            SELECT e.vec_id, cluster_id, {_sqdist_sql('e.embedding', 'c')} AS sq_dist
            FROM embeddings e CROSS JOIN cents
        ),
        assign AS (
            SELECT vec_id, cluster_id FROM pairs
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY sq_dist, cluster_id) = 1
        ),
        panel AS (
            SELECT vec_id FROM embeddings
            ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {SEM_PANEL_SIZE}
        ),
        blocked AS (
            SELECT a.vec_id AS id_1, b.vec_id AS id_2
            FROM embeddings a
            JOIN assign sa ON sa.vec_id = a.vec_id
            JOIN assign sb ON sa.cluster_id = sb.cluster_id
            JOIN embeddings b ON b.vec_id = sb.vec_id AND a.vec_id < b.vec_id
            WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_THRESHOLD}
        ),
        nb AS (SELECT count(*) AS c FROM blocked),
        pe AS (
            SELECT count(*) AS c
            FROM embeddings a
            JOIN panel pa ON pa.vec_id = a.vec_id
            JOIN embeddings b ON a.vec_id < b.vec_id
            JOIN panel pb ON pb.vec_id = b.vec_id
            WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_THRESHOLD}
        ),
        pbk AS (
            SELECT count(*) AS c
            FROM blocked
            JOIN panel p1 ON p1.vec_id = blocked.id_1
            JOIN panel p2 ON p2.vec_id = blocked.id_2
        )
        SELECT CAST(n AS BIGINT) AS n_vectors,
               CAST(k AS BIGINT) AS k_cells,
               CAST(nb.c AS BIGINT) AS n_blocked_pairs,
               CAST(pe.c AS BIGINT) AS n_panel_exact_pairs,
               CAST(pbk.c AS BIGINT) AS n_panel_blocked_pairs,
               pbk.c * 1.0 / pe.c AS panel_recall
        FROM nn CROSS JOIN kk CROSS JOIN nb CROSS JOIN pe CROSS JOIN pbk
    """,
    "embedding_kmeans_assign": f"""
        WITH cents AS (
            SELECT vec_id AS cluster_id, embedding AS c
            FROM embeddings
            ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {KMEANS_K}
        ),
        pairs AS (
            SELECT e.vec_id, cluster_id, {_sqdist_sql('e.embedding', 'c')} AS sq_dist
            FROM embeddings e CROSS JOIN cents
        )
        SELECT vec_id, cluster_id, sq_dist
        FROM pairs
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sq_dist, cluster_id) = 1
    """,
    # HLL bound-check: exact windowed distinct recomputed by DuckDB, TRUE for
    # the in-query 3-rsd boolean (same contract as sketch_approx_distinct).
    "sketch_hll_windowed": f"""
        WITH e AS (SELECT DISTINCT epoch_us(ts) // {TS_BUCKET_US} AS bucket,
                          user_id
                   FROM events),
        anchors AS (SELECT DISTINCT bucket FROM e),
        contrib AS (
            SELECT a.bucket AS bucket, e.user_id
            FROM e JOIN anchors a
              ON a.bucket BETWEEN e.bucket AND e.bucket + {ROLLING_DAYS - 1}
        )
        SELECT bucket, count(DISTINCT user_id) AS exact_users_7d,
               TRUE AS within_3rsd
        FROM contrib GROUP BY bucket
    """,
    "ingest_scd2_history": fixtures.with_ctes(
        """
        , hist AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority
            FROM day1
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority
            FROM cdc WHERE op <> 'D'
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER w AS valid_to,
               LEAD(o_orderdate) OVER w IS NULL AS is_current
        FROM hist
        WINDOW w AS (PARTITION BY o_orderkey ORDER BY o_orderdate)
        """
    ),
    "events_json_props": """
        WITH e AS (
            SELECT event_type,
                   CAST(NULLIF(regexp_extract(props, '"k":\\s*(-?\\d+)', 1), '')
                        AS BIGINT) AS k
            FROM events
        )
        SELECT event_type, count(*) AS n_events, count(k) AS n_with_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k
        FROM e GROUP BY event_type
    """,
    "dedup_edit_distance": f"""
        WITH sims AS ({_simhash_sql()}),
        norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
        cand AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {EDIT_MAX_HAMMING}
        )
        SELECT id_1, id_2, hamming,
               levenshtein(n1.t, n2.t) AS edit_dist
        FROM cand
        JOIN norm n1 ON n1.doc_id = id_1
        JOIN norm n2 ON n2.doc_id = id_2
        WHERE levenshtein(n1.t, n2.t) * {EDIT_DEN}
              <= greatest(length(n1.t), length(n2.t)) * {EDIT_NUM}
    """,
    # the WHOLE corpus-prep chain recomputed as one CTE pipeline — each CTE
    # feeds the next exactly as the Spark stages feed each other: scrub
    # (chunk-df cut, space-rejoin) -> min-id dedup on md5 of the normalized
    # CLEANED text -> n-gram decon vs the held-out bench (original text) ->
    # md5-bucket mix -> running-sum packing per (lang, pack-shard) ordered
    # by doc_id -> md5 export shard -> per-shard stats
    "corpus_prep_pipeline": f"""
        WITH toks0 AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        ch0 AS (
            SELECT doc_id,
                   [array_to_string(t[s:s+{PREP_CHUNK_WORDS - 1}], ' ')
                    for s in range(1, len(t) + 1, {PREP_CHUNK_WORDS})] AS chunks
            FROM toks0
        ),
        ch AS (
            SELECT doc_id, CAST(generate_subscripts(chunks, 1) - 1 AS BIGINT) AS pos,
                   unnest(chunks) AS chunk
            FROM ch0
        ),
        dfq AS (SELECT chunk, count(DISTINCT doc_id) AS cdocs FROM ch GROUP BY 1),
        fl AS (SELECT ch.*, cdocs >= {PREP_MIN_DOCS} AS dropf
               FROM ch JOIN dfq USING (chunk)),
        cleaned AS (
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN NOT dropf THEN chunk END,
                                       ' ' ORDER BY pos), '') AS text
            FROM fl GROUP BY doc_id
        ),
        cl AS (
            SELECT c.doc_id, c.text, d.lang
            FROM cleaned c JOIN documents d USING (doc_id) WHERE c.text <> ''
        ),
        keep AS (
            SELECT min(doc_id) AS doc_id FROM cl
            GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        ),
        dd AS (SELECT cl.* FROM cl JOIN keep USING (doc_id)),
        pw AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
            FROM dd WHERE doc_id % {PREP_BENCH_MOD} <> 0
        ),
        pg AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, i, i + {PREP_NGRAM - 1}), ' ') AS ngram
            FROM pw, UNNEST(range(1, len(w) - {PREP_NGRAM - 2})) AS t(i)
            WHERE len(w) >= {PREP_NGRAM}
        ),
        bg AS (
            SELECT DISTINCT
                   array_to_string(list_slice(t, i, i + {PREP_NGRAM - 1}), ' ') AS ngram
            FROM toks0, UNNEST(range(1, len(t) - {PREP_NGRAM - 2})) AS u(i)
            WHERE doc_id % {PREP_BENCH_MOD} = 0 AND len(t) >= {PREP_NGRAM}
        ),
        hits AS (SELECT DISTINCT doc_id FROM pg JOIN bg USING (ngram)),
        decon AS (
            SELECT * FROM dd
            WHERE doc_id % {PREP_BENCH_MOD} <> 0
              AND doc_id NOT IN (SELECT doc_id FROM hits)
        ),
        mixed AS (
            SELECT * FROM decon
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 10000
                  < CASE lang {" ".join(
                        f"WHEN '{k}' THEN {int(round(v * 10000))}"
                        for k, v in PREP_MIX.items()
                    )} ELSE 0 END
        ),
        pk0 AS (
            SELECT doc_id, lang,
                   CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT)
                       AS n_tokens,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                       % {PREP_PACK_SHARDS} AS shard
            FROM mixed
        ),
        pk AS (
            SELECT *, CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang, shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / {PREP_BUDGET}) AS BIGINT) AS seq_index
            FROM pk0
        ),
        sh AS (
            SELECT *, ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                       % {PREP_SHARDS} AS shard_id
            FROM pk
        )
        SELECT shard_id, count(*) AS n_docs,
               count(DISTINCT (lang, shard, seq_index)) AS n_seqs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               count(DISTINCT lang) AS n_langs
        FROM sh GROUP BY shard_id
    """,
    # the v2 composed pipeline: span scrub -> exact dedup -> span decon ->
    # classifier gate -> mix -> tokenizer-count pack -> shard, the WHOLE
    # chain recomputed as one CTE pipeline (each stage consuming the
    # previous stage's exact output; every scrub is the NOT-EXISTS rebuild
    # of the standalone entries, the gate is the exact dyadic logit, the
    # pack budget the exact integer stub-BPE count)
    "corpus_prep_pipeline_v2": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        s1g0 AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM toks
        ),
        s1g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM s1g0),
        s1m AS (
            SELECT a.doc_id AS id_1, b.doc_id AS id_2, a.pos AS p1, b.pos AS p2
            FROM s1g a JOIN s1g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        ),
        s1r AS (
            SELECT id_1, id_2, p1, p2, p1 - p2 AS diag,
                   p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2 ORDER BY p1) AS island
            FROM s1m
        ),
        s1spans AS (
            SELECT id_2, min(p2) AS start_2,
                   CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS match_len
            FROM s1r GROUP BY id_1, id_2, diag, island
            HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
        ),
        s1rem AS (
            SELECT DISTINCT id_2 AS doc_id, start_2 AS s,
                   start_2 + match_len - 1 AS e
            FROM s1spans
        ),
        s1tokpos AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'tok': t[i]}} for i in range(1, len(t) + 1)]) AS u
            FROM toks
        ),
        s1tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM s1tokpos),
        s1kept AS (
            SELECT tk.doc_id, tk.pos, tk.tok FROM s1tok tk
            WHERE NOT EXISTS (
                SELECT 1 FROM s1rem
                WHERE s1rem.doc_id = tk.doc_id AND tk.pos BETWEEN s1rem.s AND s1rem.e
            )
        ),
        scrub AS (
            SELECT d.doc_id,
                   coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text
            FROM documents d LEFT JOIN s1kept k ON k.doc_id = d.doc_id
            GROUP BY d.doc_id
        ),
        cl AS (
            SELECT s.doc_id, s.text, d.lang
            FROM scrub s JOIN documents d USING (doc_id) WHERE s.text <> ''
        ),
        keep2 AS (
            SELECT min(doc_id) AS doc_id FROM cl
            GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        ),
        dd AS (SELECT cl.* FROM cl JOIN keep2 USING (doc_id)),
        bench AS (
            SELECT doc_id, text FROM documents WHERE doc_id % {PREP_BENCH_MOD} = 0
            UNION ALL SELECT {DECON_SENTINEL_ID}, '{DECON_SENTINEL}'
        ),
        pool AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 1
                        THEN concat_ws(' ', text, '{DECON_SENTINEL}')
                        ELSE text END AS text,
                   lang
            FROM dd WHERE doc_id % {PREP_BENCH_MOD} <> 0
        ),
        tp AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM pool),
        tb AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM bench),
        gp0 AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM tp
        ),
        gb0 AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]}}
                           for i in range(1, len(t) - {SUBSTR_K} + 2)]) AS u
            FROM tb
        ),
        gp AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gp0),
        gb AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM gb0),
        s3m AS (
            SELECT p.doc_id AS id_1, b.doc_id AS id_2, p.pos AS p1, b.pos AS p2
            FROM gp p JOIN gb b ON p.gram = b.gram
        ),
        s3r AS (
            SELECT id_1, id_2, p1, p2, p1 - p2 AS diag,
                   p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2 ORDER BY p1) AS island
            FROM s3m
        ),
        s3spans AS (
            SELECT id_1, min(p1) AS s,
                   CAST(count(*) + {SUBSTR_K} - 1 AS BIGINT) AS ml
            FROM s3r GROUP BY id_1, id_2, diag, island
            HAVING count(*) + {SUBSTR_K} - 1 >= {SUBSTR_WINDOW} + {SUBSTR_K} - 1
        ),
        s3rem AS (SELECT DISTINCT id_1 AS doc_id, s, s + ml - 1 AS e FROM s3spans),
        s3tokpos AS (
            SELECT doc_id,
                   unnest([{{'pos': i, 'tok': t[i]}} for i in range(1, len(t) + 1)]) AS u
            FROM tp
        ),
        s3tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM s3tokpos),
        s3kept AS (
            SELECT tk.doc_id, tk.pos, tk.tok FROM s3tok tk
            WHERE NOT EXISTS (
                SELECT 1 FROM s3rem
                WHERE s3rem.doc_id = tk.doc_id AND tk.pos BETWEEN s3rem.s AND s3rem.e
            )
        ),
        decon AS (
            SELECT p.doc_id,
                   coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text,
                   p.lang
            FROM pool p LEFT JOIN s3kept k ON k.doc_id = p.doc_id
            GROUP BY p.doc_id, p.lang
        ),
        dc AS (SELECT * FROM decon WHERE text <> ''),
        gate AS (
            SELECT * FROM dc
            WHERE {inference.quality_logit_sql("coalesce(text, '')")} >= 0.0
        ),
        mixed AS (
            SELECT * FROM gate
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 10000
                  < CASE lang {" ".join(
                        f"WHEN '{k}' THEN {int(round(v * 10000))}"
                        for k, v in PREP_MIX.items()
                    )} ELSE 0 END
        ),
        pk0 AS (
            SELECT doc_id, lang,
                   {inference.stub_bpe_count_sql()} AS n_tokens,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                       % {PREP_PACK_SHARDS} AS shard
            FROM mixed
        ),
        pk AS (
            SELECT *, CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang, shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / {PREP_BUDGET}) AS BIGINT) AS seq_index
            FROM pk0
        ),
        sh AS (
            SELECT *, ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                       % {PREP_SHARDS} AS shard_id
            FROM pk
        )
        SELECT shard_id, count(*) AS n_docs,
               count(DISTINCT (lang, shard, seq_index)) AS n_seqs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               count(DISTINCT lang) AS n_langs
        FROM sh GROUP BY shard_id
    """,
    # the classifier gate's score arithmetic recomputed from the SAME
    # constants (inference.quality_logit_sql): integer features x dyadic
    # weights make the log-odds exact in doubles, so the comparison is
    # bit-equal with no tolerance; the gate is logit >= 0 (sigmoid >= 0.5)
    "quality_classifier_gate": f"""
        SELECT doc_id,
               {inference.quality_logit_sql()} AS score,
               {inference.quality_logit_sql()} >= 0.0 AS kept
        FROM documents
    """,
}

# the chained 3-day entry's contract IS batch equality: its oracle is the
# identical full-corpus all-pairs maximal-run SQL (no restriction clause) —
# a green row proves chained probes over union-appended indexes reproduce
# the one-shot batch answer exactly
ORACLES_EXT["dedup_chained_substring"] = ORACLES_EXT["dedup_substring_spans"]

# ---------------------------------------------------------------------------
# round-9 continuation: graph analytics + deterministic KMV / Misra-Gries
# sketches (Spark sides in queries_graph.py; every sketch is md5-derived so
# the oracle RECOMPUTES it — the sketch_count_min contract style)
# ---------------------------------------------------------------------------

from iceberg_ingestion_spark.queries_graph import (  # noqa: E402,F401
    HH_K, HH_PARTS, KMV_BOUND, KMV_INTER_TOL, KMV_K, KMV_SET_A, KMV_SET_B,
)


#: pieces for the apex-partitioned triangle census (VERDICT r10 #2): the
#: list_intersect census OOM'd the capped DuckDB child on the full sf1
#: graph (>78 GB spill); partitioning the oriented 3-way edge join by the
#: path apex keeps each piece's intermediate at ~Sigma outdeg^2/P (proved in
#: tools/census_full_check.py, graduated into the graded oracles here —
#: measured 22.9 s at sf1 under the 24 GB cap, full graph = 18,844,880)
CENSUS_PIECES = 16


def _census_pieces_sql(oriented: str, pieces: int = CENSUS_PIECES) -> str:
    """Piecewise UNION ALL triangle count over an oriented-edge CTE
    ``oriented`` (columns s, t): each branch counts the triangles whose
    oriented path apex falls in one residue class — an EXACT partition of
    the triangle set (every triangle is exactly one oriented path + closing
    edge; the apex is a function of the triangle)."""
    return "\n      UNION ALL ".join(
        f"SELECT count(*) AS n FROM {oriented} p1 "
        f"JOIN {oriented} p2 ON p2.s = p1.t "
        f"JOIN {oriented} p3 ON p3.s = p1.s AND p3.t = p2.t "
        f"WHERE p1.s % {pieces} = {i}"
        for i in range(pieces)
    )

#: per-type distinct user-day universe (KMV element convention; the Spark
#: side is _kmv_elements — concat_ws + ts_us div, identical here)
_KMV_EL = f"""
el AS (SELECT event_type,
              user_id::VARCHAR || ':' ||
                  (epoch_us(ts) // {TS_BUCKET_US})::VARCHAR AS value
       FROM events)
"""

ORACLES_EXT["sketch_kmv_distinct"] = f"""
    WITH {_KMV_EL},
    d AS (SELECT DISTINCT event_type, value FROM el),
    h AS (SELECT event_type, value,
                 ('0x' || substr(md5(value), 1, 8))::BIGINT AS hv FROM d),
    sk AS (SELECT event_type, value, hv FROM h
           QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY hv, value) <= {KMV_K}),
    ag AS (SELECT event_type, count(*) AS n_slots, max(hv) AS hk
           FROM sk GROUP BY 1),
    ex AS (SELECT event_type, count(*) AS exact_distinct FROM d GROUP BY 1),
    est AS (SELECT event_type, n_slots,
                   CASE WHEN n_slots < {KMV_K} THEN CAST(n_slots AS DOUBLE)
                        ELSE CAST({(KMV_K - 1) * 4294967296} AS DOUBLE) / hk
                   END AS est_distinct
            FROM ag)
    SELECT e.event_type,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           CAST(e.n_slots AS BIGINT) AS n_slots,
           e.est_distinct,
           CASE WHEN e.n_slots < {KMV_K}
                THEN e.est_distinct = x.exact_distinct
                ELSE abs(e.est_distinct / x.exact_distinct - 1.0)
                     <= {KMV_BOUND!r}
           END AS within_bound
    FROM est e JOIN ex x USING (event_type)
"""

ORACLES_EXT["sketch_kmv_intersection"] = f"""
    WITH {_KMV_EL},
    a AS (SELECT DISTINCT value FROM el WHERE event_type = '{KMV_SET_A}'),
    b AS (SELECT DISTINCT value FROM el WHERE event_type = '{KMV_SET_B}'),
    u AS (SELECT value FROM a UNION SELECT value FROM b),
    h AS (SELECT value, ('0x' || substr(md5(value), 1, 8))::BIGINT AS hv
          FROM u),
    sk AS (SELECT value, hv FROM h
           QUALIFY ROW_NUMBER() OVER (ORDER BY hv, value) <= {KMV_K}),
    ag AS (SELECT count(*) AS n_slots, max(hv) AS hk FROM sk),
    nb AS (SELECT count(*) AS n_both FROM sk
           WHERE value IN (SELECT value FROM a)
             AND value IN (SELECT value FROM b)),
    ex AS (SELECT count(*) AS exact_inter FROM a JOIN b USING (value)),
    est AS (SELECT n_slots,
                   CASE WHEN n_slots < {KMV_K} THEN CAST(n_slots AS DOUBLE)
                        ELSE CAST({(KMV_K - 1) * 4294967296} AS DOUBLE) / hk
                   END AS est_union
            FROM ag)
    SELECT CAST(nb.n_both AS BIGINT) AS n_both,
           CAST(ex.exact_inter AS BIGINT) AS exact_inter,
           est.est_union,
           nb.n_both * est.est_union / {KMV_K} AS est_inter,
           CASE WHEN est.n_slots < {KMV_K} THEN TRUE
                ELSE abs(nb.n_both * est.est_union / {KMV_K} - ex.exact_inter)
                     <= {KMV_INTER_TOL!r} * est.est_union
           END AS within_bound
    FROM nb CROSS JOIN est CROSS JOIN ex
"""

ORACLES_EXT["sketch_heavy_hitters"] = f"""
    WITH toks AS (
        SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % {HH_PARTS} AS p,
               unnest({_TOKS}) AS value
        FROM documents
    ),
    counts AS (SELECT p, value, count(*) AS c FROM toks GROUP BY 1, 2),
    ranked AS (SELECT p, value, c,
                      ROW_NUMBER() OVER (PARTITION BY p
                                         ORDER BY c DESC, value) AS r
               FROM counts),
    off AS (SELECT p, c AS _off FROM ranked WHERE r = {HH_K} + 1),
    pruned AS (SELECT ranked.value,
                      ranked.c - coalesce(off._off, 0) AS est
               FROM ranked LEFT JOIN off USING (p)
               WHERE ranked.c - coalesce(off._off, 0) > 0),
    mg AS (SELECT value, CAST(sum(est) AS BIGINT) AS est_cnt
           FROM pruned GROUP BY 1),
    exact AS (SELECT value, count(*) AS exact_cnt FROM toks GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT mg.value AS token, mg.est_cnt,
           CAST(exact.exact_cnt AS BIGINT) AS exact_cnt,
           mg.est_cnt <= exact.exact_cnt AS never_over,
           ({HH_K} + 1) * (exact.exact_cnt - mg.est_cnt) <= tot.n
               AS within_bound
    FROM mg JOIN exact USING (value) CROSS JOIN tot
"""

ORACLES_EXT["graph_triangle_count"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    deg AS MATERIALIZED (SELECT v, count(*) AS d
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
            GROUP BY v),
    o AS MATERIALIZED (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.src ELSE e.dst END AS s,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.dst ELSE e.src END AS t
          FROM e JOIN deg da ON da.v = e.src JOIN deg db ON db.v = e.dst),
    tri AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS n_triangles FROM (
      {_census_pieces_sql('o')}
    )),
    wed AS (SELECT CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges,
                   count(*) AS n_vertices
            FROM deg),
    ec AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
           CAST(n_edges AS BIGINT) AS n_edges,
           n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           3.0 * n_triangles / n_wedges AS global_clustering
    FROM wed CROSS JOIN ec CROSS JOIN tri
"""

from iceberg_ingestion_spark.queries_graph import (  # noqa: E402,F401
    BFS_MAX_HOP, BFS_SEED_MOD,
)

# min-hop BFS: the oracle is a recursive CTE with min-per-vertex semantics;
# the HAVING mirrors Spark's groupBy-omits-empty for the unreached row
ORACLES_EXT["graph_bfs_hops"] = f"""
    WITH g AS (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e0 AS (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    verts AS (SELECT DISTINCT src AS v FROM e),
    seeds AS (SELECT v FROM verts WHERE v % {BFS_SEED_MOD} = 0),
    walk AS (
        WITH RECURSIVE w(v, hop) AS (
            SELECT v, 0 FROM seeds
            UNION
            SELECT e.dst, w.hop + 1 FROM w JOIN e ON e.src = w.v
            WHERE w.hop < {BFS_MAX_HOP}
        )
        SELECT v, min(hop) AS hop FROM w GROUP BY v
    ),
    reached AS (SELECT CAST(hop AS BIGINT) AS hop, count(*) AS n_parts
                FROM walk GROUP BY 1),
    unre AS (SELECT CAST(-1 AS BIGINT) AS hop, count(*) AS n_parts
             FROM verts WHERE v NOT IN (SELECT v FROM walk)
             HAVING count(*) > 0)
    SELECT * FROM reached UNION ALL SELECT * FROM unre
"""

from iceberg_ingestion_spark.queries_graph import TRI_SAMPLE_MOD, TRI_STREAM_MOD  # noqa: E402,F401

from iceberg_ingestion_spark.queries_graph import CC_EDGE_MOD  # noqa: E402

# connected components of the md5 1/128-sampled co-occurrence graph: the
# min-label recursive-CTE fixpoint recomputes every label (the pruning
# `w.lbl < e.dst` is exact: a label larger than an intermediate vertex is
# dominated by that vertex's own label on every continuation), then the
# size histogram is compared bucket-by-bucket
ORACLES_EXT["graph_connected_components"] = f"""
    WITH g AS (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e0 AS (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    es AS (SELECT src, dst FROM e0
           WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
                                 1, 8))::BIGINT % {CC_EDGE_MOD} = 0),
    e AS (SELECT src, dst FROM es UNION ALL SELECT dst, src FROM es),
    verts AS (SELECT DISTINCT src AS v FROM e),
    walk AS (
        WITH RECURSIVE w(v, lbl) AS (
            SELECT v, v FROM verts
            UNION
            SELECT e.dst, w.lbl FROM w JOIN e ON e.src = w.v
            WHERE w.lbl < e.dst
        )
        SELECT v, min(lbl) AS comp FROM w GROUP BY v
    ),
    sizes AS (SELECT comp, count(*) AS sz FROM walk GROUP BY comp)
    SELECT CAST(sz AS BIGINT) AS component_size,
           count(*) AS n_components
    FROM sizes GROUP BY sz
"""

# DOULION sampled triangle estimate: both the exact and sampled censuses are
# recomputed (the sample coin is md5(edge), engine-independent); the 10% band
# check is integer arithmetic
ORACLES_EXT["graph_triangle_sampled"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    deg AS MATERIALIZED (SELECT v, count(*) AS d
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
            GROUP BY v),
    o AS MATERIALIZED (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.src ELSE e.dst END AS s,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.dst ELSE e.src END AS t
          FROM e JOIN deg da ON da.v = e.src JOIN deg db ON db.v = e.dst),
    tri AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS n FROM (
      {_census_pieces_sql('o')}
    )),
    es AS MATERIALIZED (SELECT src, dst FROM e
           WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
                                 1, 8))::BIGINT % {TRI_SAMPLE_MOD} = 0),
    degs AS MATERIALIZED (SELECT v, count(*) AS d
             FROM (SELECT src AS v FROM es UNION ALL SELECT dst AS v FROM es)
             GROUP BY v),
    os AS MATERIALIZED (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND es.src < es.dst)
                       THEN es.src ELSE es.dst END AS s,
                  CASE WHEN da.d < db.d OR (da.d = db.d AND es.src < es.dst)
                       THEN es.dst ELSE es.src END AS t
           FROM es JOIN degs da ON da.v = es.src
                   JOIN degs db ON db.v = es.dst),
    tris AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS n FROM (
      {_census_pieces_sql('os')}
    )),
    ecs AS (SELECT count(*) AS n FROM es)
    SELECT CAST(ecs.n AS BIGINT) AS n_edges_sampled,
           CAST(tris.n AS BIGINT) AS n_triangles_sampled,
           CAST(tris.n * {TRI_SAMPLE_MOD ** 3} AS BIGINT) AS est_triangles,
           CAST(tri.n AS BIGINT) AS n_triangles_exact,
           20 * abs(tris.n * {TRI_SAMPLE_MOD ** 3} - tri.n) <= 3 * tri.n
               AS within_15pct
    FROM ecs CROSS JOIN tris CROSS JOIN tri
"""

# streamed KMV == batch KMV (mergeable-summary invariant): the oracle is the
# identical batch sketch SQL — a green row proves the streamed table exactly
# reproduces the one-shot batch sketch
ORACLES_EXT["sketch_kmv_stream"] = ORACLES_EXT["sketch_kmv_distinct"]
#: streamed MG == batch MG exactly (PODS'12 mergeability + the applied-part
#: ledger), so the streamed entry grades against the batch heavy-hitter SQL
ORACLES_EXT["sketch_mg_stream"] = ORACLES_EXT["sketch_heavy_hitters"]

# streamed triangle-index maintenance == one-shot batch census of the md5
# 1/4-sampled graph: same apex-partitioned piecewise census, restricted to
# the sampled edge set the maintainer ingested — a green row proves the
# streamed Δ-driven increments (ledgered, pointer-published) reproduce it
ORACLES_EXT["graph_stream_triangles"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e0 AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    es AS MATERIALIZED (SELECT src, dst FROM e0
           WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
                                 1, 8))::BIGINT % {TRI_STREAM_MOD} = 0),
    degs AS MATERIALIZED (SELECT v, count(*) AS d
             FROM (SELECT src AS v FROM es UNION ALL SELECT dst AS v FROM es)
             GROUP BY v),
    os AS MATERIALIZED (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND es.src < es.dst)
                       THEN es.src ELSE es.dst END AS s,
                  CASE WHEN da.d < db.d OR (da.d = db.d AND es.src < es.dst)
                       THEN es.dst ELSE es.src END AS t
           FROM es JOIN degs da ON da.v = es.src
                   JOIN degs db ON db.v = es.dst),
    tri AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS n FROM (
      {_census_pieces_sql('os')}
    )),
    ec AS (SELECT count(*) AS n FROM es)
    SELECT CAST(ec.n AS BIGINT) AS n_edges, CAST(tri.n AS BIGINT) AS n_triangles
    FROM ec CROSS JOIN tri
"""

# chained triangle IVM == one-shot batch census: the oracle recomputes the
# full census (edge count + triangle count) over ALL edges — a green row
# proves the 3 chained Δ-driven increments reproduce the batch answer
ORACLES_EXT["graph_chained_triangles"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    deg AS MATERIALIZED (SELECT v, count(*) AS d
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
            GROUP BY v),
    o AS MATERIALIZED (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.src ELSE e.dst END AS s,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.dst ELSE e.src END AS t
          FROM e JOIN deg da ON da.v = e.src JOIN deg db ON db.v = e.dst),
    tri AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS n FROM (
      {_census_pieces_sql('o')}
    )),
    ec AS (SELECT count(*) AS n FROM e)
    SELECT CAST(ec.n AS BIGINT) AS n_edges, CAST(tri.n AS BIGINT) AS n_triangles
    FROM ec CROSS JOIN tri
"""

from iceberg_ingestion_spark.queries_graph import JS_MOD  # noqa: E402,F401

# correlated-sample join sizing: the oracle recomputes the md5 key sample and
# both sums; estimator and band are integer arithmetic
ORACLES_EXT["sketch_join_size"] = f"""
    WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
    ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_size FROM c),
    es AS (SELECT CAST(sum(c * c) * {JS_MOD} AS BIGINT) AS est_size,
                  count(*) AS n_sampled_keys
           FROM c
           WHERE ('0x' || substr(md5(l_partkey::VARCHAR), 1, 8))::BIGINT
                 % {JS_MOD} = 0)
    SELECT exact_size, est_size, CAST(n_sampled_keys AS BIGINT) AS n_sampled_keys,
           100 * abs(est_size - exact_size) <= 15 * exact_size AS within_15pct
    FROM es CROSS JOIN ex
"""


from iceberg_ingestion_spark.queries_graph import PR_ITERS, PR_TOPN  # noqa: E402

# integer-scaled fixed-iteration PageRank: the oracle unrolls the identical
# 3 rounds as chained CTEs; all arithmetic is BIGINT floor division, so the
# rank vector is bit-identical cross-engine (PR_ITERS is pinned to the
# unrolled round count by tests/test_r10_operators.py). Every CTE is
# AS MATERIALIZED: DuckDB 1.0 otherwise re-inlines the edge derivation into
# each unrolled round and the duplicated subplans spilled >30 GB at sf1;
# materialized, the full-graph oracle runs in ~47 s with no spill
ORACLES_EXT["graph_pagerank"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e0 AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM e GROUP BY 1),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
    it0 AS MATERIALIZED (SELECT v, 1000000000000 // nn.n AS pr FROM deg CROSS JOIN nn),
    s1 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it0 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it1 AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s1.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s1 ON s1.v = deg.v),
    s2 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it1 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it2 AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s2.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s2 ON s2.v = deg.v),
    s3 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it2 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it3 AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s3.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s3 ON s3.v = deg.v)
    SELECT CAST(v AS BIGINT) AS part, CAST(pr AS BIGINT) AS pr
    FROM it3 ORDER BY pr DESC, v LIMIT {PR_TOPN}
"""


ORACLES_EXT["graph_pagerank_weighted"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    ew AS MATERIALIZED (SELECT a.item AS src, b.item AS dst, count(*) AS w
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item
           GROUP BY 1, 2),
    e AS MATERIALIZED (SELECT src, dst, w FROM ew
                       UNION ALL SELECT dst, src, w FROM ew),
    wdeg AS MATERIALIZED (SELECT src AS v, sum(w) AS wd FROM e GROUP BY 1),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM wdeg),
    it0 AS MATERIALIZED (SELECT v, 1000000000000 // nn.n AS pr FROM wdeg CROSS JOIN nn),
    s1 AS MATERIALIZED (SELECT e.dst AS v, SUM((p.pr * e.w) // d.wd) AS s
             FROM it0 p JOIN wdeg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it1 AS MATERIALIZED (SELECT wdeg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s1.s, 0)) // 100 AS pr
              FROM wdeg CROSS JOIN nn LEFT JOIN s1 ON s1.v = wdeg.v),
    s2 AS MATERIALIZED (SELECT e.dst AS v, SUM((p.pr * e.w) // d.wd) AS s
             FROM it1 p JOIN wdeg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it2 AS MATERIALIZED (SELECT wdeg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s2.s, 0)) // 100 AS pr
              FROM wdeg CROSS JOIN nn LEFT JOIN s2 ON s2.v = wdeg.v),
    s3 AS MATERIALIZED (SELECT e.dst AS v, SUM((p.pr * e.w) // d.wd) AS s
             FROM it2 p JOIN wdeg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it3 AS MATERIALIZED (SELECT wdeg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s3.s, 0)) // 100 AS pr
              FROM wdeg CROSS JOIN nn LEFT JOIN s3 ON s3.v = wdeg.v)
    SELECT CAST(v AS BIGINT) AS part, CAST(pr AS BIGINT) AS pr
    FROM it3 ORDER BY pr DESC, v LIMIT {PR_TOPN}
"""


def _pr_converged_oracle() -> str:
    """Unrolled converged-PageRank oracle (VERDICT r10 #3): all
    PRC_MAX_ROUNDS rounds as materialized CTEs (the graph_pagerank
    convention), a per-round integer max-|Δ| CTE each, the stop round
    CASE-selected as the FIRST round whose delta is <= PRC_TOL_UNITS
    (exactly the Spark loop's early-exit), and the reported vector
    CASE-selected from the stop round — rounds_ran / converged / every rank
    recomputed, nothing asserted."""
    from iceberg_ingestion_spark.queries_graph import (
        PRC_MAX_ROUNDS,
        PRC_TOL_UNITS,
    )

    k = PRC_MAX_ROUNDS
    parts = [
        """g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem)""",
        """e0 AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item)""",
        "e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM e GROUP BY 1)",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM deg)",
        "it0 AS MATERIALIZED (SELECT v, 1000000000000 // nn.n AS pr FROM deg CROSS JOIN nn)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it{i - 1} p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst)"""
        )
        parts.append(
            f"""it{i} AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s{i}.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s{i} ON s{i}.v = deg.v)"""
        )
        parts.append(
            f"""d{i} AS MATERIALIZED (SELECT max(abs(a.pr - b.pr)) AS m
              FROM it{i} a JOIN it{i - 1} b ON a.v = b.v)"""
        )
    whens = " ".join(
        f"WHEN (SELECT m FROM d{i}) <= {PRC_TOL_UNITS} THEN {i}"
        for i in range(1, k + 1)
    )
    conv = " OR ".join(
        f"(SELECT m FROM d{i}) <= {PRC_TOL_UNITS}" for i in range(1, k + 1)
    )
    parts.append(f"stop AS (SELECT CASE {whens} ELSE {k} END AS r, ({conv}) AS conv)")
    pick = " ".join(f"WHEN {i} THEN it{i}.pr" for i in range(1, k + 1))
    joins = " ".join(f"JOIN it{i} ON it{i}.v = it1.v" for i in range(2, k + 1))
    parts.append(
        f"""fin AS (SELECT it1.v, CASE stop.r {pick} END AS pr,
                       stop.r AS rounds_ran, stop.conv AS converged
                FROM it1 {joins} CROSS JOIN stop)"""
    )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT CAST(v AS BIGINT) AS part, CAST(pr AS BIGINT) AS pr,
           CAST(rounds_ran AS BIGINT) AS rounds_ran, converged
    FROM fin ORDER BY pr DESC, v LIMIT {PR_TOPN}
    """


ORACLES_EXT["graph_pagerank_converged"] = _pr_converged_oracle()


from iceberg_ingestion_spark.queries_graph import LP_ITERS  # noqa: E402

# synchronized label propagation: the oracle unrolls the identical rounds;
# the argmax is (count DESC, label ASC) — a total order, so every label is
# engine-exact. MATERIALIZED throughout (the graph_pagerank lesson: DuckDB
# 1.0 re-inlines multi-referenced CTEs into each unrolled round)
ORACLES_EXT["graph_label_propagation"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid,
                                   l_partkey AS item FROM lineitem),
    e0 AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    es AS MATERIALIZED (SELECT src, dst FROM e0
           WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
                                 1, 8))::BIGINT % {CC_EDGE_MOD} = 0),
    e AS MATERIALIZED (SELECT src, dst FROM es
                       UNION ALL SELECT dst, src FROM es),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label FROM e),
    v1 AS MATERIALIZED (
        SELECT e.dst AS v, l.label, count(*) AS c
        FROM l0 l JOIN e ON e.src = l.v GROUP BY e.dst, l.label),
    l1 AS MATERIALIZED (
        SELECT v, label FROM v1
        QUALIFY ROW_NUMBER() OVER (PARTITION BY v
                                   ORDER BY c DESC, label) = 1),
    v2 AS MATERIALIZED (
        SELECT e.dst AS v, l.label, count(*) AS c
        FROM l1 l JOIN e ON e.src = l.v GROUP BY e.dst, l.label),
    l2 AS MATERIALIZED (
        SELECT v, label FROM v2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY v
                                   ORDER BY c DESC, label) = 1),
    sizes AS (SELECT label, count(*) AS sz FROM l2 GROUP BY label)
    SELECT CAST(sz AS BIGINT) AS community_size,
           count(*) AS n_communities
    FROM sizes GROUP BY sz
"""


# ---------------------------------------------------------------------------
# Round 12: personalized / streamed PageRank + k-core (VERDICT r11 #3-#5)
# ---------------------------------------------------------------------------

# personalized PageRank: identical unrolled integer rounds, with the
# teleport mass CASE-restricted to the seed set (seeds derived FROM the
# degree relation, exactly the operator's semi-join) — every rank
# bit-identical cross-engine, zeros exact
ORACLES_EXT["graph_pagerank_personalized"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e0 AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM e GROUP BY 1),
    seeds AS MATERIALIZED (SELECT v FROM deg WHERE v % {BFS_SEED_MOD} = 0),
    sn AS (SELECT count(*) AS ns FROM seeds),
    it0 AS MATERIALIZED (SELECT deg.v,
                     CASE WHEN seeds.v IS NOT NULL
                          THEN 1000000000000 // sn.ns ELSE 0 END AS pr
              FROM deg CROSS JOIN sn LEFT JOIN seeds ON seeds.v = deg.v),
    s1 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it0 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it1 AS MATERIALIZED (SELECT deg.v,
                     CASE WHEN seeds.v IS NOT NULL
                          THEN (15 * 1000000000000) // (100 * sn.ns)
                          ELSE 0 END
                     + (85 * COALESCE(s1.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN sn LEFT JOIN seeds ON seeds.v = deg.v
                       LEFT JOIN s1 ON s1.v = deg.v),
    s2 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it1 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it2 AS MATERIALIZED (SELECT deg.v,
                     CASE WHEN seeds.v IS NOT NULL
                          THEN (15 * 1000000000000) // (100 * sn.ns)
                          ELSE 0 END
                     + (85 * COALESCE(s2.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN sn LEFT JOIN seeds ON seeds.v = deg.v
                       LEFT JOIN s2 ON s2.v = deg.v),
    s3 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it2 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it3 AS MATERIALIZED (SELECT deg.v,
                     CASE WHEN seeds.v IS NOT NULL
                          THEN (15 * 1000000000000) // (100 * sn.ns)
                          ELSE 0 END
                     + (85 * COALESCE(s3.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN sn LEFT JOIN seeds ON seeds.v = deg.v
                       LEFT JOIN s3 ON s3.v = deg.v)
    SELECT CAST(v AS BIGINT) AS part, CAST(pr AS BIGINT) AS pr
    FROM it3 ORDER BY pr DESC, v LIMIT {PR_TOPN}
"""

# streamed PageRank maintenance == one-shot batch pagerank_fixed over the
# md5 1/2-sampled graph (the same graph the stream-triangle and DOULION
# entries grade): the oracle unrolls the identical 3 integer rounds over
# the sampled edge relation — a green row proves the maintained state
# (edge log + upserted degree vector) drives the kernel to the exact
# batch vector
ORACLES_EXT["graph_stream_pagerank"] = f"""
    WITH g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    ef AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    e0 AS MATERIALIZED (SELECT src, dst FROM ef
           WHERE ('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR),
                                 1, 8))::BIGINT % {TRI_STREAM_MOD} = 0),
    e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM e GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    it0 AS MATERIALIZED (SELECT v, 1000000000000 // nn.n AS pr FROM deg CROSS JOIN nn),
    s1 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it0 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it1 AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s1.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s1 ON s1.v = deg.v),
    s2 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it1 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it2 AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s2.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s2 ON s2.v = deg.v),
    s3 AS MATERIALIZED (SELECT e.dst AS v, SUM(p.pr // d.d) AS s
             FROM it2 p JOIN deg d ON d.v = p.v JOIN e ON e.src = p.v
             GROUP BY e.dst),
    it3 AS MATERIALIZED (SELECT deg.v,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s3.s, 0)) // 100 AS pr
              FROM deg CROSS JOIN nn LEFT JOIN s3 ON s3.v = deg.v)
    SELECT CAST(v AS BIGINT) AS part, CAST(pr AS BIGINT) AS pr
    FROM it3 ORDER BY pr DESC, v LIMIT {PR_TOPN}
"""


def _kcore_oracle() -> str:
    """Unrolled bounded k-core oracle (VERDICT r11 #5): every peel round as
    MAINTAINED-DEGREE CTEs mirroring ``graph.kcore_peel`` exactly — removal
    set from the maintained degree vector, edge filter, Δ-sized degree
    decrements — with the stop round CASE-selected as the FIRST round whose
    removal set is empty (the Spark loop's early-exit) and the final counts
    CASE-selected from the stop round. rounds_ran / converged / both counts
    recomputed, nothing asserted."""
    from iceberg_ingestion_spark.queries_graph import KC_K, KC_MAX_ROUNDS

    k, rmax = KC_K, KC_MAX_ROUNDS
    parts = [
        """g AS MATERIALIZED (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem)""",
        """e0 AS MATERIALIZED (SELECT DISTINCT a.item AS src, b.item AS dst
           FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item)""",
        """d0 AS MATERIALIZED (SELECT v, count(*) AS d
           FROM (SELECT src AS v FROM e0 UNION ALL SELECT dst AS v FROM e0)
           GROUP BY v)""",
    ]
    for i in range(1, rmax + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT v FROM d{i - 1} WHERE d < {k})"
        )
        parts.append(
            f"""e{i} AS MATERIALIZED (SELECT src, dst FROM e{i - 1}
             WHERE src NOT IN (SELECT v FROM r{i})
               AND dst NOT IN (SELECT v FROM r{i}))"""
        )
        parts.append(
            f"""dec{i} AS (SELECT v, count(*) AS c FROM (
               SELECT dst AS v FROM e{i - 1}
               WHERE src IN (SELECT v FROM r{i})
                 AND dst NOT IN (SELECT v FROM r{i})
               UNION ALL
               SELECT src AS v FROM e{i - 1}
               WHERE dst IN (SELECT v FROM r{i})
                 AND src NOT IN (SELECT v FROM r{i})
             ) GROUP BY v)"""
        )
        parts.append(
            f"""d{i} AS MATERIALIZED (SELECT a.v, a.d - COALESCE(dec{i}.c, 0) AS d
             FROM d{i - 1} a LEFT JOIN dec{i} ON dec{i}.v = a.v
             WHERE a.v NOT IN (SELECT v FROM r{i}))"""
        )
    whens = " ".join(
        f"WHEN (SELECT count(*) FROM r{i}) = 0 THEN {i}"
        for i in range(1, rmax + 1)
    )
    conv = " OR ".join(
        f"(SELECT count(*) FROM r{i}) = 0" for i in range(1, rmax + 1)
    )
    parts.append(
        f"stop AS (SELECT CASE {whens} ELSE {rmax} END AS r, ({conv}) AS conv)"
    )
    pick_v = " ".join(
        f"WHEN {i} THEN (SELECT count(*) FROM d{i})" for i in range(1, rmax + 1)
    )
    pick_e = " ".join(
        f"WHEN {i} THEN (SELECT count(*) FROM e{i})" for i in range(1, rmax + 1)
    )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT CAST(CASE stop.r {pick_v} END AS BIGINT) AS n_core_vertices,
           CAST(CASE stop.r {pick_e} END AS BIGINT) AS n_core_edges,
           CAST(stop.r AS BIGINT) AS rounds_ran,
           stop.conv AS converged
    FROM stop
    """


ORACLES_EXT["graph_kcore"] = _kcore_oracle()

"""DuckDB SQL fragment builders shared by the extension oracles (split out of
queries_ext.py in round 5 — pure mechanical move). Every fragment mirrors the
exact fold/convention its Spark counterpart uses so value hashes match
bit-for-bit."""

from __future__ import annotations

from iceberg_ingestion_spark.queries_text_dedup import *  # noqa: F401,F403

_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_BPE = r"regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]')"
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _stop_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, _t -> _t IN ({words})))"


def _lang_case_sql() -> str:
    langs = list(text.LANG_STOPWORDS)
    scores = {lang: _stop_hits_sql(lang) for lang in langs}
    best = f"greatest({', '.join(scores.values())})"
    whens = "\n".join(
        f"WHEN {scores[lang]} >= {best} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


def _simhash_sql() -> str:
    sums = ",\n".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(60)
    )
    bits = " + ".join(f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(60))
    return f"""
        WITH toked AS (
            SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
        ), hashed AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toked
        ), sums AS (
            SELECT doc_id, {sums} FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums
    """


def _dot_sql(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, EMBED_DIM + 1)
    )


def _cosine_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)}) / sqrt(({_dot_sql(a, a)}) * ({_dot_sql(b, b)}))"


def _sqdist_sql(a: str, b: str) -> str:
    """Left-folded squared L2 — the SQL mirror of ``clustering.sqdist``."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, EMBED_DIM + 1)
    )


_JACCARD_CTE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS ss
    FROM toks
),
ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
inter AS (
    SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS n_inter
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT id_1, id_2, n_inter * 1.0 / (la.c + lb.c - n_inter) AS jaccard
    FROM inter
    JOIN (SELECT doc_id, len(ss) AS c FROM sh) la ON la.doc_id = id_1
    JOIN (SELECT doc_id, len(ss) AS c FROM sh) lb ON lb.doc_id = id_2
)
"""

_SESSION_CTE = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
flagged AS (
    SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > {gap} THEN 1 ELSE 0 END AS is_start
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessioned AS (
    -- CAST: DuckDB window SUM over INTEGER is HUGEINT (float64 via Arrow);
    -- Spark's running sum is LongType. BIGINT keeps the hash type-identical.
    SELECT *, CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index
    FROM flagged
)
""".format(gap=SESSION_GAP_US)


#: the fixed-size md5-rank query panel (VERDICT r8 #1) — mirrors
#: ``ann_panel_filter``'s bounded draw exactly: Spark md5(CAST(bigint AS
#: string)) and DuckDB md5(CAST(... AS VARCHAR)) hash the same decimal text
_ANN_PANEL_SQL = (
    "SELECT vec_id FROM embeddings "
    f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ANN_PANEL_SIZE}"
)

_BRUTEFORCE_TOPK_SQL = f"""
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {_cosine_sql('q.embedding', 'c.embedding')} DESC, c.vec_id) AS rank,
               {_cosine_sql('q.embedding', 'c.embedding')} AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id IN ({_ANN_PANEL_SQL})
        QUALIFY rank <= {ANN_K}
    """

_ANN_RECALL_ORACLE = f"""
        WITH topk AS ({_BRUTEFORCE_TOPK_SQL})
        SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
               CAST(count(*) AS BIGINT) AS n_exact_pairs,
               TRUE AS recall_ok
        FROM topk
    """


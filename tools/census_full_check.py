"""FULL-graph triangle-census verification (VERDICT r9 #5).

r11: the apex-partitioned formulation proven here is GRADUATED into the
census entries' graded oracles (``queries_ext_oracles._census_pieces_sql``
— a piecewise UNION ALL inside one query; the 1/4-order ``TRI_ORDER_MOD``
fixture is retired and every census entry grades the FULL graph in the
normal sweep). This tool remains as the independent standalone
cross-check: sequential fresh-child-per-piece isolation, cumulative
per-piece output, usable against any SF without the sweep harness.

History: the single-box DuckDB oracle OOM'd on the full sf1 co-occurrence
graph in the list_intersect formulation (BASELINE.md r9: one OOM poisons
the sweep process). The verification ceiling was the ORACLE, not the
engine — closed by a PIECEWISE 3-WAY EDGE JOIN over the
degree-(id-tiebroken) oriented edge relation:

    triangles = Σ_i |{(a,b,c) : o(a,b), o(b,c), o(a,c), a % P == i}|

Each triangle is exactly one oriented path + closing edge (the same DAG
argument the engine uses), and partitioning by the path APEX ``a``
partitions the triangle set exactly — the md5-vertex-partition double-count
idea from VERDICT r9 #5, evaluable one piece at a time. Why piecewise: the
one-shot 3-way join's path relation is Σ outdeg² rows (measured 834 M on
the full sf1 graph, max outdeg 97 after orientation) and DuckDB spills it
with enough serialization overhead to exhaust the disk (>78 GB — observed);
each 1/P piece keeps the intermediate ~Σ/P rows and runs comfortably under
the cap. The oriented relation is derived ONCE into a scratch parquet and
re-read per piece; every piece runs in a fresh spawned child (the
check_oracle isolation discipline — an OOM cannot poison the caller).

Usage::

    python tools/census_full_check.py /root/repo/.data/sf1          # full graph
    python tools/census_full_check.py /root/testdata/sf0.1          # fast SFs

Prints one line per run: Spark census, DuckDB 3-way-join census, MATCH /
MISMATCH; exit 0 iff they agree. Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: pieces for the apex partition; per-piece path intermediate ~ Σoutdeg²/P
N_PIECES = 16

ORIENT_SQL = """
    WITH g AS (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e AS (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    deg AS (SELECT v, count(*) AS d
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
            GROUP BY v)
    SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                THEN e.src ELSE e.dst END AS s,
           CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                THEN e.dst ELSE e.src END AS t
    FROM e JOIN deg da ON da.v = e.src JOIN deg db ON db.v = e.dst
"""

PIECE_SQL = """
    SELECT coalesce(CAST(count(*) AS BIGINT), 0) AS n
    FROM o p1 JOIN o p2 ON p2.s = p1.t JOIN o p3
        ON p3.s = p1.s AND p3.t = p2.t
    WHERE p1.s % {pieces} = {i}
"""


def _connect(spill_suffix: str = "duckdb_spill"):
    import duckdb

    con = duckdb.connect()
    con.sql("SET memory_limit='24GB'")
    spill = os.path.join(tempfile.gettempdir(), spill_suffix)
    os.makedirs(spill, exist_ok=True)
    con.sql(f"SET temp_directory='{spill}'")
    return con


def _orient_child(sf_dir: str, out_parquet: str) -> int:
    con = _connect()
    p = os.path.join(sf_dir, "lineitem.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM {src}")
    con.sql(f"COPY ({ORIENT_SQL}) TO '{out_parquet}' (FORMAT PARQUET)")
    return int(con.sql(f"SELECT count(*) FROM '{out_parquet}'").fetchone()[0])


def _piece_child(o_parquet: str, pieces: int, i: int) -> int:
    con = _connect()
    con.sql(f"CREATE VIEW o AS SELECT * FROM '{o_parquet}'")
    return int(con.sql(PIECE_SQL.format(pieces=pieces, i=i)).fetchone()[0])


def duckdb_census(sf_dir: str, pieces: int = N_PIECES) -> int:
    """Full-graph census, apex-partitioned: orient once into scratch
    parquet, then one fresh spawned child per piece (fresh allocator; an
    OOM cannot poison the caller — the check_oracle discipline)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    scratch = tempfile.mkdtemp(prefix="census_o_")
    o_parquet = os.path.join(scratch, "o.parquet")
    try:
        with ctx.Pool(1, maxtasksperchild=1) as pool:
            n_edges = pool.apply(_orient_child, (sf_dir, o_parquet))
        total = 0
        for i in range(pieces):
            with ctx.Pool(1, maxtasksperchild=1) as pool:
                c = pool.apply(_piece_child, (o_parquet, pieces, i))
            total += c
            print(f"  piece {i + 1}/{pieces}: {c} (cum {total})", flush=True)
        print(f"  oriented edges: {n_edges}", flush=True)
        return total
    finally:
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)


def spark_census(sf_dir: str) -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from iceberg_ingestion_spark.operators import graph
    from iceberg_ingestion_spark.queries import read_table
    from iceberg_ingestion_spark.session import build_session

    spark = build_session()
    l = read_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey")
    return int(graph.triangle_stats(edges).first()["n_triangles"])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t0 = time.time()
    s = spark_census(sf_dir)
    t_spark = time.time() - t0
    t0 = time.time()
    d = duckdb_census(sf_dir)
    t_duck = time.time() - t0
    ok = s == d
    print(
        f"census_full_check {sf_dir}: spark={s} ({t_spark:.1f}s) "
        f"duckdb_3way={d} ({t_duck:.1f}s) {'MATCH' if ok else 'MISMATCH'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""FULL-graph triangle-census verification (VERDICT r9 #5).

The driver census entries grade a deterministic md5 1/4-order fixture
(``TRI_ORDER_MOD``) because the single-box DuckDB oracle OOM'd on the full
sf1 co-occurrence graph in the list_intersect formulation (BASELINE.md r9:
one OOM poisons the sweep process). The verification ceiling was the
ORACLE, not the engine — this tool closes the gap with the formulation that
stays constant-memory at any graph size: the oriented 3-WAY EDGE JOIN

    triangles = |{(a,b,c) : o(a,b), o(b,c), o(a,c)}|

over the degree-(id-tiebroken) oriented edge relation. Each triangle is
exactly one oriented path + closing edge (the same DAG argument the engine
uses), and DuckDB pipelines the path relation through the second hash join
without materializing it — memory is bounded by the edge hash tables, with
a 24 GB cap + spill dir, run in a fresh spawned child (the check_oracle
isolation discipline). It is slow (~700 s at sf1 — why it is a per-round
evidence tool, not a per-sweep oracle), but it COMPLETES, which the array
formulation does not.

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

CENSUS_3WAY_SQL = """
    WITH g AS (SELECT DISTINCT l_orderkey AS gid, l_partkey AS item
               FROM lineitem),
    e AS (SELECT DISTINCT a.item AS src, b.item AS dst
          FROM g a JOIN g b ON a.gid = b.gid AND a.item < b.item),
    deg AS (SELECT v, count(*) AS d
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
            GROUP BY v),
    o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.src ELSE e.dst END AS s,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
                      THEN e.dst ELSE e.src END AS t
          FROM e JOIN deg da ON da.v = e.src JOIN deg db ON db.v = e.dst)
    SELECT coalesce(CAST(count(*) AS BIGINT), 0) AS n_triangles
    FROM o p1 JOIN o p2 ON p2.s = p1.t JOIN o p3
        ON p3.s = p1.s AND p3.t = p2.t
"""


def _duckdb_child(sf_dir: str) -> int:
    import duckdb

    con = duckdb.connect()
    con.sql("SET memory_limit='24GB'")
    spill = os.path.join(tempfile.gettempdir(), "duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.sql(f"SET temp_directory='{spill}'")
    p = os.path.join(sf_dir, "lineitem.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM {src}")
    return int(con.sql(CENSUS_3WAY_SQL).fetchone()[0])


def duckdb_census(sf_dir: str) -> int:
    """Full-graph census in a fresh spawned child (fresh allocator; an OOM
    cannot poison the caller — the check_oracle discipline)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(1, maxtasksperchild=1) as pool:
        return pool.apply(_duckdb_child, (sf_dir,))


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

"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given scale factor, compares row-count, column names and order-insensitive
values, and prints a PASS/FAIL table. Use before committing new queries.

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    if len(spark_df) != len(duck_df):
        return f"ROWS {len(spark_df)} vs {len(duck_df)}"
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLS {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    a, b = normalize(spark_df), normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # int-vs-float kind drift is how a DuckDB HUGEINT (e.g. SUM over INTEGER,
        # which Arrow surfaces as float64) shows up against a Spark LongType: the
        # values coerce equal but the driver's value-hash sees different types.
        # CAST the oracle to BIGINT instead of loosening this.
        if {av.dtype.kind, bv.dtype.kind} == {"i", "f"}:
            return f"TYPE col={c}: spark {av.dtype} vs duck {bv.dtype} (HUGEINT? cast oracle to BIGINT)"
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np

            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
            ):
                bad = (av.astype(float) != bv.astype(float)).idxmax()
                return f"VAL col={c} row={bad}: {av[bad]!r} vs {bv[bad]!r}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = (av.astype(str) != bv.astype(str)).idxmax()
                return f"VAL col={c} row={bad}: {av[bad]!r} vs {bv[bad]!r}"
    return "OK"


def _run_oracle_child(sf_dir: str, sql: str):
    """Execute ONE oracle in a fresh spawned process and return its frame.

    Why a subprocess: at sf1 a heavy oracle sharing the sweep process with
    the Spark JVM can exhaust the machine's commit budget, and DuckDB's
    allocator RETAINS its arenas after an out-of-memory failure — one OOM
    then poisons every later entry (observed: subsequent unrelated oracles
    failing 2 KB allocations and Spark legs failing pthread_create). A
    short-lived child gives each oracle a fresh allocator, releases
    everything at exit, and converts a worst-case failure into one FAIL row
    instead of a dead sweep. Bounded at 24 GB with an explicit spill dir so
    a big census degrades to disk instead of taking out the child."""
    con = duckdb.connect()
    con.sql("SET memory_limit='24GB'")
    spill = os.path.join(tempfile.gettempdir(), "duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.sql(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written tables (e.g. the generated sf1) are DIRECTORIES
            # of part files; DuckDB needs the glob form for those
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.sql(sql).df()


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    """One oracle, one fresh child process (see _run_oracle_child)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(1, maxtasksperchild=1) as pool:
        return pool.apply(_run_oracle_child, (sf_dir, sql))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not os.path.isdir(sf_dir):
        print(f"check_oracle: sf dir {sf_dir!r} does not exist", file=sys.stderr)
        return 2

    import __spark_entry__ as e
    from iceberg_ingestion_spark.session import build_session

    spark = build_session(app_name="check-oracle")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:45s} SPARK-ERROR {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:45s} rows={len(sdf):7d} (no oracle) {time.time()-t0:6.1f}s")
            continue
        try:
            ddf = run_oracle(sf_dir, oracles[name])
        except Exception as exc:  # noqa: BLE001
            print(f"{name:45s} DUCK-ERROR {exc}")
            failures += 1
            continue
        verdict = compare(sdf, ddf)
        status = "PASS" if verdict == "OK" else f"FAIL {verdict}"
        if verdict != "OK":
            failures += 1
        print(f"{name:45s} rows={len(sdf):7d} {time.time()-t0:6.1f}s  {status}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

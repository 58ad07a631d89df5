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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not os.path.isdir(sf_dir):
        print(f"check_oracle: sf dir {sf_dir!r} does not exist", file=sys.stderr)
        return 2

    import __spark_entry__ as e
    from iceberg_ingestion_spark.session import build_session

    spark = build_session(app_name="check-oracle")
    con = duckdb.connect()
    # Bound DuckDB so a heavy oracle SPILLS instead of exhausting the
    # machine: its default cap (80% of RAM) collides with the sf1 Spark JVM
    # — one OOM then poisons the shared process (observed: every later
    # entry, including Spark legs, failing malloc). 32 GB + an explicit
    # spill dir keeps the big graph censuses disk-bound and the process
    # healthy.
    con.sql("SET memory_limit='32GB'")
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
            ddf = con.sql(oracles[name]).df()
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

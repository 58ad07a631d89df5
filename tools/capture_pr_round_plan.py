"""Capture the PER-ROUND PageRank kernel plan (the final entry plan is just a
scan of the localCheckpoint'd result, so the round plan is invisible there).

    python tools/capture_pr_round_plan.py <out_path> [sf_dir]

Builds the shared adjacency, then explains ONE `_pr_round` relation (the plan
every iteration executes before materialization).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators import graph
    from iceberg_ingestion_spark.operators.graph import _pr_round, _pr_setup
    from iceberg_ingestion_spark.operators.materialize import resolve
    from iceberg_ingestion_spark.queries import read_table
    from iceberg_ingestion_spark.session import build_session

    spark = build_session(app_name="pr_round_plan")
    l = read_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey")
    both, deg, n = _pr_setup(edges, resolve(None))
    scale = 10**12
    base = (15 * scale) // (100 * n)
    # the init vector exactly as pagerank_fixed builds it (old and new forms
    # differ here: (v, pr) vs (v, d, pr) — select what the current code needs)
    import inspect

    src = inspect.getsource(_pr_round)
    if "prd" in src:  # degree-rides-the-vector form
        pr0 = deg.select("v", "d", F.lit(scale // n).cast("long").alias("pr"))
    else:
        pr0 = deg.select("v", F.lit(scale // n).cast("long").alias("pr"))
    rel = _pr_round(pr0, deg, both, base, 85, n)
    plan = rel._sc._jvm.PythonSQLUtils.explainString(
        rel._jdf.queryExecution(), "formatted"
    )
    with open(out_path, "w") as fh:
        fh.write(plan)
    print(f"wrote {out_path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

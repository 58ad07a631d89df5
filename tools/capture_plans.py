"""Capture `.explain("formatted")` for entries into plans/<tag>/<name>_<suffix>.txt

    python tools/capture_plans.py <tag> <suffix> [sf_dir] name...

e.g. `python tools/capture_plans.py r12 before /root/testdata/sf0.1 graph_pagerank`.
Entries that execute work eagerly (streaming harnesses, persisted-index
builders) still produce a plan for their RESULT relation; the eager stages
are described by the entry's docstring, not the final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    import __spark_entry__ as entry_mod
    from iceberg_ingestion_spark.session import build_session

    QUERIES = entry_mod.queries()
    names = rest or list(QUERIES)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Ad-hoc single-entry timer: `python tools/time_entries.py [sf_dir] name...`
— same noop-sink materialization and warmup as bench.py, min over 2 passes.
For iterating on specific entries; the graded ledger is bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    import __spark_entry__ as entry_mod
    from iceberg_ingestion_spark.session import build_session

    QUERIES = entry_mod.queries()
    names = args or list(QUERIES)
    spark = build_session(app_name="time_entries")
    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(10_000).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best.get(name, 1e9), dt)
            spark.catalog.clearCache()
    for name in names:
        print(f"{name:45s} {best[name]:7.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

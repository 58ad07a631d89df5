"""Per-entry job-level profiler: `python tools/profile_entry.py [sf_dir] name...`

Runs each named entry through the bench's noop-sink materialization (after
the same warmup) and then reads the local Spark UI REST API to attribute the
entry's wall time to individual Spark jobs (description, duration, stage/task
counts). This is the guide-§1 "empirical loop" for a suite whose per-entry
cost at bench scale is fixed-cost dominated: it shows WHERE the jobs are
(eager materializations, stream drains, index writes) rather than just the
total. Ad-hoc tool — the graded ledger stays bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    import __spark_entry__ as entry_mod
    from iceberg_ingestion_spark.session import build_session

    QUERIES = entry_mod.queries()
    names = args or list(QUERIES)
    spark = build_session(app_name="profile_entry")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # bench-equivalent warmup (subset): decode each table family + python seam
    for table in ("lineitem", "orders", "events", "embeddings", "documents"):
        spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()
    spark.range(10_000).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        before = {j["jobId"] for j in _api(base, "/jobs")}
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        tot_ms = 0
        print(f"\n=== {name}: {dt:.2f}s wall, {len(jobs)} jobs ===")
        for j in jobs:
            sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            done = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ms = max(0, int(time.mktime(done) - time.mktime(sub)) * 1000)
            tot_ms += ms
            desc = (j.get("description") or j["name"])[:90]
            print(
                f"  job {j['jobId']:4d} {ms/1000:6.1f}s stages={j['numCompletedStages']:2d}"
                f" tasks={j['numCompletedTasks']:4d}  {desc}"
            )
        print(f"  (sum of job seconds ~{tot_ms/1000:.0f}s; gaps = driver/planning time)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

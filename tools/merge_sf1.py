"""Merge a fresh sf1 bench run into BENCH_SF1.json (the standing ledger
convention): entries whose transitive closure CHANGED this round carry the
fresh run's sample only; byte-unchanged entries take the per-row min of the
fresh run and the prior committed ledger (this host's intermittent external
load inflates whichever rows it overlaps — min-over-invocations reports the
engine's achievable cost, BASELINE.md r6 note). The changed set is derived
MECHANICALLY from the rotation ledger hashes vs the given base commit.

    python tools/merge_sf1.py <fresh BENCH_FULL.json> <base-commit> [note]
"""

from __future__ import annotations

import json
import subprocess
import sys


def main() -> int:
    fresh_path = sys.argv[1]
    base = sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    fresh = json.load(open(fresh_path))
    prior = json.load(open("BENCH_SF1.json"))
    old_ledger = json.loads(
        subprocess.run(
            ["git", "show", f"{base}:tools/rotation_ledger.json"],
            capture_output=True, text=True, check=True,
        ).stdout
    )
    new_ledger = json.load(open("tools/rotation_ledger.json"))
    changed = {
        k for k in new_ledger
        if k not in old_ledger or old_ledger[k]["hash"] != new_ledger[k]["hash"]
    }
    merged: dict[str, float] = {}
    fresh_rows: dict[str, float] = {}
    for name, t in fresh["queries"].items():
        if t < 0:
            continue
        fresh_rows[name] = t
        p = prior["queries"].get(name, -1.0)
        if name in changed or p < 0:
            merged[name] = t
        else:
            merged[name] = min(t, p)
    out = {
        "metric": fresh["metric"],
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "queries": merged,
        # the fresh run verbatim (ADVICE r11): min-merging can never surface
        # a persistent slowdown in a byte-unchanged entry (e.g. cost shifted
        # onto it by a shared-relation change elsewhere), so the ledger
        # carries both — regressions stay visible as fresh >> merged rows
        "fresh_value": round(sum(fresh_rows.values()), 3),
        "queries_fresh": fresh_rows,
        "sf": fresh["sf"],
        "note": note,
    }
    json.dump(out, open("BENCH_SF1.json", "w"), indent=1)
    print(
        f"BENCH_SF1.json: {len(merged)} rows, min-merged total {out['value']}s "
        f"(fresh total {out['fresh_value']}s); "
        f"{len(changed & set(merged))} changed rows fresh-only, rest min-merged"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Compare two bench payloads (BENCH_FULL.json format, or a driver
BENCH_r{N}.json whose `tail` holds the truncated stdout line).

    python tools/bench_compare.py BENCH_FULL.json BENCH_r03.json [ratio]

Prints queries present in both, sorted by new/old ratio, flagging > the
given threshold (default 1.8). Exits 0 always — informational."""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    # driver artifact: parse per-query pairs out of the truncated tail
    tail = d.get("tail", "")
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*(-?\d+\.?\d*)', tail)
        if m.group(1) not in ("value", "sf", "n", "rc", "cpus")
    }


def main() -> int:
    new, old = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.8
    shared = sorted(
        (k for k in new if k in old and old[k] > 0 and new[k] >= 0),
        key=lambda k: new[k] / old[k],
        reverse=True,
    )
    tn, to = sum(new[k] for k in shared), sum(old[k] for k in shared)
    print(f"{len(shared)} shared queries: {to:.1f}s -> {tn:.1f}s ({tn/to:.2f}x)")
    for k in shared:
        r = new[k] / old[k]
        flag = "  <-- REGRESSION?" if r > threshold else ""
        if r > threshold or r < 1 / threshold:
            print(f"  {k:42s} {old[k]:7.2f} -> {new[k]:7.2f}  {r:5.2f}x{flag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Merge multiple bench.py JSON snapshots into per-query minima.

The sandbox host suffers random hypervisor-steal episodes that inflate
a different subset of queries on every pass (BASELINE.md "Round-3
session-3"); the per-query MINIMUM across passes is therefore the
code's actual steady-state profile. Usage:

    python tools/bench_minima.py out.json in1.json in2.json [...]

Queries missing from older snapshots (added later in the round) carry
the minimum over the passes that have them.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *in_paths = sys.argv[1:]
    snaps = []
    for p in in_paths:
        with open(p) as f:
            for line in f.read().splitlines():
                if line.startswith("{"):
                    snaps.append(json.loads(line))
                    break
    minima: dict[str, float] = {}
    for s in snaps:
        for q, t in s["queries"].items():
            minima[q] = min(minima.get(q, t), t)
    result = {
        "metric": "per-query minimum wall seconds across bench passes (host-noise floor)",
        "value": round(sum(minima.values()), 3),
        "unit": "sec",
        "queries": {q: minima[q] for q in sorted(minima)},
        "sf": snaps[-1].get("sf"),
        "cpus": snaps[-1].get("cpus"),
        "passes": len(snaps),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps({"total_min": result["value"], "n": len(minima), "passes": len(snaps)}))


if __name__ == "__main__":
    main()

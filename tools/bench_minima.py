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
    if len(sys.argv) < 3:
        sys.exit("usage: bench_minima.py OUT.json IN1.json [IN2.json ...]")
    out_path, *in_paths = sys.argv[1:]
    snaps = []
    for p in in_paths:
        with open(p) as f:
            text = f.read()
        try:
            # whole-file JSON (bench_last.json-style pretty records)
            snaps.append(json.loads(text))
            continue
        except json.JSONDecodeError:
            pass
        for line in text.splitlines():
            # bench.py stdout capture: the record is one JSON line
            if line.startswith("{"):
                snaps.append(json.loads(line))
                break
    if not snaps:
        sys.exit(f"no parseable bench snapshot in: {in_paths}")
    minima: dict[str, float] = {}
    pass_counts: dict[str, int] = {}
    for s in snaps:
        for q, t in s["queries"].items():
            minima[q] = min(minima.get(q, t), t)
            pass_counts[q] = pass_counts.get(q, 0) + 1
    result = {
        "metric": "per-query minimum wall seconds across bench passes (host-noise floor)",
        "value": round(sum(minima.values()), 3),
        "unit": "sec",
        "queries": {q: minima[q] for q in sorted(minima)},
        # single-pass entries are a raw sample, not a noise-floor minimum
        # — surface per-query pass counts so readers can tell them apart
        "query_passes": {q: pass_counts[q] for q in sorted(pass_counts)},
        "sf": snaps[-1].get("sf"),
        "cpus": snaps[-1].get("cpus"),
        "passes": len(snaps),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps({"total_min": result["value"], "n": len(minima), "passes": len(snaps)}))


if __name__ == "__main__":
    main()

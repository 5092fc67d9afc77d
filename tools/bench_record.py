#!/usr/bin/env python3
"""Merge N full graft.Bench sweep outputs into the round's committed
record: per-query MIN across sweeps, total = sum of mins, with the
protocol documented in the JSON itself.

Usage: tools/bench_record.py <out.json> <sweep1.json> [sweep2.json ...]
Each sweep file holds the single JSON line Bench prints (possibly with an
sbt "[info] " prefix).
"""
import json
import sys
from pathlib import Path


def load(path):
    line = Path(path).read_text().strip()
    return json.loads(line[line.find('{'):])


def main():
    out_path, sweeps = sys.argv[1], [load(p) for p in sys.argv[2:]]
    assert sweeps, "need at least one sweep"
    names = set(sweeps[0]["queries"])
    for s in sweeps[1:]:
        assert set(s["queries"]) == names, "sweeps cover different queries"
    mins = {q: min(s["queries"][q] for s in sweeps) for q in sorted(names)}
    rec = {
        "metric": "total",
        "value": sum(mins.values()),
        "unit": "sec",
        "runs_protocol": (
            f"per-query MIN across {len(sweeps)} independent one-JVM full "
            "sweeps (each sweep itself min of 2-3 runs per query, "
            "inter-query System.gc); Xms-pinned heap per build.sbt"),
        "queries": mins,
        "sf": sweeps[0]["sf"],
    }
    Path(out_path).write_text(json.dumps(rec) + "\n")
    print(f"total {rec['value']:.1f}s over {len(mins)} queries -> {out_path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Merge two full graft.Bench sweeps into the round's committed record:
per-query min over both sweeps (each already min-of-2/3 runs in its own
JVM). Kills the single-JVM accumulated-GC ambiguity the r10 verdict
flagged — one sweep can drift ~10% hot-vs-cold, so "faster or slower than
last round?" must never depend on which single sweep you read.

Usage: tools/bench_min.py <sweep1.json> <sweep2.json> <out.json>
"""
import json
import sys
from pathlib import Path


def main():
    a_path, b_path, out_path = sys.argv[1:4]
    a = json.loads(Path(a_path).read_text())
    b = json.loads(Path(b_path).read_text())
    qa, qb = a["queries"], b["queries"]
    if set(qa) != set(qb):
        sys.exit(f"sweeps disagree on the query set: "
                 f"{sorted(set(qa) ^ set(qb))}")
    queries = {k: min(qa[k], qb[k]) for k in qa}
    runs = {k: sorted(a.get("runs", {}).get(k, []) +
                      b.get("runs", {}).get(k, []))
            for k in qa}
    errors = {**a.get("errors", {}), **b.get("errors", {})}
    out = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "runs_protocol": (
            "per-query min over TWO full one-JVM sweeps; each sweep is "
            "min of 2-3 runs per query (3rd for sub-500ms or "
            ">1.5x-variance rows) with inter-query System.gc"),
        "sweep_totals": [round(sum(qa.values()), 3),
                         round(sum(qb.values()), 3)],
        "queries": queries,
        "runs": runs,
        "sf": a.get("sf"),
    }
    if errors:
        out["errors"] = errors
    Path(out_path).write_text(json.dumps(out) + "\n")
    print(f"total {out['value']:.1f}s over {len(queries)} queries "
          f"(sweeps: {out['sweep_totals']})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Stress-scale Spark-vs-DuckDB crossover: time the SAME oracle SQL the
correctness gate runs, against a CrossoverGen data dir, and merge with the
Spark timings `graft.Bench` produced on that dir.

Usage:
  python3 tools/crossover.py <dataDir> <oracleSqlJson> <benchJson> <outJson> [query ...]

DuckDB runs each query to full materialization (CREATE TEMP TABLE AS — the
analog of Bench's noop sink), min of 2 runs, all cores. The output JSON has
one row per query: {duckdb_sec, duckdb_runs, rows, spark_sec, ratio}.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    data_dir, oracle_json, bench_json, out_path = sys.argv[1:5]
    names = sys.argv[5:]
    oracle = json.loads(Path(oracle_json).read_text())
    # crossover_run.sh appends ONE grepped bench line per query (with an
    # "[info] " prefix); merge every line's per-query timings
    bench = {"queries": {}}
    for line in Path(bench_json).read_text().splitlines():
        brace = line.find("{")
        if brace < 0:
            continue
        bench["queries"].update(json.loads(line[brace:]).get("queries", {}))
    assert bench["queries"], f"no bench lines with queries in {bench_json}"
    con = duckdb.connect()
    for t in TABLES:
        p = Path(data_dir) / f"{t}.parquet"
        if p.is_dir():
            con.sql(f"CREATE VIEW {t} AS FROM '{p}/*.parquet'")
        elif p.exists():
            con.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    out = {}
    for name in names:
        sql = oracle[name]
        runs, rows = [], None
        for _ in range(2):
            t0 = time.time()
            con.sql(f"CREATE OR REPLACE TEMP TABLE __r AS {sql}")
            runs.append(time.time() - t0)
            rows = con.sql("SELECT count(*) FROM __r").fetchone()[0]
            con.sql("DROP TABLE __r")
        spark_sec = bench.get("queries", {}).get(name)
        ratio = round(spark_sec / min(runs), 3) if spark_sec else None
        out[name] = {"duckdb_sec": round(min(runs), 3),
                     "duckdb_runs": [round(r, 3) for r in runs],
                     "rows": rows, "spark_sec": spark_sec, "ratio": ratio}
        print(name, json.dumps(out[name]))
    Path(out_path).write_text(json.dumps(
        {"data_dir": data_dir, "queries": out}, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Judge-style ratio sweep: time EVERY oracle SQL in DuckDB (min of 2,
all cores, CREATE TEMP TABLE AS materialization) against a data dir, and
merge with a full graft.Bench sweep's per-query seconds.

Usage:
  tools/duck_sweep.py <dataDir> <verifyOutDir> <benchJson> <outJson>

`verifyOutDir` must hold a fresh graft.Verify dump for the SAME dir —
its oracle_sql.json is the query set, and `__VERIFY_OUT__` oracles read
its exports.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    data_dir, verify_out, bench_json, out_path = sys.argv[1:5]
    oracle = json.loads((Path(verify_out) / "oracle_sql.json").read_text())
    bench = json.loads(Path(bench_json).read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(data_dir) / f"{t}.parquet"
        if p.is_dir():
            con.sql(f"CREATE VIEW {t} AS FROM '{p}/*.parquet'")
        elif p.exists():
            con.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    out = {}
    for name in sorted(oracle):
        sql = oracle[name].replace("__VERIFY_OUT__", verify_out)
        runs = []
        err = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.sql(f"CREATE OR REPLACE TEMP TABLE __r AS {sql}")
                runs.append(time.time() - t0)
                con.sql("DROP TABLE __r")
            except Exception as e:  # noqa: BLE001 - recorded, not hidden
                err = f"{type(e).__name__}: {e}"[:200]
                break
        spark_sec = bench.get("queries", {}).get(name)
        row = {"duckdb_sec": round(min(runs), 3) if runs else None,
               "spark_sec": spark_sec}
        if err:
            row["err"] = err
        elif spark_sec is not None:
            row["ratio"] = round(spark_sec / min(runs), 3)
        out[name] = row
        print(name, json.dumps(row), flush=True)
    tot_d = sum(r["duckdb_sec"] for r in out.values() if r.get("duckdb_sec"))
    tot_s = sum(r["spark_sec"] for r in out.values() if r.get("spark_sec"))
    work = [(n, r) for n, r in out.items()
            if r.get("duckdb_sec") and r["duckdb_sec"] >= 0.2 and r.get("spark_sec")]
    wd = sum(r["duckdb_sec"] for _, r in work)
    ws = sum(r["spark_sec"] for _, r in work)
    summary = {
        "aggregate": {"spark": round(tot_s, 1), "duckdb": round(tot_d, 1),
                      "ratio": round(tot_s / tot_d, 3) if tot_d else None},
        "work_dominated": {"n": len(work), "spark": round(ws, 1),
                           "duckdb": round(wd, 1),
                           "ratio": round(ws / wd, 3) if wd else None,
                           "over_2x": sorted(n for n, r in work
                                             if r.get("ratio", 0) > 2)},
    }
    print(json.dumps(summary, indent=1))
    Path(out_path).write_text(json.dumps(
        {"data_dir": data_dir, "summary": summary, "queries": out}, indent=1))


if __name__ == "__main__":
    main()

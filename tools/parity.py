#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and diff (schema, rows, values).

Usage: python3 tools/parity.py <sfDir> <outDir> [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        # The driver hashes typed bytes, where -0.0 != 0.0; Python == treats
        # them equal. Tag the sign of zero so this gate is a strict superset
        # of the driver's compare.
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        try:
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = [tuple(norm(v) for v in row) for row in
                          con.sql(f"SELECT {', '.join(quote(c) for c in spark_cols)} FROM spark_rel").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = [tuple(norm(v) for v in row) for row in
                         con.sql(f"SELECT {', '.join(quote(c) for c in duck_cols)} FROM duck_rel").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns differ\n  spark={spark_cols}\n  duck ={duck_cols}")
            n_fail += 1
            continue
        # The driver hashes typed values: a DuckDB HUGEINT vs Spark BIGINT is a
        # mismatch even when the values are equal. Compare physical types too.
        spark_types = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        duck_types = dict(zip(duck_rel.columns, (str(t) for t in duck_rel.types)))
        type_diff = {c: (spark_types[c], duck_types[c]) for c in spark_types
                     if spark_types[c] != duck_types[c]}
        if type_diff:
            print(f"FAIL {name}: column types differ (spark, duck): {type_diff}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: row count {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(spark_rows)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}\n  cols ={spark_cols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


def quote(c):
    return f'"{c}"'


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares sorted row multisets.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import glob
import os

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def rows_of(cols, table):
    names = sorted(cols)
    data = {c: table[c] for c in cols}
    n = len(table[cols[0]]) if cols else 0
    out = []
    for i in range(n):
        out.append(tuple(norm(data[c][i]) for c in names))
    out.sort(key=lambda r: tuple(json.dumps(x, default=str) for x in r))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fail += 1
            continue
        spark_tbl = pq.read_table(files[0]).to_pydict()
        spark_cols = list(spark_tbl.keys())
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            fail += 1
            continue
        duck_dict = {c: [r[i] for r in duck_rows] for i, c in enumerate(duck_cols)}
        a = rows_of(spark_cols, spark_tbl)
        b = rows_of(duck_cols, duck_dict)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            onlya = [r for r in a if r not in set(b)][:3]
            onlyb = [r for r in b if r not in set(a)][:3]
            print(f"  only-spark: {onlya}")
            print(f"  only-duck:  {onlyb}")
            fail += 1
    print(f"== {ok} pass, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

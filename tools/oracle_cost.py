#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB. Usage: oracle_cost.py <sfDir> <oracle_sql.json> [budget_sec_per_query]"""
import json, os, sys, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, oracle_path, budget=120.0):
    oracle = json.load(open(oracle_path))
    rows = []
    for name, sql in sorted(oracle.items()):
        con = duckdb.connect()
        con.execute(f"SET threads=8")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        t0 = time.time()
        try:
            n = len(con.execute(sql).df())
            dt = time.time() - t0
            rows.append((dt, name, n, "ok"))
            print(f"{dt:8.2f}s {name} rows={n}", flush=True)
        except Exception as e:
            dt = time.time() - t0
            rows.append((dt, name, -1, str(e)[:80]))
            print(f"{dt:8.2f}s {name} ERROR {str(e)[:80]}", flush=True)
        con.close()
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\nTOTAL {total:.1f}s over {len(rows)} queries; top 15:")
    for dt, name, n, st in rows[:15]:
        print(f"{dt:8.2f}s {name}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv)>3 else 120.0)

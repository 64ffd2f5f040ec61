#!/usr/bin/env python3
"""Measure the DuckDB oracle's runtime per headline query → BASELINE.md data.

Usage: python3 tools/baseline.py <sfDir> <oracle_sql.json> [names...]

Times each oracle SQL (median of 3 after one warmup) with threads matching
SPARK_GRAFT_CPUS. NOT part of the shipped library — dev tooling only.
"""
import sys, os, json, time
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS','32')}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in (names or sorted(oracle)):
        if name not in oracle:
            continue
        try:
            con.sql(oracle[name]).fetchall()  # warmup (buffer cache, plan)
            times = []
            for _ in range(3):
                t0 = time.time()
                con.sql(oracle[name]).fetchall()
                times.append(time.time() - t0)
            out[name] = round(sorted(times)[1], 3)
        except Exception as e:
            out[name] = f"ERR {str(e).splitlines()[0][:80]}"
    print(json.dumps({"sf": sf_dir, "threads": os.environ.get('SPARK_GRAFT_CPUS','32'),
                      "queries": out}, indent=1))

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Measure the DuckDB oracle's runtime per headline query → BASELINE.md data.

Usage: python3 tools/baseline.py <sfDir> <oracle_sql.json> [names...]

SYMMETRIC protocol with graft.Bench (warm-vs-warm, like-for-like): one
untimed warmup pass (page cache + plan cache), then the SAME best-of-6
round-robin sampling Spark's bench uses (pass 1 of every query, then pass
2, ... so a VM contention spike inflates at most one sample per query),
per-query minimum. Threads match SPARK_GRAFT_CPUS. NOT part of the shipped
library — dev tooling only.
"""
import sys, os, json, time
import duckdb

PASSES = int(os.environ.get("BASELINE_PASSES", "6"))

# Timing-only oracle overrides: queries registered SORT-FREE on the Spark
# side (their deterministic compare order lives in the Verify dump / oracle
# ORDER BY, not in the operator — see SparkEntry.dumpSort) are timed
# sort-free here too, so the paired ratio compares operator to operator.
# The CORRECTNESS oracle (oracle_sql.json) keeps its ORDER BY untouched.
# The override SET comes from dump_sort.json, which graft.Verify writes
# next to oracle_sql.json straight from SparkEntry.dumpSort — one source
# of truth, no hand-maintained list to drift (round-13 advisor). The
# fallback set covers older artifacts that predate dump_sort.json.
FALLBACK_OVERRIDES = {"project_select", "window_gap_fill", "window_range_frame"}

# A trailing TOP-LEVEL ORDER BY: plain column list (identifiers, commas,
# optional ASC/DESC/NULLS FIRST|LAST), anchored at end-of-string — a
# subquery/window ORDER BY never matches because the clause would be
# followed by more SQL (round-13 advisor: rfind could strip those).
TRAILING_ORDER_BY = __import__("re").compile(
    r"\s+ORDER\s+BY\s+[A-Za-z0-9_.]+(?:\s+(?:ASC|DESC))?(?:\s+NULLS\s+(?:FIRST|LAST))?"
    r"(?:\s*,\s*[A-Za-z0-9_.]+(?:\s+(?:ASC|DESC))?(?:\s+NULLS\s+(?:FIRST|LAST))?)*\s*$",
    __import__("re").IGNORECASE)

def timing_sql(name, sql, overrides):
    if name in overrides:
        m = TRAILING_ORDER_BY.search(sql)
        if m is None:
            raise SystemExit(
                f"timing override for {name!r}: oracle has no trailing "
                f"top-level ORDER BY column list to strip — refusing to "
                f"guess (sql ends: ...{sql[-80:]!r})")
        return sql[:m.start()].rstrip()
    return sql

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS','32')}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    ds_path = os.path.join(os.path.dirname(oracle_path), "dump_sort.json")
    if os.path.exists(ds_path):
        overrides = set(json.load(open(ds_path)))
    else:
        # pre-round-14 artifact: 3 sort-free names was correct THEN; a
        # current-tree artifact should always have dump_sort.json beside
        # its oracle — falling back on one would under-strip (pessimistic
        # ratios, not wrong-direction), so say it out loud.
        print(f"[baseline] WARNING: no {ds_path}; using the historical "
              f"3-name override set — re-run graft.Verify if this artifact "
              f"is from the current tree", file=sys.stderr)
        overrides = FALLBACK_OVERRIDES
    run = [n for n in (names or sorted(oracle)) if n in oracle]
    times = {n: [] for n in run}
    err = {}
    for n in run:  # untimed warmup: buffer cache + compiled plan
        try:
            con.sql(timing_sql(n, oracle[n], overrides)).fetchall()
        except Exception as e:
            err[n] = f"ERR {str(e).splitlines()[0][:80]}"
    for _ in range(PASSES):  # round-robin, same schedule as graft.Bench
        for n in run:
            if n in err:
                continue
            t0 = time.time()
            try:
                con.sql(timing_sql(n, oracle[n], overrides)).fetchall()
                times[n].append(time.time() - t0)
            except Exception as e:
                err[n] = f"ERR {str(e).splitlines()[0][:80]}"
    out = {n: (err[n] if n in err else round(min(times[n]), 3)) for n in run}
    total = sum(v for v in out.values() if isinstance(v, float))
    print(json.dumps({"sf": sf_dir, "threads": os.environ.get('SPARK_GRAFT_CPUS','32'),
                      "protocol": f"warm best-of-{PASSES} round-robin (symmetric with graft.Bench)",
                      "total": round(total, 3), "queries": out}, indent=1))

if __name__ == "__main__":
    main()

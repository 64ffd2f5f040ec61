#!/usr/bin/env python3
"""Local dev-loop twin of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet directory (graft.Verify output), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name (as the driver does), and compares
row-by-row values exactly. Queries with no oracle entry get a rows-only check.

NOT part of the shipped library — dev tooling only (the library is pure Scala).
"""
import sys, os, json, glob
import duckdb

def canon(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def unrounded(v):
    """True if v is a finite float carrying more than 6 decimal places.

    Round-9 postmortem: llm_gopher_rules emitted raw division doubles that
    were bit-identical between Spark and DuckDB locally, yet the DRIVER's
    hash canonicalization still flagged them. The only float values proven
    safe through the driver are ones already rounded to <=6dp (the repo's
    round(x,6) discipline), so the local gate must REJECT anything looser —
    otherwise it passes queries the authoritative gate fails.
    """
    if isinstance(v, float):
        return v == v and abs(v) != float("inf") and round(v, 6) != v
    if isinstance(v, list):
        return any(unrounded(x) for x in v)
    return False

def spark_unrepresentable(duck_type):
    """True if a DuckDB result-column type cannot round-trip through
    Spark's parquet writer with identical semantics.

    Round-10 postmortem (second gopher fail): DuckDB widens integer sum()
    to HUGEINT (int128); Spark emits BIGINT. Every VALUE was bit-identical
    — only the dtype differed — and this twin fetched both through Python
    ints so HUGEINT==BIGINT silently, while the driver's hasher
    canonicalizes dtypes and flagged it. Any oracle whose result schema
    contains one of these types must cast it (usually `AS BIGINT`).
    """
    t = str(duck_type).upper()
    if t in ("HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
             "UBIGINT"):
        return True
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
        # recurse into the element/field types encoded in the string.
        # Nested DECIMAL is flagged outright: the per-column width compare
        # below (decimal_mismatches) cannot see inside nested types, and a
        # width drift there would slip through to the driver's hasher.
        return any(bad in t for bad in
                   ("HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT",
                    "UINTEGER", "UBIGINT", "DECIMAL"))
    return False

def decimal_mismatches(want, got):
    """Top-level DECIMAL columns must match the Spark output's parquet type
    EXACTLY (precision and scale). DuckDB caps DECIMAL at 38, so a
    precision heuristic can never fire (round-12 review); the authoritative
    driver hash canonicalizes dtypes, and e.g. DuckDB sum(DECIMAL(12,2)) =
    DECIMAL(38,2) vs Spark's DecimalType(22,2) fails there on identical
    values. Both schemas are in hand here — compare them instead of
    guessing."""
    gtypes = {c: str(t).upper() for c, t in zip(got.columns, got.types)}
    bad = {}
    for c, t in zip(want.columns, want.types):
        t = str(t).upper()
        if t.startswith("DECIMAL") and gtypes.get(c, t) != t:
            bad[c] = f"oracle {t} vs spark {gtypes.get(c, '<missing>')}"
        elif (not t.startswith("DECIMAL")
              and gtypes.get(c, "").startswith("DECIMAL")):
            # one-sided decimal (round-12 advisor): Spark wrote DECIMAL but
            # the oracle produced DOUBLE/other — the dtype drift would slip
            # past the gate and surface as a confusing driver-hash failure
            # on identical values.
            bad[c] = f"oracle {t} vs spark {gtypes[c]} (one-sided DECIMAL)"
    return bad

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # Round-8 postmortem: a query that THROWS in graft.Verify leaves no
    # output dir, and a missing dir used to be silently absent from this
    # report (43 broken queries looked like a shorter, all-green list).
    # Every registered oracle name must have an output dir; Verify also
    # writes the thrown queries + messages to _failed.json — surface both.
    failed_path = os.path.join(out_dir, "_failed.json")
    if os.path.exists(failed_path):
        for name, msg in json.load(open(failed_path)).items():
            results[name] = f"THREW-IN-VERIFY {msg.splitlines()[0][:160]}"
    for name in oracle:
        if name not in results and not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = "MISSING-OUTPUT (no parquet dir and not in _failed.json)"
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        # a name recorded THREW-IN-VERIFY stays a failure even when a
        # (possibly complete) parquet dir is on disk: Verify's post-write
        # guards throw AFTER the write, and recomputing here would
        # overwrite the failure — for a no-oracle dumpSort query the
        # overwrite would even read as a passing ROWS-ONLY (round-16
        # review)
        if results.get(name, "").startswith("THREW-IN-VERIFY"):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            results[name] = "EMPTY-OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
        gcols = sorted(got.columns)
        grows = con.sql(f"SELECT {', '.join(gcols)} FROM got").fetchall() if False else \
                got.project(", ".join(f'"{c}"' for c in gcols)).fetchall()
        if name not in oracle:
            results[name] = f"ROWS-ONLY rows={len(grows)}" + ("" if len(grows) > 0 else " ***ZERO***")
            continue
        try:
            want = con.sql(oracle[name])
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        badtypes = {c: str(t) for c, t in zip(want.columns, want.types)
                    if spark_unrepresentable(t)}
        badtypes.update(decimal_mismatches(want, got))
        if badtypes:
            cols = ", ".join(f"{c}:{t}" for c, t in badtypes.items())
            results[name] = (f"ORACLE-DTYPE {cols} — DuckDB result type is not "
                             "Spark-parquet-representable (driver hash will "
                             "fail even on identical values); cast in the "
                             "oracle SQL (integer sums: AS BIGINT)")
            continue
        wcols = sorted(want.columns)
        wrows = want.project(", ".join(f'"{c}"' for c in wcols)).fetchall()
        if gcols != wcols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} duckdb={wcols}"
            continue
        if len(grows) != len(wrows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(grows)} duckdb={len(wrows)}"
            continue
        bad = None
        loose = {}
        for i, (g, w) in enumerate(zip(grows, wrows)):
            cg = tuple(canon(x) for x in g)
            cw = tuple(canon(x) for x in w)
            if cg != cw:
                bad = (i, g, w)
                break
            for c, x in zip(gcols, g):
                if c not in loose and unrounded(x):
                    loose[c] = x
        if bad:
            i, g, w = bad
            results[name] = f"VALUE-MISMATCH row={i}\n    spark ={g}\n    duckdb={w}"
        elif loose:
            cols = ", ".join(f"{c}={x!r}" for c, x in loose.items())
            results[name] = (f"UNROUNDED-DOUBLE cols: {cols} — "
                             "values match locally but >6dp floats do not survive "
                             "the driver's hash canonicalization; wrap in round(x,6) "
                             "on both engines")
        else:
            results[name] = f"OK rows={len(grows)}"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS-ONLY rows") and "ZERO" not in v)
    for k, v in sorted(results.items()):
        mark = "✓" if (v.startswith("OK") or (v.startswith("ROWS-ONLY") and "ZERO" not in v)) else "✗"
        print(f"{mark} {k}: {v}")
    print(f"\n{npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()

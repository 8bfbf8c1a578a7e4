#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--bench-out <json>] [--reps N]

For each query in <verifyOutDir>/oracle_sql.json: load the Spark parquet
result, run the oracle SQL in DuckDB with each testdata table registered
as a view, sort columns by name, compare row counts, schemas (loosely)
and values (floats rounded to 6 places).

Two extra gates beyond the driver's compare:
  * TYPE GATE: `DESCRIBE <oracle sql>` must produce no HUGEINT / UHUGEINT /
    DECIMAL output column. DuckDB types window/plain `sum()` over integers
    as HUGEINT and numeric literals as DECIMAL; Spark emits BIGINT/DOUBLE,
    so equal VALUES can still diverge in the driver's typed hash. Casting
    at the oracle (`::BIGINT` / `::DOUBLE`) is the fix; this gate makes the
    class extinct locally before the driver sees it.
  * TIMING ARTIFACT: per-query oracle wall time (median of --reps, default
    3) is written to --bench-out (default target/oracle_bench.json) so
    "Spark within 2x of the oracle at the same SF" is checked per query
    mechanically instead of argued from suite totals.
"""
import sys, os, json, glob, time, statistics
import duckdb

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

def norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = None if v != v else round(v, 6)  # NaN (from SQL NULL via pandas) -> None
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def type_gate(con, sql):
    """Return list of (column, duckdb_type) outputs whose physical type
    would diverge from Spark's (HUGEINT/UHUGEINT/DECIMAL)."""
    bad = []
    for row in con.execute(f"DESCRIBE {sql}").fetchall():
        col, typ = row[0], row[1]
        if any(b in typ.upper() for b in BAD_TYPES):
            bad.append((col, typ))
    return bad

def main(argv):
    sf_dir, out_dir = argv[0], argv[1]
    bench_out = "target/oracle_bench.json"
    reps = 3
    i = 2
    while i < len(argv):
        if argv[i] == "--bench-out":
            bench_out = argv[i + 1]; i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    timings = {}
    for q, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, q)
        try:
            bad = type_gate(con, sql)
            if bad:
                results[q] = f"TYPE GATE {bad} — cast to ::BIGINT/::DOUBLE in the oracle"
                continue
            sdf = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
            secs = []
            for _ in range(max(1, reps)):
                t0 = time.monotonic()
                odf = con.execute(sql).fetchdf()
                secs.append(time.monotonic() - t0)
            timings[q] = round(statistics.median(secs), 4)
            scols, ocols = sorted(sdf.columns), sorted(odf.columns)
            if scols != ocols:
                results[q] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
                continue
            if len(sdf) != len(odf):
                results[q] = f"ROWS MISMATCH spark={len(sdf)} oracle={len(odf)}"
                continue
            srows = norm(sdf.to_dict("records"), scols)
            orows = norm(odf.to_dict("records"), ocols)
            if srows == orows:
                results[q] = f"OK ({len(sdf)} rows)"
            else:
                diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                results[q] = f"VALUE MISMATCH first_diffs={diff}"
        except Exception as e:
            results[q] = f"ERROR {type(e).__name__}: {str(e)[:200]}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for q, v in results.items():
        print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {q}: {v}")
    print(f"== {ok}/{len(results)} pass")
    if timings:
        os.makedirs(os.path.dirname(bench_out) or ".", exist_ok=True)
        with open(bench_out, "w") as f:
            json.dump({"sf": sf_dir, "reps": reps, "unit": "sec",
                       "total": round(sum(timings.values()), 3),
                       "queries": timings}, f, indent=1, sort_keys=True)
        print(f"== oracle timings ({len(timings)} queries, "
              f"total {sum(timings.values()):.1f}s) -> {bench_out}")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: load the Spark parquet
result, run the oracle SQL in DuckDB with each testdata table registered
as a view, sort columns by name, compare row counts, schemas (loosely)
and values (floats rounded to 6 places).
"""
import sys, os, json, glob
import duckdb

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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for q, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, q)
        try:
            sdf = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
            odf = con.execute(sql).fetchdf()
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
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

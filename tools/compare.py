#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Verify-dumped
parquet (schema + sorted-row hash, columns sorted by name)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    try:
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    except Exception as e:
        results[name] = f"READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only ({len(got)} rows)"
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {e}"
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        results[name] = f"COLS-MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
        continue
    if str(list(got.dtypes)) != str(list(exp.dtypes)):
        results[name] = f"DTYPE-MISMATCH got={list(got.dtypes)} exp={list(exp.dtypes)}"
        # keep going — value compare still informative
    def canon(df):
        return sorted(df.astype(str).itertuples(index=False, name=None))
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
    elif g != e:
        diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
        results[name] = f"VALUE-MISMATCH first-diffs {[ (g[i], e[i]) for i in diff ]}"
    else:
        results[name] = results.get(name, f"OK ({len(g)} rows)")

for k, v in sorted(results.items()):
    print(f"{k:24s} {v}")
bad = [k for k, v in results.items() if not (v.startswith('OK') or v.startswith('rows-only'))]
print(f"\n{len(results)-len(bad)}/{len(results)} pass; failing: {bad}")

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Verify-dumped
parquet.

Mimics the driver faithfully (learned from CORRECTNESS_r01):
- the SPARK side is read through pyarrow/pandas (NOT duckdb) — decimal
  columns become Decimal objects, arrays become numpy arrays;
- rows are sorted with pandas sort_values(by=all columns) — ANY
  list/array-typed output column raises `unhashable type: numpy.ndarray`
  there, exactly like the driver's compare;
- values are compared as strings after the sort (proxy for the driver's
  hash-of-sorted-values).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

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
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    except Exception as e:
        results[name] = f"READ-FAIL {e}"
        continue
    # the driver sorts even rows-only outputs — replicate to catch
    # unhashable (array) columns in any query's output
    try:
        got = got[sorted(got.columns)].sort_values(by=sorted(got.columns))
    except Exception as e:
        results[name] = f"SPARK-SORT-FAIL (driver would err too): {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only ({len(got)} rows)"
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
        exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns))
    except Exception as e:
        results[name] = f"ORACLE-FAIL {e}"
        continue
    if list(got.columns) != list(exp.columns):
        results[name] = f"COLS-MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
        continue
    if len(got) != len(exp):
        results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
        continue
    # advisory only (the real driver checks schema_match): surface dtype
    # drift that stringified values would hide (e.g. int32 vs int64)
    dtypes_note = ""
    drift = [(c, str(got[c].dtype), str(exp[c].dtype))
             for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
    if drift:
        dtypes_note = f" [dtype-drift {drift}]"
    # type-faithful compare: str() of the cell post-sort. Decimal('9.00')
    # vs 9.0 DIFFERS here by design — that asymmetry broke q08 in r1.
    # Only normalization: midnight timestamps ≡ dates, applied ONLY to
    # columns that are datetime-typed on either side (pyarrow reads parquet
    # DATE as datetime.date, duckdb fetchdf as datetime64 — same instant;
    # a string column containing ' 00:00:00' must NOT be rewritten).
    import datetime
    def is_dateish(series):
        if series.dtype.kind == "M":
            return True
        if series.dtype == object:
            nn = series.dropna()
            return len(nn) > 0 and isinstance(nn.iloc[0], (datetime.date, datetime.datetime))
        return False
    dateish = [is_dateish(got[c]) or is_dateish(exp[c]) for c in got.columns]
    def cell(v, dateish_col):
        s = str(v)
        return s[:-9] if dateish_col and s.endswith(" 00:00:00") else s
    g = [tuple(cell(v, d) for v, d in zip(t, dateish))
         for t in got.itertuples(index=False, name=None)]
    e = [tuple(cell(v, d) for v, d in zip(t, dateish))
         for t in exp.itertuples(index=False, name=None)]
    if g != e:
        diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
        results[name] = f"VALUE-MISMATCH first-diffs {[(g[i], e[i]) for i in diff]}"
    else:
        results[name] = f"OK ({len(g)} rows){dtypes_note}"

for k, v in sorted(results.items()):
    print(f"{k:24s} {v}")
bad = [k for k, v in results.items() if not (v.startswith('OK') or v.startswith('rows-only'))]
print(f"\n{len(results)-len(bad)}/{len(results)} pass; failing: {bad}")

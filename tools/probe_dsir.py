#!/usr/bin/env python3
"""Probe q153's DSIR weight quantization before shipping the oracle.

The only float surface in the DSIR pipeline is the per-bucket
lw = ln((cT+.5)/(NT+B/2)) - ln((cR+.5)/(NR+B/2)), quantized to
floor(lw*1e6 + 0.5) BIGINT. Engines may differ in the last ulp of ln, so
the quantization is safe iff every bucket's lw*1e6 sits far from a .5
rounding boundary. This probe:
  1. computes the bucket table in DuckDB and reports the min distance
     from the boundary across all buckets;
  2. recomputes lw_micro in python (an independent libm) from the same
     integer counts and verifies bucket-for-bucket equality with DuckDB.

Usage: python3 tools/probe_dsir.py /root/testdata/sf0.01 [buckets]
"""
import sys, math
import duckdb

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    con = duckdb.connect()
    counts = con.execute(f"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM read_parquet('{sfdir}/documents.parquet') WHERE length(trim(text)) > 0),
ng AS (SELECT doc_id, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
    x -> concat(t[CAST(x AS INT)], ' ', t[CAST(x AS INT)+1]))) AS g
  FROM toks WHERE len(t) >= 2),
bk AS (SELECT doc_id, CAST(concat('0x', substr(md5(g),1,15)) AS BIGINT) % {B} AS b FROM ng),
spine AS (SELECT unnest(range(0, {B})) AS b)
SELECT s.b,
  CAST(coalesce((SELECT count(*) FROM bk WHERE bk.b = s.b AND doc_id % 10 = 0), 0) AS BIGINT) AS ct,
  CAST(coalesce((SELECT count(*) FROM bk WHERE bk.b = s.b AND doc_id % 10 <> 0), 0) AS BIGINT) AS cr
FROM spine s ORDER BY s.b""").fetchall()
    nT = sum(r[1] for r in counts)
    nR = sum(r[2] for r in counts)
    print(f"{sfdir}: buckets={B} nT={nT} nR={nR} "
          f"nonzero_t={sum(1 for r in counts if r[1])} nonzero_r={sum(1 for r in counts if r[2])}")
    duck = con.execute(f"""
SELECT b, CAST(floor((ln((ct + 0.5::DOUBLE)/({nT} + {B/2}::DOUBLE))
                    - ln((cr + 0.5::DOUBLE)/({nR} + {B/2}::DOUBLE)))*1000000 + 0.5) AS BIGINT) AS lw
FROM (VALUES {','.join(f'({b},{ct},{cr})' for b,ct,cr in counts)}) AS t(b, ct, cr)
ORDER BY b""").fetchall()
    min_margin, argmin = 1e9, None
    py = []
    for (b, ct, cr) in counts:
        lw = math.log((ct + 0.5) / (nT + B / 2)) - math.log((cr + 0.5) / (nR + B / 2))
        x = lw * 1e6
        frac = x - math.floor(x)
        margin = abs(frac - 0.5)
        if margin < min_margin:
            min_margin, argmin = margin, (b, ct, cr, x)
        py.append((b, math.floor(x + 0.5)))
    print(f"min |frac(lw*1e6) - 0.5| = {min_margin:.3e} at bucket {argmin}")
    mism = [(a, d) for a, d in zip(py, duck) if a[1] != d[1]]
    if mism:
        print(f"PYTHON vs DUCKDB lw_micro MISMATCH on {len(mism)} buckets: {mism[:5]}")
        sys.exit(1)
    print("python libm == duckdb libm on every bucket: OK")
    if min_margin < 1e-4:
        print("WARNING: margin < 1e-4 — adjust quantization")
        sys.exit(1)
    print("margins conclusive (>= 1e-4)")

if __name__ == "__main__":
    main()

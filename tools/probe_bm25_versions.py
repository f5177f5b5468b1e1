#!/usr/bin/env python3
"""Probe q162's (versioned index) cross-engine-fragile margins.

q162 serves ONE external query set against two index versions — v1
(slice doc_id % 3 = 0) and v4 (all slices minus doc_id % 17 = 5) — so
BOTH versions' score surfaces need the q96-style margin checks (each
version has its own df/N/avgdl; q96's and q159's probed margins do not
transfer):

  1. min |frac(score*1e4) - 0.5| over every candidate score of BOTH
     versions (cross-engine double-sum noise ~1e-8 in 1e-4 units);
  2. the rank-5/6 gap on the quantized score per version (0 is safe —
     doc_id tie-break).

Zero-drift: carves from the SHIPPED q162 SQL in a Verify dump.

Usage: probe_bm25_versions.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q162_versioned_index first).
"""
import sys, json, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v9b"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q162_versioned_index"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (emitted by bm25VersionCtes, one per version) ----
assert sql.count("round(sum(") == 2 and sql.count(" ), 4)") == 2, "sc markers moved"
assert sql.count("SELECT version,") == 1, "final-select marker moved"

raw_sql = sql.replace("round(sum(", "(sum(").replace(" ), 4)", " ))")
head = raw_sql[:raw_sql.rindex("SELECT version,")].rstrip().rstrip(",").rstrip()

bad = False
for suf, label in (("a", "v1 (slice 0)"), ("b", "v4 (reduced)")):
    d = con.sql(head + f"""
SELECT min(abs(score*10000 - floor(score*10000) - 0.5)), count(*) FROM sc{suf}""").fetchone()
    d_str = "n/a (no candidates)" if d[0] is None else f"{d[0]:.6g}"
    print(f"{label}: min |frac(score*1e4) - 0.5| over {d[1]} scores: {d_str}  (need >> 1e-8)")
    if d[0] is not None and d[0] < 1e-6:
        print(f"WARNING: a {label} score sits near the 4dp rounding boundary")
        bad = True

# rank-boundary gaps need the ROUNDED scores — carve from the shipped SQL
head_rk = sql[:sql.rindex("SELECT version,")].rstrip().rstrip(",").rstrip()
for suf, label in (("a", "v1"), ("b", "v4")):
    g = con.sql(head_rk + f"""
SELECT min(a.score - b.score), count(*) FROM rk{suf} a JOIN rk{suf} b
ON a.qid = b.qid AND a.rank = 5 AND b.rank = 6""").fetchone()
    g_str = "n/a (no rank-5/6 pairs)" if g[0] is None else f"{g[0]:.6g}"
    print(f"{label}: quantized rank-5/6 gap ({g[1]} qids): {g_str}  (0 = doc_id tie-break, safe)")

sys.exit(1 if bad else print("margins conclusive") or 0)

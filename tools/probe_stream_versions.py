#!/usr/bin/env python3
"""Probe q186's (stream-versioned ingest) cross-engine-fragile margins.

q186 serves ONE external query set against two STREAM-COMMITTED index
versions — v2 (base slice + first arrival: doc_id % 4 IN (0, 1)) and
v4 (the full corpus — q96's probed surface, independently re-probed
here) — so BOTH versions' score surfaces need the q96-style margin
checks (each version has its own df/N/avgdl):

  1. min |frac(score*1e3) - 0.5| over every candidate score of BOTH
     versions (q186 serves at THREE decimals per the q182 lesson: v2 at
     4dp drew a raw score 4.2e-11 off a boundary at sf0.1; noise ~1e-9
     in 1e-3 units);
  2. the rank-5/6 gap on the quantized score per version (0 is safe —
     doc_id tie-break).

Zero-drift: carves from the SHIPPED q186 SQL in a Verify dump.

Usage: probe_stream_versions.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q186_stream_versioned first).
"""
import sys, json, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q186_stream_versioned"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (emitted by bm25VersionCtes, one per version) ----
# PER-VERSION grains: v2 serves at 3 decimals (its 4dp surface drew a
# 4.2e-11 boundary at sf0.1), v4 at q96's healthy 4 decimals (its 3dp
# surface drew 3.8e-10 — probed both ways before fixing the grains).
assert sql.count("round(sum(") == 2, "sc markers moved"
assert sql.count(" ), 3)") == 1 and sql.count(" ), 4)") == 1, "per-version grains moved"
assert sql.count("SELECT version,") == 1, "final-select marker moved"

raw_sql = (sql.replace("round(sum(", "(sum(")
              .replace(" ), 3)", " ))").replace(" ), 4)", " ))"))
head = raw_sql[:raw_sql.rindex("SELECT version,")].rstrip().rstrip(",").rstrip()

bad = False
for suf, label, grid in (("a", "v2 (base + first arrival)", 1000),
                         ("b", "v4 (full corpus)", 10000)):
    d = con.sql(head + f"""
SELECT min(abs(score*{grid} - floor(score*{grid}) - 0.5)), count(*) FROM sc{suf}""").fetchone()
    d_str = "n/a (no candidates)" if d[0] is None else f"{d[0]:.6g}"
    print(f"{label}: min |frac(score*{grid}) - 0.5| over {d[1]} scores: {d_str}"
          f"  (need >> {1.0/grid*1e-5:.0e} noise)")
    if d[0] is not None and d[0] < 1e-6:
        print(f"WARNING: a {label} score sits near its rounding boundary")
        bad = True

# rank-boundary gaps need the ROUNDED scores — carve from the shipped SQL
head_rk = sql[:sql.rindex("SELECT version,")].rstrip().rstrip(",").rstrip()
for suf, label in (("a", "v2"), ("b", "v4")):
    g = con.sql(head_rk + f"""
SELECT min(a.score - b.score), count(*) FROM rk{suf} a JOIN rk{suf} b
ON a.qid = b.qid AND a.rank = 5 AND b.rank = 6""").fetchone()
    g_str = "n/a (no rank-5/6 pairs)" if g[0] is None else f"{g[0]:.6g}"
    print(f"{label}: quantized rank-5/6 gap ({g[1]} qids): {g_str}  (0 = doc_id tie-break, safe)")

sys.exit(1 if bad else print("margins conclusive") or 0)

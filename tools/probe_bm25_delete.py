#!/usr/bin/env python3
"""Probe q159's (incremental-index deletion) cross-engine-fragile margins.

q159's oracle is q96's BM25 replay re-generated over the REDUCED corpus
(doc_id % 17 <> 5 folded into the corpus CTE), so q96's probed margins do
not transfer: df, N and avgdl all change, moving every score. The fragile
surfaces are the same two as q96's:

  1. the 4-decimal quantization boundary: both engines sum the per-term
     doubles in different orders (noise ~1e-12, i.e. ~1e-8 in 1e-4
     units); a raw score sitting ON a .5 boundary of the 1e-4 grid would
     round differently. Measured as min |frac(score*1e4) - 0.5| over
     every (qid, doc) candidate score.
  2. the rank-5/6 boundary on the QUANTIZED score: a gap of 0 is safe
     (doc_id tie-break is deterministic in both engines); reported for
     visibility.

Zero-drift design (the probe_bpe lesson): the probe loads the SHIPPED
q159 SQL from a Verify dump's oracle_sql.json and carves its margin
queries out of that exact CTE chain at stable textual markers — it can
never diverge from what the gate actually runs.

Usage: probe_bm25_delete.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q159_inc_bm25_delete first).
"""
import sys, json, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v9a"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q159_inc_bm25_delete"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (emitted by bm25TopkReplay) ----
assert sql.count("round(sum(") == 1 and sql.count(" ), 4)") == 1, "sc markers moved"
assert sql.count("rk AS (") == 1, "rk marker moved"

# 1. raw (unrounded) score distance to the 1e-4 rounding boundary: strip
#    the round() from the shipped sc CTE, keep everything upstream.
raw_sql = sql.replace("round(sum(", "(sum(").replace(" ), 4)", " ))")
head_sc = raw_sql.split("rk AS (")[0].rstrip().rstrip(",")
d = con.sql(head_sc + """
SELECT min(abs(score*10000 - floor(score*10000) - 0.5)), count(*) FROM sc""").fetchone()
d_str = "n/a (no candidates)" if d[0] is None else f"{d[0]:.6g}"
print(f"min |frac(score*1e4) - 0.5| over {d[1]} candidate scores: {d_str}  (need >> 1e-8)")
if d[0] is not None and d[0] < 1e-6:
    print("WARNING: a reduced-corpus score sits near the 4dp rounding boundary")
    sys.exit(1)

# 2. rank-5/6 gap on the QUANTIZED score from the shipped rk CTE
head_rk = sql[:sql.rindex("SELECT qid,")].rstrip().rstrip(",").rstrip()
g = con.sql(head_rk + """
SELECT min(a.score - b.score), count(*) FROM rk a JOIN rk b
ON a.qid = b.qid AND a.rank = 5 AND b.rank = 6""").fetchone()
g_str = "n/a (no rank-5/6 pairs)" if g[0] is None else f"{g[0]:.6g}"
print(f"quantized rank-5/6 score gap ({g[1]} qids): {g_str}  (0 = doc_id tie-break, safe)")
print("margins conclusive")

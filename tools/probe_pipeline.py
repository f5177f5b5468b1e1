#!/usr/bin/env python3
"""Probe q182's (restartable-pipeline serving) cross-engine-fragile margins.

q182's oracle feeds q96's BM25 scoring chain a DIFFERENT corpus — the
pipeline's cleaned (doc_id % 7 <> 2) + exact-deduped survivor set — so
q96's and q159's probed margins do not transfer: df, N and avgdl all
change, moving every score. Same two fragile surfaces as q96/q159:

  1. the quantization boundary: min |frac(score*1e3) - 0.5| over every
     candidate score (engines sum per-term doubles in different orders;
     noise ~1e-12 ≈ 1e-9 in 1e-3 units). q182 serves at THREE decimals,
     not q96's four: this corpus drew a raw score 2.5e-11 off a 4dp
     boundary at sf0.1 — on the 1e-3 grid the same corpus clears by
     3 orders above noise;
  2. the rank-5/6 boundary on the QUANTIZED score (gap 0 is safe — the
     doc_id tie-break is deterministic in both engines).

The survivor-count column (src_docs) is an integer — no float surface.

Zero-drift design (the probe_bpe lesson): the probe loads the SHIPPED
q182 SQL from a Verify dump's oracle_sql.json and carves its margin
queries out of that exact CTE chain at stable textual markers — it can
never diverge from what the gate actually runs.

Usage: probe_pipeline.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q182_restartable_pipeline first).
"""
import sys, json, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q182_restartable_pipeline"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (emitted by bm25ReplayChain + the q182 wrapper) ----
assert sql.count("round(sum(") == 1 and sql.count(" ), 3)") == 1, "sc markers moved"
assert sql.count("rk AS (") == 1, "rk marker moved"
assert sql.count("SELECT r.qid,") == 1, "final-select marker moved"

# 1. raw (unrounded) score distance to the 1e-3 rounding boundary: strip
#    the round() from the shipped sc CTE, keep everything upstream.
raw_sql = sql.replace("round(sum(", "(sum(").replace(" ), 3)", " ))")
head_sc = raw_sql.split("rk AS (")[0].rstrip().rstrip(",")
d = con.sql(head_sc + """
SELECT min(abs(score*1000 - floor(score*1000) - 0.5)), count(*) FROM sc""").fetchone()
d_str = "n/a (no candidates)" if d[0] is None else f"{d[0]:.6g}"
print(f"min |frac(score*1e3) - 0.5| over {d[1]} candidate scores: {d_str}  (need >> 1e-9)")
if d[0] is not None and d[0] < 1e-6:
    print("WARNING: a survivor-corpus score sits near the 4dp rounding boundary")
    sys.exit(1)

# 2. rank-5/6 gap on the QUANTIZED score from the shipped rk CTE
head_rk = sql[:sql.rindex("SELECT r.qid,")].rstrip().rstrip(",").rstrip()
g = con.sql(head_rk + """
SELECT min(a.score - b.score), count(*) FROM rk a JOIN rk b
ON a.qid = b.qid AND a.rank = 5 AND b.rank = 6""").fetchone()
g_str = "n/a (no rank-5/6 pairs)" if g[0] is None else f"{g[0]:.6g}"
print(f"quantized rank-5/6 score gap ({g[1]} qids): {g_str}  (0 = doc_id tie-break, safe)")
print("margins conclusive")

#!/usr/bin/env python3
"""Probe q156's (ANN-backed hybrid) cross-engine-fragile margins.

Zero-drift design (the probe_bpe lesson, ADVICE r7): instead of
re-generating the replay SQL in python — which can silently diverge from
the shipped oracle — this probe loads the SHIPPED q156 SQL from a Verify
dump's oracle_sql.json and carves its own margin queries out of that
exact CTE chain at stable textual markers. What it measures:

  1. dense candidate adjacent-cos gaps through rank 7 per qid (the rank
     boundary is 5; engines sum cosines in different orders, noise
     ~1e-12 — gaps must be >> that);
  2. probe-boundary d2 gap (rank nProbes=4 vs 5) for THIS query set
     (q34's probe covers vec_id % 50 = 0; q156's set is doc_id % 125 = 3
     with nonempty text) — d2 is exact integer-grid arithmetic, but the
     double cast can tie; a tie is resolved by the deterministic cell
     tie-break identically in both engines, so only report;
  3. fused rrf_units gap at the final rank-5 boundary (exact BIGINT; ties
     broken by doc_id — gap 0 is safe, reported for visibility).

Usage: probe_hybrid_ann.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q156_hybrid_ann first so the dump
holds the shipped oracle text).
"""
import sys, json, re, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v156"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q156_hybrid_ann"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (all emitted by the shipped Scala generators) ----
assert sql.count("sp AS (") == 1 and sql.count("cand AS") == 1
head_dn = sql.split("sp AS (")[0].rstrip().rstrip(",")       # WITH ... dn AS (...)
head_pr = sql.split("cand AS")[0].rstrip().rstrip(",")       # WITH ... pr AS (...)

# 1. dense adjacent cos gaps (ranks 1..7) from the shipped dnscored CTE
g = con.sql(head_dn + """,
r AS (SELECT qid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
      FROM dnscored)
SELECT min(a.cos - b.cos), count(DISTINCT a.qid)
FROM r a JOIN r b ON a.qid = b.qid AND b.rn = a.rn + 1 AND a.rn <= 7""").fetchone()
# format-guard BEFORE the numeric spec: ≤1 candidate per qid makes the
# min NULL and '{:.6g}' on None would crash the probe (ADVICE r8)
gap_str = "n/a (no adjacent pairs)" if g[0] is None else f"{g[0]:.6g}"
print(f"dense min adjacent cos gap (ranks 1..8, {g[1]} qids): {gap_str}  (need >> 1e-12)")
if g[0] is not None and g[0] < 1e-9:
    print("WARNING: cos rank boundary within float-noise range"); sys.exit(1)

# 2. probe-boundary d2 gap for THIS query set: re-rank the shipped pr
#    inner query with its own d2 expression exposed. The d2 expr is
#    carved from the pr block's ORDER BY (emitted by ivfRanked).
pr_block = head_pr[head_pr.index("pr AS ("):]
m = re.search(r"ORDER BY (.*?) ASC, (c\d+)\.cell ASC", pr_block, re.S)
d2, fin = m.group(1), m.group(2)
qfilter = re.search(r"FROM qv CROSS JOIN c\d+ (WHERE.*?)\)\s*WHERE rn <= 4\)", pr_block, re.S).group(1)
base = head_pr.split("af AS (")[0].rstrip().rstrip(",")      # WITH <kmeans chain>
gap = con.sql(base + f""",
d AS (SELECT qv.vec_id, {d2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {d2} ASC, {fin}.cell ASC) AS rn
      FROM qv CROSS JOIN {fin} {qfilter})
SELECT min(b.d2 - a.d2), count(*) FROM d a JOIN d b
ON a.vec_id = b.vec_id AND a.rn = 4 AND b.rn = 5""").fetchone()
d2_str = "n/a (no rank-4/5 pairs)" if gap[0] is None else f"{gap[0]:.6g}"
print(f"probe boundary d2 gap (rank4->5, {gap[1]} qids): {d2_str}  (integer grid; ties cell-tie-broken)")

# 3. fused rrf_units gap at the final rank-5 boundary (exact BIGINT)
head_rk = sql[:sql.rindex("SELECT qid,")].rstrip().rstrip(",").rstrip()
fg = con.sql(head_rk + """
SELECT min(a.rrf_units - b.rrf_units) FROM rk a JOIN rk b
ON a.qid = b.qid AND a.rank = 5 AND b.rank = 6""").fetchone()[0]
print(f"fused rrf_units gap (rank5->6): {fg}  (exact BIGINT; 0 = doc_id tie-break, safe)")
print("margins conclusive")

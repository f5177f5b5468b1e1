#!/usr/bin/env python3
"""Probe q163's (IVF stored-index deletion) cross-engine-fragile margins.

Zero-drift design (probe_hybrid_ann pattern): loads the SHIPPED q163 SQL
from a Verify dump's oracle_sql.json and carves margin queries out of
that exact CTE chain, so probe and oracle cannot diverge. q163 serves
the REDUCED candidate set (deletion predicate folded into `cand`), so
its rank boundaries differ from q156/q160's full-corpus ones and need
their own measurement:

  1. reduced-set adjacent-cos gaps through rank 7 per qid (rank
     boundary is 5; engines sum cosines in different orders, noise
     ~1e-12 — gaps must be >> that);
  2. probe-boundary d2 gap (rank nProbes=4 vs 5) for the REDUCED query
     set (deleted qids are excluded from the query CTE) — integer-grid
     arithmetic, ties resolved by the deterministic cell tie-break
     identically in both engines, reported for visibility.

Usage: probe_ivf_delete.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q163_ivf_delete first so the dump
holds the shipped oracle text).
"""
import sys, json, re, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v163"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q163_ivf_delete"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (all emitted by the shipped Scala generators) ----
assert sql.count("dn AS (") == 1 and sql.count("cand AS") == 1
assert "% 13 <> 4" in sql, "deletion predicate missing from shipped oracle"
head_dn = sql.split("dn AS (")[0].rstrip().rstrip(",")       # WITH ... dnscored AS (...)
head_pr = sql.split("cand AS")[0].rstrip().rstrip(",")       # WITH ... pr AS (...)

# 1. reduced-set adjacent cos gaps (ranks 1..7) from the shipped dnscored
g = con.sql(head_dn + """,
r AS (SELECT qid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
      FROM dnscored)
SELECT min(a.cos - b.cos), count(DISTINCT a.qid)
FROM r a JOIN r b ON a.qid = b.qid AND b.rn = a.rn + 1 AND a.rn <= 7""").fetchone()
gap_str = "n/a (no adjacent pairs)" if g[0] is None else f"{g[0]:.6g}"
print(f"reduced-set min adjacent cos gap (ranks 1..8, {g[1]} qids): {gap_str}  (need >> 1e-12)")
if g[0] is not None and g[0] < 1e-9:
    print("WARNING: cos rank boundary within float-noise range"); sys.exit(1)

# 2. probe-boundary d2 gap for the reduced query set
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
print("margins conclusive")

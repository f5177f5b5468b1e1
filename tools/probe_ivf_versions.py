#!/usr/bin/env python3
"""Probe q167's (versioned IVF index) per-version rank margins.

Zero-drift design (probe_hybrid_ann pattern): loads the SHIPPED q167
SQL from a Verify dump's oracle_sql.json and carves margin queries out
of that exact CTE chain. Each served version ranks a DIFFERENT
candidate set (v1 = slice 0, v4 = all minus tombstones) under the same
slice-0-fitted frozen model, so each needs its own boundary
measurement:

  1. per-version adjacent-cos gaps through rank 7 per qid (boundary is
     5; engines sum cosines in different orders, noise ~1e-12);
  2. probe-boundary d2 gap (rank 4 vs 5) for the external query set —
     integer grid, deterministic cell tie-break, reported for
     visibility.

Usage: probe_ivf_versions.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q167_ivf_versioned first).
"""
import sys, json, re, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v167"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q167_ivf_versioned"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

assert sql.count("dn1 AS (") == 1 and sql.count("ds1 AS (") == 1
head_dn = sql.split("dn1 AS (")[0].rstrip().rstrip(",")   # WITH ... ds1, ds4

# 1. per-version adjacent cos gaps (ranks 1..7)
worst = None
for v, ds in (("v1", "ds1"), ("v4", "ds4")):
    g = con.sql(head_dn + f""",
r AS (SELECT qid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
      FROM {ds})
SELECT min(a.cos - b.cos), count(DISTINCT a.qid)
FROM r a JOIN r b ON a.qid = b.qid AND b.rn = a.rn + 1 AND a.rn <= 7""").fetchone()
    g_str = "n/a (no adjacent pairs)" if g[0] is None else f"{g[0]:.6g}"
    print(f"{v} min adjacent cos gap (ranks 1..8, {g[1]} qids): {g_str}  (need >> 1e-12)")
    if g[0] is not None and (worst is None or g[0] < worst):
        worst = g[0]
if worst is not None and worst < 1e-9:
    print("WARNING: a version's cos rank boundary is within float-noise range"); sys.exit(1)

# 2. probe-boundary d2 gap for the external query set
head_pr = sql.split("cand1 AS")[0].rstrip().rstrip(",")
pr_block = head_pr[head_pr.index("pr AS ("):]
m = re.search(r"ORDER BY (.*?) ASC, (c\d+)\.cell ASC", pr_block, re.S)
d2, fin = m.group(1), m.group(2)
qfilter = re.search(r"FROM qv CROSS JOIN c\d+ (WHERE.*?)\)\s*WHERE rn <= 4\)", pr_block, re.S).group(1)
base = head_pr.split("af AS (")[0].rstrip().rstrip(",")
gap = con.sql(base + f""",
d AS (SELECT qv.vec_id, {d2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {d2} ASC, {fin}.cell ASC) AS rn
      FROM qv CROSS JOIN {fin} {qfilter})
SELECT min(b.d2 - a.d2), count(*) FROM d a JOIN d b
ON a.vec_id = b.vec_id AND a.rn = 4 AND b.rn = 5""").fetchone()
d2_str = "n/a (no rank-4/5 pairs)" if gap[0] is None else f"{gap[0]:.6g}"
print(f"probe boundary d2 gap (rank4->5, {gap[1]} qids): {d2_str}  (integer grid; ties cell-tie-broken)")
print("margins conclusive")

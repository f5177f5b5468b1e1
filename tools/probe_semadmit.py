#!/usr/bin/env python3
"""Probe q164's (semantic admission) threshold margins.

Zero-drift design (probe_hybrid_ann pattern): loads the SHIPPED q164
SQL from a Verify dump's oracle_sql.json, carves the candidate CTE
chain out of that exact text, and extracts the threshold literal from
the shipped CASE expression. What it measures:

  1. min |cos - threshold| over ALL (batch, stored) candidate pairs in
     shared probed cells — a superset of the deciding max-cos values,
     so this lower-bounds the decision margin. Engines sum the cosine
     dot product in different orders (noise ~1e-12); the margin must
     sit >> that, and the q32/q68 contract wants >= 1e-4;
  2. the admitted/rejected mix (a one-sided split would make the gate
     vacuous);
  3. batch top-1/probe-boundary cell d2 gaps (integer grid, cell
     tie-break — reported for visibility like probe_hybrid_ann's #2).

Usage: probe_semadmit.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q164_semantic_admit first so the
dump holds the shipped oracle text).
"""
import sys, json, re, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v164"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q164_semantic_admit"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (emitted by the shipped Scala generators) ----
assert sql.count("mxc AS (") == 1 and sql.count("t1 AS (") == 1
thr = float(re.search(r">= ([0-9.]+)::DOUBLE", sql).group(1))
head_t1 = sql.split("t1 AS (")[0].rstrip().rstrip(",")   # WITH ... mxc AS (...)

# 1. pair-level threshold margin (superset of the deciding max-cos set)
pair_src = re.search(r"mxc AS \(SELECT (.*?)GROUP BY bp\.vec_id\)", sql, re.S).group(1)
body = re.sub(r"^bp\.vec_id, max\((.*?)\) AS m", r"bp.vec_id, \1 AS cos", pair_src, flags=re.S)
g = con.sql(head_t1 + f""",
pairs AS (SELECT {body})
SELECT min(abs(cos - {thr!r})), count(*) FROM pairs""").fetchone()
m_str = "n/a (no candidate pairs)" if g[0] is None else f"{g[0]:.6g}"
print(f"min |cos - {thr}| over {g[1]} candidate pairs: {m_str}  (need >= 1e-4)")
if g[0] is not None and g[0] < 1e-4:
    print("WARNING: threshold within the q32 danger band"); sys.exit(1)

# 2. decision-level margin and the admitted/rejected mix
d = con.sql(head_t1 + f"""
SELECT min(abs(m - {thr!r})),
       count(*) FILTER (m >= {thr!r}), count(*) FILTER (m < {thr!r})
FROM mxc""").fetchone()
dm = "n/a" if d[0] is None else f"{d[0]:.6g}"
print(f"decision margin min |maxcos - thr|: {dm}; rejected={d[1]} admitted>={d[2]}")
if d[1] == 0 or d[2] == 0:
    print("WARNING: one-sided verdict split — the gate is vacuous"); sys.exit(1)

# 3. batch cell-assignment boundary gaps (top-1 used for `cell`, rank 4/5
#    bounds the probe set) — integer grid, deterministic tie-break
bp_block = head_t1[head_t1.index("bp AS ("):]
m2 = re.search(r"ORDER BY (.*?) ASC, (c\d+)\.cell ASC", bp_block, re.S)
d2, fin = m2.group(1), m2.group(2)
qfilter = re.search(r"FROM qv CROSS JOIN c\d+ (WHERE.*?)\)\s*WHERE rn <= 4\)", bp_block, re.S).group(1)
base = head_t1.split("af AS (")[0].rstrip().rstrip(",")
for lo, hi, what in ((1, 2, "top-1 cell"), (4, 5, "probe boundary")):
    gap = con.sql(base + f""",
d AS (SELECT qv.vec_id, {d2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {d2} ASC, {fin}.cell ASC) AS rn
      FROM qv CROSS JOIN {fin} {qfilter})
SELECT min(b.d2 - a.d2), count(*) FROM d a JOIN d b
ON a.vec_id = b.vec_id AND a.rn = {lo} AND b.rn = {hi}""").fetchone()
    g_str = "n/a" if gap[0] is None else f"{gap[0]:.6g}"
    print(f"{what} d2 gap (rank{lo}->{hi}, {gap[1]} vecs): {g_str}  (integer grid; ties cell-tie-broken)")
print("margins conclusive")

#!/usr/bin/env python3
"""Probe + prototype of the q34/q68 DuckDB KMeans-replay oracles.

Replays graft.ann.Ivf's quantized deterministic fit (md5-ordered init,
2 Lloyd rounds of exact integer sums) in DuckDB, compares against the
Spark dump, and measures every cross-engine-fragile margin:
  - init oversample adequacy (>= numCells distinct qvecs in the window)
  - assignment argmin gaps at every stage (abs d2 units, quantized space)
  - probe-boundary gaps (rank nProbes vs nProbes+1)
  - q34 top-k cos adjacency at and inside the rank boundary
  - q68 threshold margin |cos - thr|
Usage: probe_ivf.py <sfdir> [sparkdump_dir]
"""
import sys, duckdb, glob

sfdir = sys.argv[1]
dump = sys.argv[2] if len(sys.argv) > 2 else None
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sfdir}/embeddings.parquet'")

D2 = "list_sum(list_transform(range(1,65), i -> (CAST(q[i] AS DOUBLE) - c[i])^2))"

def kmeans_ctes(cells, iters):
    ctes = f"""
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL),
qv AS (SELECT vec_id, v, list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS q FROM e),
hs AS (SELECT DISTINCT q, md5(array_to_string(q, ',')) AS h FROM qv),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS INT) AS cell,
              list_transform(q, x -> CAST(x AS DOUBLE)) AS c
       FROM (SELECT q, h FROM hs ORDER BY h LIMIT {cells}))"""
    prev = "c0"
    for it in range(iters):
        ctes += f""",
a{it} AS (SELECT vec_id, q, cell FROM (
   SELECT qv.vec_id, qv.q, {prev}.cell,
     row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {prev}.cell ASC) AS rn
   FROM qv CROSS JOIN {prev}) WHERE rn = 1),
s{it} AS (SELECT cell, i, sum(q[i]) AS s, count(*) AS cnt
   FROM a{it} CROSS JOIN range(1,65) t(i) GROUP BY cell, i),
m{it} AS (SELECT cell, list(CAST(s AS DOUBLE) / cnt ORDER BY i) AS c FROM s{it} GROUP BY cell),
c{it+1} AS (SELECT c0.cell, coalesce(m{it}.c, c0prev.c) AS c
   FROM c0 LEFT JOIN m{it} USING (cell) LEFT JOIN {prev} c0prev USING (cell))"""
        prev = f"c{it+1}"
    return ctes, prev

# ---------------- q34: cells=16, iters=2, nProbes=4, k=5 ----------------
ctes, fin = kmeans_ctes(16, 2)
q34 = f"""WITH {ctes},
af AS (SELECT vec_id, cell FROM (
   SELECT qv.vec_id, {fin}.cell,
     row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin}.cell ASC) AS rn
   FROM qv CROSS JOIN {fin}) WHERE rn = 1),
pr AS (SELECT vec_id, cell FROM (
   SELECT qv.vec_id, {fin}.cell,
     row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin}.cell ASC) AS rn
   FROM qv CROSS JOIN {fin} WHERE qv.vec_id % 50 = 0) WHERE rn <= 4),
cand AS (SELECT DISTINCT pr.vec_id AS qid, af.vec_id AS nid
   FROM pr JOIN af USING (cell) WHERE af.vec_id <> pr.vec_id),
scored AS (SELECT qid, nid, list_cosine_similarity(a.v, b.v) AS cos
   FROM cand JOIN e a ON a.vec_id = cand.qid JOIN e b ON b.vec_id = cand.nid)
SELECT qid, nid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) <= 5
ORDER BY qid, rank"""

r34 = con.sql(q34).fetchall()
print(f"q34 oracle rows: {len(r34)}")

if dump:
    f = glob.glob(f"{dump}/q34_ivf_topk/*.parquet")
    spark34 = con.sql(f"SELECT qid, nid, rank FROM '{f[0]}' ORDER BY qid, rank").fetchall()
    match = spark34 == r34
    print(f"q34 MATCH: {match} (spark {len(spark34)} rows)")
    if not match:
        s, o = set(spark34), set(r34)
        print(" only-spark:", sorted(s - o)[:10])
        print(" only-oracle:", sorted(o - s)[:10])

# margins: assignment gaps at each stage
for stage, cen in [("a0", "c0"), ("a1", "c1"), ("af", "c2")]:
    g = con.sql(f"""WITH {ctes},
d AS (SELECT qv.vec_id, {D2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {cen}.cell ASC) AS rn
      FROM qv CROSS JOIN {cen})
SELECT min(b.d2 - a.d2) FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2""").fetchone()[0]
    print(f"q34 argmin gap @{stage} (vs {cen}): {g:.6g}  (d2 scale ~1e12, fp err ~1e-2)")
g45 = con.sql(f"""WITH {ctes},
d AS (SELECT qv.vec_id, {D2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin}.cell ASC) AS rn
      FROM qv CROSS JOIN {fin} WHERE qv.vec_id % 50 = 0)
SELECT min(b.d2 - a.d2) FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.rn = 4 AND b.rn = 5""").fetchone()[0]
print(f"q34 probe boundary gap (rank4->5): {g45:.6g}")
# cos adjacency among candidates through rank 6
adj = con.sql(f"""WITH {ctes},
af AS (SELECT vec_id, cell FROM (
   SELECT qv.vec_id, {fin}.cell,
     row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin}.cell ASC) AS rn
   FROM qv CROSS JOIN {fin}) WHERE rn = 1),
pr AS (SELECT vec_id, cell FROM (
   SELECT qv.vec_id, {fin}.cell,
     row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin}.cell ASC) AS rn
   FROM qv CROSS JOIN {fin} WHERE qv.vec_id % 50 = 0) WHERE rn <= 4),
cand AS (SELECT DISTINCT pr.vec_id AS qid, af.vec_id AS nid
   FROM pr JOIN af USING (cell) WHERE af.vec_id <> pr.vec_id),
scored AS (SELECT qid, nid, list_cosine_similarity(a.v, b.v) AS cos,
     row_number() OVER (PARTITION BY qid ORDER BY list_cosine_similarity(a.v, b.v) DESC) AS rn
   FROM cand JOIN e a ON a.vec_id = cand.qid JOIN e b ON b.vec_id = cand.nid)
SELECT min(a.cos - b.cos) FROM scored a JOIN scored b
ON a.qid = b.qid AND b.rn = a.rn + 1 AND a.rn <= 6""").fetchone()[0]
print(f"q34 min adjacent cos gap (ranks 1..7): {adj:.6g}  (need >> 1e-12)")

# ---------------- q68: cells=8, iters=2, probes=2, thr=0.4 ----------------
ctes8, fin8 = kmeans_ctes(8, 2)
pairs68 = f"""WITH {ctes8},
asg AS (SELECT vec_id, cell FROM (
   SELECT qv.vec_id, {fin8}.cell,
     row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin8}.cell ASC) AS rn
   FROM qv CROSS JOIN {fin8}) WHERE rn <= 2),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
   FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id),
scored AS (SELECT id_a, id_b, list_cosine_similarity(a.v, b.v) AS cos
   FROM cand JOIN e a ON a.vec_id = cand.id_a JOIN e b ON b.vec_id = cand.id_b)"""
marg = con.sql(pairs68 + """
SELECT min(abs(cos - 0.4)), count(*) FILTER (cos >= 0.4), count(*) FROM scored""").fetchone()
print(f"q68 threshold margin |cos-0.4|: {marg[0]:.6g}; pairs>=thr {marg[1]} of {marg[2]}")
for stage, cen in [("a0", "c0"), ("a1", "c1")]:
    g = con.sql(f"""WITH {ctes8},
d AS (SELECT qv.vec_id, {D2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {cen}.cell ASC) AS rn
      FROM qv CROSS JOIN {cen})
SELECT min(b.d2 - a.d2) FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2""").fetchone()[0]
    print(f"q68 argmin gap @{stage}: {g:.6g}")
g23 = con.sql(f"""WITH {ctes8},
d AS (SELECT qv.vec_id, {D2} AS d2,
        row_number() OVER (PARTITION BY qv.vec_id ORDER BY {D2} ASC, {fin8}.cell ASC) AS rn
      FROM qv CROSS JOIN {fin8})
SELECT min(b.d2 - a.d2) FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.rn = 2 AND b.rn = 3""").fetchone()[0]
print(f"q68 probe boundary gap (rank2->3): {g23:.6g}")

# q68 full result (CC + prune) vs spark dump
q68 = pairs68 + """,
hits AS (SELECT id_a, id_b FROM scored WHERE cos >= 0.4),
edges AS (SELECT id_a AS src, id_b AS dst FROM hits UNION ALL SELECT id_b, id_a FROM hits),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS root FROM nodes
  UNION
  SELECT edges.dst AS id, reach.root FROM reach JOIN edges ON edges.src = reach.id),
canon AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY id),
dropped AS (SELECT id FROM canon WHERE id <> cluster_id)
SELECT vec_id, label FROM embeddings WHERE vec_id NOT IN (SELECT id FROM dropped)
ORDER BY vec_id"""
q68 = q68.replace("WITH ", "WITH RECURSIVE ", 1)
r68 = con.sql(q68).fetchall()
print(f"q68 oracle rows: {len(r68)}")
if dump:
    f = glob.glob(f"{dump}/q68_semantic_prune/*.parquet")
    spark68 = con.sql(f"SELECT vec_id, label FROM '{f[0]}' ORDER BY vec_id").fetchall()
    match = spark68 == r68
    print(f"q68 MATCH: {match} (spark {len(spark68)} rows)")
    if not match:
        s, o = set(spark68), set(r68)
        print(" only-spark:", sorted(s - o)[:10])
        print(" only-oracle:", sorted(o - s)[:10])

# init oversample adequacy (both fits)
n = con.sql("""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL),
qv AS (SELECT list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS q FROM e),
h AS (SELECT q, md5(array_to_string(q, ',')) AS h FROM qv),
w AS (SELECT q FROM h ORDER BY h LIMIT 128)
SELECT count(DISTINCT q) FROM w""").fetchone()[0]
print(f"init window (128 smallest hashes) distinct qvecs: {n} (need >= 16)")

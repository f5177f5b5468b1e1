#!/usr/bin/env python3
"""Probe q168's (chained semantic ingest) threshold margins.

Zero-drift design (probe_hybrid_ann pattern): loads the SHIPPED q168
SQL from a Verify dump's oracle_sql.json, extracts the threshold from
the shipped CASE expression, and reuses the shipped CTE chain for the
per-round mixes. What it measures:

  1. min |cos - threshold| over ALL embedding pairs — every round's
     candidate set (stored-so-far × batch, within probed cells) is a
     subset of the all-pairs set, so this ONE margin bounds every
     round's decision margin at once (the global form of the q164
     probe). Must be >= 1e-4;
  2. per-round admitted/rejected mixes from the shipped v1/v2/v3 CTEs
     (each round should reject something once the index has grown, and
     admit most — a one-sided chain would make the gate vacuous; round
     1 rejecting zero at tiny scale is reported, not fatal, as long as
     SOME round rejects).

Usage: probe_sem_ingest.py <sfdir> <verify_dump_dir>
(run Verify with SPARK_GRAFT_QUERIES=q168_semantic_ingest first).
"""
import sys, json, re, os, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v168"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))["q168_semantic_ingest"]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

thr = float(re.search(r">= ([0-9.]+)::DOUBLE", sql).group(1))

# 1. global all-pairs margin (bounds every round's candidate subset)
g = con.sql(f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE embedding IS NOT NULL)
SELECT min(abs(list_cosine_similarity(a.v, b.v) - {thr!r})), count(*)
FROM e a JOIN e b ON a.vec_id < b.vec_id""").fetchone()
m_str = "n/a" if g[0] is None else f"{g[0]:.6g}"
print(f"global min |cos - {thr}| over {g[1]} pairs: {m_str}  (need >= 1e-4; bounds every round)")
if g[0] is not None and g[0] < 1e-4:
    print("WARNING: threshold within the q32 danger band for SOME pair"); sys.exit(1)

# 2. per-round mixes from the shipped chain
assert sql.count("st1 AS MATERIALIZED") == 1
head = sql[:sql.rindex("SELECT CAST(1 AS INT) AS round")].rstrip()
total_rej = 0
for r in (1, 2, 3):
    cnt = con.sql(head + f"""
SELECT count(*) FILTER (admitted = 0), count(*) FILTER (admitted = 1) FROM v{r}""").fetchone()
    print(f"round {r}: rejected={cnt[0]} admitted={cnt[1]}")
    total_rej += cnt[0]
    if cnt[1] == 0:
        print("WARNING: a round admitted nothing — chain is degenerate"); sys.exit(1)
if total_rej == 0:
    print("WARNING: no round rejected anything — the chain never exercises the index")
    sys.exit(1)
print("margins conclusive")

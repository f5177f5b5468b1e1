#!/usr/bin/env python3
"""Probe q183's (learned quality filter) single cross-engine-fragile
surface: training is integer-exact EXCEPT the per-doc sigmoid residual
re-quantization `floor((y - sigmoid(s/1e6))*1e6 + 0.5)` — a 1-ulp
difference between JVM Math.exp and DuckDB's libm exp flips a residual
only if the argument of floor() sits within ~1e-10 of an integer. This
probe measures min distance of that argument to the nearest integer
over EVERY (train doc, epoch); healthy corpora read ~1e-4 (6 orders
above ulp noise). Everything downstream (BIGINT gradients, truncating-div
updates, integer scores, strict `> 0` keep rule) is exact arithmetic
with no boundary to probe; the zero-score count is reported for
visibility (score 0 → keep 0 deterministically in both engines).

Zero-drift design (the probe_bpe lesson): the probe loads the SHIPPED
q183 SQL from a Verify dump's oracle_sql.json and carves its per-epoch
probes out of that exact CTE chain at stable textual markers.

Usage: probe_qf.py <sfdir> <verify_dump_dir> [query_name]
(run Verify with SPARK_GRAFT_QUERIES=<query_name> first; default
q183_quality_filter, pass q193_qf_holdout for the bigram variant —
same chain, same single float surface, bigram tf CTE).
"""
import sys, json, os, glob, re
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
qname = sys.argv[3] if len(sys.argv) > 3 else "q183_quality_filter"

sql = json.load(open(os.path.join(dump, "oracle_sql.json")))[qname]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} AS SELECT * FROM '{p}'")

# ---- carve points (emitted by qfOracle) ----
epochs = sorted(int(m) for m in re.findall(r"\bs(\d+) AS MATERIALIZED", sql))
assert epochs and epochs == list(range(1, len(epochs) + 1)), "epoch CTEs moved"
if ",\nhs AS MATERIALIZED" in sql:  # q193: held-out CTE follows the chain
    head = sql[:sql.rindex(",\nhs AS MATERIALIZED")].rstrip()
else:
    assert sql.count("\nSELECT l.doc_id,") == 1, "final-select marker moved"
    head = sql[:sql.rindex("\nSELECT l.doc_id,")].rstrip().rstrip(",").rstrip()

worst = None
for i in epochs:
    t_expr = ("((t.y - 1.0/(1.0 + exp(-(s.s/1000000.0)))) * 1000000.0 + 0.5)")
    d, n = con.sql(head + f"""
SELECT min(least(t - floor(t), ceil(t) - t)), count(*) FROM (
  SELECT {t_expr} AS t FROM trn t JOIN s{i} s USING (doc_id))""").fetchone()
    print(f"epoch {i}: min floor-flip distance over {n} residuals: {d:.6g}")
    if worst is None or d < worst:
        worst = d
z = con.sql(head + """
SELECT sum(CASE WHEN sc = 0 THEN 1 ELSE 0 END), count(*) FROM (
  SELECT sum(f.cnt * w.w) AS sc FROM ft f
  JOIN w%d w USING (bucket) GROUP BY f.doc_id)""" % epochs[-1]).fetchone()
print(f"zero scores (keep=0 deterministically): {z[0]}/{z[1]} docs")
print(f"worst flip distance: {worst:.6g}  (need >> 1e-10 ulp noise)")
if worst < 1e-7:
    print("WARNING: a residual sits near a floor boundary — re-salt or re-grain")
    sys.exit(1)
print("margins conclusive")

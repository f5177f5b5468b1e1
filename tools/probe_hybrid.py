#!/usr/bin/env python3
"""Probe q154's dense-side cosine quantization before shipping the oracle.

The hybrid fusion itself is exact integer arithmetic; the sparse side
reuses q96's probed ranking. The one new float surface is the dense
retriever's quantized cosine ⌊cos·10⁴+½⌋: Spark's native kernel and
DuckDB's list_cosine_similarity sum in different orders, so every
(query, corpus) cosine must sit far from a .5 grid boundary for the
quantized values — and hence the ranks — to agree. This probe computes
all cosines for the q154 query set in python float64 and reports the
min |frac(cos·10⁴) − 0.5| across the full candidate matrix, plus the
rank-region tie structure (ties are fine — id tie-break — only
boundary proximity is a risk).

Usage: python3 tools/probe_hybrid.py /root/testdata/sf0.01
"""
import sys, math
import duckdb

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    qids = [r[0] for r in con.execute(f"""
        SELECT doc_id FROM read_parquet('{sfdir}/documents.parquet')
        WHERE doc_id % 125 = 3 AND length(trim(text)) > 0
          AND doc_id IN (SELECT vec_id FROM read_parquet('{sfdir}/embeddings.parquet'))
        ORDER BY doc_id""").fetchall()]
    vecs = {r[0]: r[1] for r in con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sfdir}/embeddings.parquet')").fetchall()}
    print(f"{sfdir}: dense queries={len(qids)} corpus={len(vecs)}")
    min_margin, arg = 1e9, None
    for q in qids:
        qv = [float(x) for x in vecs[q]]
        qn = math.sqrt(sum(x * x for x in qv))
        for nid, nv in vecs.items():
            nv = [float(x) for x in nv]
            nn = math.sqrt(sum(x * x for x in nv))
            dot = sum(a * b for a, b in zip(qv, nv))
            cos = dot / (qn * nn) if qn > 0 and nn > 0 else 0.0
            x = cos * 10000
            margin = abs((x - math.floor(x)) - 0.5)
            if margin < min_margin:
                min_margin, arg = margin, (q, nid, cos)
    print(f"min |frac(cos*1e4) - 0.5| = {min_margin:.3e} at (qid,nid,cos)={arg}")
    if min_margin < 1e-6:
        print("WARNING: margin < 1e-6 — quantized cosine may disagree across engines")
        sys.exit(1)
    print("margins conclusive (>= 1e-6; cross-engine cosine noise is ~1e-11 on this grid)")

if __name__ == "__main__":
    main()

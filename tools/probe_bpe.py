#!/usr/bin/env python3
"""Probe the q152 BPE-merge oracle before shipping it.

Validates three things on real testdata (sf0.01 and sf0.1):
  1. A pure-python reference BPE (greedy left-to-right fold merge,
     (count desc, lhs asc, rhs asc) argmax) produces the merge table.
  2. The generated unrolled DuckDB SQL (the oracle) produces the SAME
     table — i.e. the delimiter-wrapped string-replace formulation is
     equivalent to the fold formulation on this data.
  3. Tie margins: report whether any iteration's argmax was decided by
     the lexicographic tie-break (fine — deterministic in both engines
     for ASCII) and whether any non-ASCII word participates (would make
     collation order load-bearing).

Usage: python3 tools/probe_bpe.py /root/testdata/sf0.01 [k]
"""
import sys, re, collections
import duckdb

SEP = "\x1d"


def words_of(con, sfdir):
    rows = con.execute(
        f"""SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
              SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
                  ELSE regexp_split_to_array(trim(text), '\\s+') END) AS word
              FROM read_parquet('{sfdir}/documents.parquet'))
            WHERE NOT contains(word, chr(29)) GROUP BY 1""").fetchall()
    return rows


def reference_bpe(vocab, k):
    """vocab: list[(word, freq)] -> list[(rank, lhs, rhs, cnt)]; fold merge."""
    words = [([*w_codepoints(w)], f) for w, f in vocab]
    merges, ties = [], []
    for rank in range(1, k + 1):
        counts = collections.Counter()
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        top = sorted(counts.values(), reverse=True)
        if len(top) > 1 and top[0] == top[1]:
            ties.append(rank)
        merges.append((rank, l, r, c))
        nw = []
        for syms, f in words:
            out = [syms[0]] if syms else []
            for t in syms[1:]:
                if out and out[-1] == l and t == r:
                    out[-1] = l + r
                else:
                    out.append(t)
            nw.append((out, f))
        words = nw
    return merges, ties


def w_codepoints(w):
    return [c for c in w]  # python strings are code points already


def oracle_sql(sfdir, k, maxlen=512):
    b = []
    b.append(f"""WITH w AS MATERIALIZED (
  SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
      ELSE regexp_split_to_array(trim(text), '\\s+') END) AS word
  FROM read_parquet('{sfdir}/documents.parquet')),
v AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w
  WHERE NOT contains(word, chr(29)) GROUP BY 1),
r0 AS MATERIALIZED (
  SELECT chr(29) || array_to_string(
      list_transform(range(1, length(word)+1), i -> substr(word, CAST(i AS INT), 1)),
      chr(29)||chr(29)) || chr(29) AS repr, freq FROM v),
pos AS MATERIALIZED (SELECT unnest(range(1, {maxlen})) AS j)""")
    for i in range(1, k + 1):
        b.append(f""",
t{i} AS (SELECT string_split(substr(repr, 2, length(repr)-2), chr(29)||chr(29)) AS toks, freq FROM r{i-1}),
p{i} AS MATERIALIZED (
  SELECT toks[CAST(j AS INT)] AS lhs, toks[CAST(j AS INT)+1] AS rhs,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM t{i} JOIN pos ON j < len(toks) GROUP BY 1, 2),
b{i} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1),
r{i} AS MATERIALIZED (
  SELECT replace(repr, chr(29)||lhs||chr(29)||chr(29)||rhs||chr(29),
                 chr(29)||lhs||rhs||chr(29)) AS repr, freq
  FROM r{i-1}, b{i})""")
    sel = "\nUNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, cnt FROM b{i}" for i in range(1, k + 1))
    b.append(f"\n{sel}\nORDER BY merge_rank" if k else "")
    return "".join(b)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    con = duckdb.connect()
    vocab = words_of(con, sfdir)
    nonascii = [w for w, _ in vocab if any(ord(c) > 127 for c in w)]
    maxw = max((len(w) for w, _ in vocab), default=0)
    print(f"{sfdir}: vocab={len(vocab)} non_ascii_words={len(nonascii)}"
          + (f" e.g. {nonascii[:3]}" if nonascii else "")
          + f" max_word_len={maxw}")
    # the oracle's position table is bounded at 512 symbols and now
    # error()s when exceeded; still surface the headroom here
    if maxw >= 512:
        print("WARNING: a word exceeds the oracle maxLen=512 — the oracle will error()")
        sys.exit(1)
    ref, ties = reference_bpe(vocab, k)
    print("reference merges:")
    for m in ref:
        print("  ", m)
    print(f"tie-broken-iterations={ties}")
    import time
    t0 = time.time()
    got = con.execute(oracle_sql(sfdir, k)).fetchall()
    print(f"oracle ran in {time.time()-t0:.2f}s")
    got = [tuple(r) for r in got]
    if got == ref:
        print("ORACLE == REFERENCE: OK")
    else:
        print("MISMATCH:")
        for a, b_ in zip(ref, got):
            flag = "" if a == b_ else "   <-- DIFFERS"
            print(f"  ref={a} oracle={b_}{flag}")
        sys.exit(1)
    # runner-up margins per iteration (is the argmax close?)
    print("top-2 counts per iteration (margin report):")
    vocab2 = vocab
    words = [([*w], f) for w, f in vocab2]
    for rank, l, r, c in ref:
        counts = collections.Counter()
        for syms, f in words:
            for a, b2 in zip(syms, syms[1:]):
                counts[(a, b2)] += f
        top2 = sorted(counts.values(), reverse=True)[:2]
        print(f"  rank {rank}: top={top2[0]} second={top2[1] if len(top2)>1 else '-'}")
        nw = []
        for syms, f in words:
            out = [syms[0]] if syms else []
            for t in syms[1:]:
                if out and out[-1] == l and t == r:
                    out[-1] = l + r
                else:
                    out.append(t)
            nw.append((out, f))
        words = nw


if __name__ == "__main__":
    main()

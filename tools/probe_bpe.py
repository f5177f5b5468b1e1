#!/usr/bin/env python3
"""Probe the q152 BPE-merge oracle before shipping it.

Validates three things on real testdata (sf0.01 and sf0.1):
  1. A pure-python reference BPE (greedy left-to-right fold merge,
     (count desc, lhs asc, rhs asc) argmax) produces the merge table.
  2. The SHIPPED unrolled DuckDB oracle — read verbatim from the
     oracle_sql.json that `graft.Verify` dumps, NOT regenerated here
     (ADVICE r7: a probe-local SQL generator drifted from the shipped
     template in exactly the hardened edge cases) — produces the SAME
     table: the delimiter-wrapped string-replace formulation is
     equivalent to the fold formulation on this data.
  3. Tie margins: report whether any iteration's argmax was decided by
     the lexicographic tie-break (fine — deterministic in both engines
     for ASCII) and whether any non-ASCII word participates (would make
     collation order load-bearing).

Usage: python3 tools/probe_bpe.py /root/testdata/sf0.01 [k] [oracle_sql.json]
  Run `sbt "runMain graft.Verify <sfdir> /tmp/verify_out"` first (or point
  arg 3 at any oracle_sql.json dump). The shipped oracle is k=8; with any
  other k only the python reference + margin report runs.
"""
import sys, re, json, os, collections
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


def shipped_oracle(dump_path):
    """The q152 oracle EXACTLY as the driver will run it — no local copy."""
    with open(dump_path) as f:
        oracles = json.load(f)
    sql = oracles.get("q152_bpe_merges")
    if sql is None:
        raise SystemExit(f"{dump_path} has no q152_bpe_merges entry")
    return sql


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
    dump = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out/oracle_sql.json"
    if k != 8:
        print(f"k={k} != 8 (the shipped oracle's depth): reference+margins only")
    elif not os.path.exists(dump):
        raise SystemExit(
            f"{dump} not found — run `sbt \"runMain graft.Verify {sfdir} "
            "/tmp/verify_out\"` first so the probe validates the SHIPPED oracle")
    else:
        import time
        con.execute(f"CREATE OR REPLACE VIEW documents AS "
                    f"SELECT * FROM read_parquet('{sfdir}/documents.parquet')")
        t0 = time.time()
        got = con.execute(shipped_oracle(dump)).fetchall()
        print(f"shipped oracle ran in {time.time()-t0:.2f}s")
        # the shipped UNION ALL carries no ORDER BY; sort by merge_rank
        got = sorted((tuple(r) for r in got), key=lambda r: r[0])
        if got == ref:
            print("SHIPPED ORACLE == REFERENCE: OK")
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

#!/usr/bin/env python3
"""sf1-feasible oracle for q101 (BPE merge training).

The shipped q101 oracle unrolls each training round as position-explode
+ two self-joins — fine at the driver's sf0.01 gate, but at sf1 the
~10× replicated corpus pushes DuckDB's intermediate position tables
past memory even with spilling. This script recomputes the merge table
with the same exact-integer/exact-string semantics in plain Python
(tokenize → count adjacent pairs → (cnt DESC, l, r) winner → greedy
left-to-right re-tokenization), which is linear in corpus size, and
compares it to the Spark dump value-for-value.

Usage: python3 scripts/bpe_check.py <sf_dir> <verify_out_dir>
"""
import sys, glob, re
from collections import Counter
import pandas as pd

STEPS = 4

def tokens(text):
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]

def merge(toks, l, r):
    out, i, m = [], 0, l + r
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
            out.append(m); i += 2
        else:
            out.append(toks[i]); i += 1
    return out

def main(sf_dir, out_dir):
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])["text"]
    seqs = [tokens(t) for t in texts]
    expected = []
    for step in range(1, STEPS + 1):
        counts = Counter()
        for s in seqs:
            counts.update(zip(s, s[1:]))
        if not counts:
            continue
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, l, r, c))
        seqs = [merge(s, l, r) for s in seqs]
    got = pd.concat([pd.read_parquet(f) for f in
                     glob.glob(f"{out_dir}/q101_bpe_train/*.parquet")])
    got = got.sort_values("step").reset_index(drop=True)
    got_rows = [(int(x.step), x.tok_left, x.tok_right, int(x.cnt))
                for x in got.itertuples()]
    if got_rows == expected:
        print(f"PASS q101_bpe_train ({len(expected)} merges: {expected})")
        return 0
    print(f"FAIL q101_bpe_train:\n  spark  = {got_rows}\n  python = {expected}")
    return 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

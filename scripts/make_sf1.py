#!/usr/bin/env python3
"""Synthesize an sf1 fixture (10x sf0.1) for the local scale check.

The driver's generators (TESTDATA.md, seed=42) are not shipped, so sf1
is built from 10 key-offset copies of every sf0.1 fact/entity table,
sharing the region/nation dimension enums. Each copy's keys are offset
by a per-table stride so copies form disjoint FK-consistent universes;
strides are rounded up to a multiple of 400 (and hence even) so
modulo-derived semantics survive replication unchanged — the PostsProxy
title universe (doc_id % 400), q08's event_id parity, etc.

FRESH CONTENT (round 7 — replaces the verbatim replication that made
every text/vector an exact 10-way duplicate and pushed the pair-dedup
queries into measuring fixture artifacts):

- documents: copy c >= 1 gets a per-copy deterministic rewrite of each
  text — a stride permutation of its words (kills n-gram shingles,
  8-token spans, minhash signatures, char-gram blocks ACROSS copies
  while preserving the word distribution that drives language-ID /
  quality / token-count queries) plus a suffix mutation of every 7th
  word (kills exact bag-of-words equality, so q104's rep-collapse and
  q50's md5 clusters stay copy-local). Texts that are exact duplicates
  WITHIN sf0.1 receive the same rewrite, so intra-copy duplicate
  structure — the thing the dedup queries measure — is preserved
  exactly; cross-copy exact/near duplication is gone. n_chars is
  recomputed for the rewritten text.
- embeddings: copy c >= 1 rotates each vector's dimensions by 7*c
  (norms and intra-copy equality preserved; cross-copy cosine drops to
  random-vector levels, so near-dup clusters are copy-local).
- events: copy c >= 1 shifts every timestamp by c * (span + 1h), so a
  10x event stream spans ~10x the time instead of 10x the density —
  the time-range/asof/containment joins (q58/q59/q81) stay linear in
  corpus size as a real longer history would, and literal-window
  filters (q06/q09) prune 9/10 of the history exactly like a
  date-partitioned production sink. (orders/lineitem dates are NOT
  shifted: TPC-H's own generators keep the date range fixed across
  scale factors, so density growth there is the faithful model.)

What this deliberately does NOT change: the PostsProxy TEMPLATE titles
are doc_id % 400 arithmetic, so the 11 parameterized template branches
still repeat every 400 doc_ids at any corpus size — q51/q53/q75's
doc-pair outputs stay quadratic in per-title multiplicity BY DECLARED
SEMANTICS (the linear production contracts are q87/q70). Only the
text-derived titles (branch 11, 1/12 of docs) become copy-fresh.
BASELINE.md reattributes the sf1 numbers accordingly.

Usage: python3 scripts/make_sf1.py [out_dir (default /root/repo/target/sf1)]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-table key columns to offset; stride derives from the table's own
# max key, rounded up to a multiple of 400
KEYED = {
    "customer":   ["c_custkey"],
    "orders":     ["o_orderkey", "o_custkey"],
    "lineitem":   ["l_orderkey", "l_partkey", "l_suppkey"],
    "part":       ["p_partkey"],
    "supplier":   ["s_suppkey"],
    "events":     ["event_id", "user_id"],
    "documents":  ["doc_id"],
    "embeddings": ["vec_id"],
}
# FK columns take the stride of the table they reference
FK_SOURCE = {"o_custkey": "customer", "l_orderkey": "orders",
             "l_partkey": "part", "l_suppkey": "supplier"}
SHARED_DIMS = ["region", "nation"]  # fixed enums: single copy

PRIMES = [3, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]


def stride_of(table: pa.Table, key: str) -> int:
    mx = pa.compute.max(table.column(key)).as_py()
    return ((mx + 400) // 400) * 400


def rewrite_text(text, c):
    """Deterministic per-copy rewrite: stride-permute words, suffix
    every 7th. Same input text + copy -> same output, so intra-copy
    exact-duplicate clusters survive the rewrite verbatim."""
    if text is None:
        return None
    words = text.split()
    n = len(words)
    if n == 0:
        return text
    s = next(p for p in PRIMES[c - 1:] + PRIMES if n % p != 0) if n > 1 else 1
    out = [words[(i * s + c) % n] for i in range(n)]
    out = [w + "c%d" % c if i % 7 == 3 else w for i, w in enumerate(out)]
    return " ".join(out)


def fresh_documents(t: pa.Table, c: int, key_off) -> pa.Table:
    texts = t.column("text").to_pylist()
    new_texts = [rewrite_text(x, c) for x in texts]
    cols, names = [], []
    for name in t.column_names:
        if name == "doc_id":
            cols.append(pa.compute.add(t.column(name), key_off))
        elif name == "text":
            cols.append(pa.array(new_texts, type=pa.string()))
        elif name == "n_chars":
            cols.append(pa.array(
                [None if x is None else len(x) for x in new_texts],
                type=t.column(name).type))
        else:
            cols.append(t.column(name))
        names.append(name)
    return pa.table(cols, names=names)


def fresh_embeddings(t: pa.Table, c: int, key_off) -> pa.Table:
    rot = (7 * c) % 64
    vecs = t.column("embedding").to_pylist()
    rotated = [None if v is None else v[rot:] + v[:rot] for v in vecs]
    cols, names = [], []
    for name in t.column_names:
        if name == "vec_id":
            cols.append(pa.compute.add(t.column(name), key_off))
        elif name == "embedding":
            cols.append(pa.array(rotated, type=t.column(name).type))
        else:
            cols.append(t.column(name))
        names.append(name)
    return pa.table(cols, names=names)


PER_SECOND = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}


def fresh_events(t: pa.Table, c: int, key_offs, span: int) -> pa.Table:
    ts_type = t.schema.field("ts").type
    unit = ts_type.unit  # shift in the column's NATIVE unit
    shift = pa.scalar((span + 3600 * PER_SECOND[unit]) * c,
                      type=pa.duration(unit))
    cols, names = [], []
    for name in t.column_names:
        col = t.column(name)
        if name in key_offs:
            col = pa.compute.add(col, key_offs[name])
        elif name == "ts":
            col = pa.compute.add(col, shift).cast(ts_type)
        cols.append(col)
        names.append(name)
    return pa.table(cols, names=names)


def main(out_dir: str, copies: int = COPIES) -> None:
    global COPIES
    COPIES = copies  # 10 = sf1; 30 = sf3 (the second scaling point)
    os.makedirs(out_dir, exist_ok=True)
    tables = {n: pq.read_table(f"{SRC}/{n}.parquet")
              for n in list(KEYED) + SHARED_DIMS}
    strides = {n: stride_of(tables[n], KEYED[n][0]) for n in KEYED}

    # Bounded row groups: pq.write_table's default packs each table
    # into one or two giant row groups, and a row group is the atomic
    # unit a Spark scan task can claim — a 1M-row events table written
    # as ONE group reads as ONE task no matter the split settings
    # (measured: the whole q181 gram expansion ran serial at sf1).
    # ≥64 groups per table lets the Bench/Verify split sizing fan the
    # scan out across local[32].
    def rg(rows: int) -> int:
        return max(2048, rows // 64)

    for n in SHARED_DIMS:
        pq.write_table(tables[n], f"{out_dir}/{n}.parquet")

    for n, keys in KEYED.items():
        t = tables[n]
        parts = [t]
        for c in range(1, COPIES):
            if n == "documents":
                off = pa.scalar(c * strides[n], type=t.column("doc_id").type)
                parts.append(fresh_documents(t, c, off))
                continue
            if n == "embeddings":
                off = pa.scalar(c * strides[n], type=t.column("vec_id").type)
                parts.append(fresh_embeddings(t, c, off))
                continue
            if n == "events":
                ts = t.column("ts")
                span = (pa.compute.max(ts).cast(pa.int64()).as_py()
                        - pa.compute.min(ts).cast(pa.int64()).as_py())
                offs = {k: pa.scalar(c * strides[n], type=t.column(k).type)
                        for k in keys}
                parts.append(fresh_events(t, c, offs, span))
                continue
            cols = []
            for name in t.column_names:
                col = t.column(name)
                if name in keys:
                    ref = FK_SOURCE.get(name, n)
                    off = pa.scalar(c * strides[ref], type=col.type)
                    col = pa.compute.add(col, off)
                cols.append(col)
            parts.append(pa.table(cols, names=t.column_names))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{out_dir}/{n}.parquet",
                       row_group_size=rg(out.num_rows))
        print(f"{n}: {t.num_rows} -> {out.num_rows} rows "
              f"(stride {strides[n]})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1",
         int(sys.argv[2]) if len(sys.argv) > 2 else COPIES)

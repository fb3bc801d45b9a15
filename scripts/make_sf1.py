#!/usr/bin/env python3
"""Synthesize an sf1 fixture (10x sf0.1) for the local scale check.

The driver's generators (TESTDATA.md, seed=42) are not shipped, so sf1
is built by CONSISTENT REPLICATION: 10 disjoint key-offset copies of
every sf0.1 fact/entity table, sharing the region/nation dimension
enums. Each copy's keys are offset by a per-table stride so copies form
disjoint FK-consistent universes; strides are rounded up to a multiple
of 400 (and hence even) so modulo-derived semantics survive replication
unchanged — the PostsProxy title universe (doc_id % 400), q08's
event_id parity, etc. Value distributions are exactly sf0.1's.

Consequence to keep in mind when reading sf1 numbers: replication makes
every document text an exact 10-way duplicate, so pair-expanded outputs
(q51/q53/q70 doc pairs, q54 near-dup pairs) grow ~quadratically in the
copy count by CONSTRUCTION — that is the fixture, not the engine.

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


def stride_of(table: pa.Table, key: str) -> int:
    mx = pa.compute.max(table.column(key)).as_py()
    return ((mx + 400) // 400) * 400


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tables = {n: pq.read_table(f"{SRC}/{n}.parquet")
              for n in list(KEYED) + SHARED_DIMS}
    strides = {n: stride_of(tables[n], KEYED[n][0]) for n in KEYED}

    for n in SHARED_DIMS:
        pq.write_table(tables[n], f"{out_dir}/{n}.parquet")

    for n, keys in KEYED.items():
        t = tables[n]
        parts = [t]
        for c in range(1, COPIES):
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
        pq.write_table(out, f"{out_dir}/{n}.parquet")
        print(f"{n}: {t.num_rows} -> {out.num_rows} rows "
              f"(stride {strides[n]})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1")

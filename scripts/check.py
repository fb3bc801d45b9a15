#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same fixture tables, compare value-by-value
with columns sorted by name (the driver's hashing convention).

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame, side: str, name: str) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # The driver hashes canonical string forms: a decimal/hugeint or
        # array-typed output column hashes differently from (or crashes
        # against) its float/bigint/string twin even when values are
        # equal — refuse them here so the local gate is as strict as the
        # driver, not laxer (round-1 lesson).
        import decimal
        bad = df[c].map(lambda v: isinstance(v, decimal.Decimal)).any()
        if bad:
            raise AssertionError(
                f"{name}/{side}.{c}: decimal-typed output column — cast to "
                f"DOUBLE/BIGINT in the dumped projection (driver hash differs)")
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     type(v).__name__ == 'ndarray').any():
            raise AssertionError(
                f"{name}/{side}.{c}: array-typed output column — serialize "
                f"with array_join/array_to_string (driver cannot sort it)")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df(), "spark", name)
            want = canon(con.sql(oracle[name]).df(), "oracle", name)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
